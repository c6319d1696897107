from tpuimage.classify.heuristic import (  # noqa: F401
    classify_priority, classify_weighted, document_cues, LABELS,
)
from tpuimage.classify.router import (  # noqa: F401
    enhance_for_label, classify_and_enhance,
)
