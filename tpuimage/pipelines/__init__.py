"""Jit-compiled, vmappable pipeline composites (SURVEY.md §1 L2).

Each pipeline is a pure function ``(image, config) -> dict of stage
arrays`` mirroring one reference workload:

- :mod:`morphseq`   — morph_seq.pyc 4-step morphology pipeline
- :mod:`night`      — NightLandscapeEnhancement.py (gray) / asm.py (RGB)
- :mod:`landscape`  — Landscape.py enhance + degrade/eval loop
- :mod:`face`       — FaceEnhancement.py noise-adaptive beauty pipeline
- :mod:`docscan`    — DocScanner.py 8-stage document scan
- :mod:`notebook`   — DIPAssignmentCoding.ipynb modules 1-7 + shadow pipeline
"""
