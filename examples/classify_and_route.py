"""Scene classification + automatic pipeline routing over a directory
(the reference's AI_classification flow, headless): weighted heuristics
(faces via the native Haar cascade, darkness/noise/edge cues on device)
pick a label, the router runs the matching enhancement pipeline.

    python examples/classify_and_route.py /root/reference/public/*.jpg
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout use
import sys

from tpuimage.classify.heuristic import classify_weighted_batch
from tpuimage.classify.router import enhance_for_label
from tpuimage.io.imageio import load_image_rgb

paths = sys.argv[1:]
images = [load_image_rgb(p) for p in paths]
for path, img, (label, probs) in zip(paths, images,
                                     classify_weighted_batch(images)):
    out = enhance_for_label(label, img)
    print(f"{path}: {label} ({max(probs, key=probs.get)}) "
          f"-> enhanced {out.shape}")
