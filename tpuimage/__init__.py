"""tpuimage — TPU-native batched image-processing framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of the reference
OpenCV script suite (Brianlov/Smart-Image-Processing): document scanning,
face/night/landscape enhancement, morphology pipelines, and scene
classification — implemented as jit-compiled, vmappable op chains with
Pallas TPU kernels for the stencil-heavy ops and jax.sharding meshes for
scale-out.

Layering (see SURVEY.md §1):
  core/       dtype policy: uint8 storage, f32/i32 compute, OpenCV-exact
              saturating casts and rounding
  ops/        the kernel/op layer (reference L0/L1): filters, morphology,
              histograms, thresholds, colorspace, geometry, edges, hough,
              metrics (each op cites the cv2 call sites it replaces)
  detect/     quad localization, Haar cascades, scene heuristics (ref L3)
  pipelines/  docscan / face / night / landscape / morphseq / shadow (ref L2)
  classify/   heuristic + CLIP ViT-B/32 zero-shot routing (ref L3)
  presets/    typed preset configs + JSON preset-DB loaders
  runtime/    device mesh, sharding, halo exchange, batch runner, profiling
  cli/        per-workload entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
