"""Scan a page too large for one chip: H-shard the post-warp stages over
a device mesh (global statistics — min-max, Otsu, Hough deskew — are
computed with psum/pmin/pmax collectives; output is bit-identical to the
single-device program).

Runs anywhere: on an 8-device TPU slice this spans real chips; for a
local demo force an 8-device CPU mesh first:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_large_page.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout use
import jax

# honor JAX_PLATFORMS even on images whose sitecustomize registers a
# backend at interpreter startup (env alone is too late there)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tpuimage.pipelines import docscan
from tpuimage.runtime import mesh as rt

n = len(jax.devices())
mesh = rt.make_mesh(n, axis_names=("space",))
# scale_long must divide the mesh ('space' axis). The CPU demo keeps the
# program small; on a real slice use the full-resolution
# GUI_DOCUMENT_CONFIG (scale_long=1200) unchanged.
cfg = docscan.DocScanConfig(scale_long=480, illum_method="divide",
                            illum_blur_frac=0.05, block_size=31, C=3,
                            canny_low=30, canny_high=100, morph_ksize=1)
res = docscan.process_document(
    "/root/reference/public/DIP test/document1.jpeg",
    config=cfg, out_dir="/tmp/sharded_scan", space_mesh=mesh)
print("deskew angle:", float(res["stages"]["deskew_angle"]),
      "binary:", res["binary"].shape, f"(post-warp sharded over {n} devices)")
