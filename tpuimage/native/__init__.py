"""Native (C++) host-side components, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -shared), cached next to the
source; every consumer keeps a pure-Python fallback so the framework works
without a toolchain.
"""
from tpuimage.native.build import load_native  # noqa: F401
