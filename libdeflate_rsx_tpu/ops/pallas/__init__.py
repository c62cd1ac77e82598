"""Pallas TPU kernels.

Currently: inflate_static — bit-serial batch decode of stored/static
DEFLATE streams (one stream per grid cell, SMEM scalar decode). See the
module docstring for scope and status.
"""

from .inflate_static import inflate_device_static

__all__ = ["inflate_device_static"]
