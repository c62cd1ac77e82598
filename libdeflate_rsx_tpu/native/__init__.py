"""Native host-runtime kernels (C, built on first use, ctypes-bound).

The reference's host path is entirely native (Rust); this package holds
the TPU build's native host components — currently the ragged row
assembler that merges device-produced bit-aligned row buffers into final
DEFLATE streams at memcpy speed. Falls back to pure numpy when no C
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_native.so")
_SRCS = [os.path.join(_HERE, "assemble.c"),
         os.path.join(_HERE, "codec.c")]

_lib = None
_tried = False

_EXT_SO = os.path.join(_HERE, "_codec.so")
_EXT_SRCS = [os.path.join(_HERE, "pymod.c"),
             os.path.join(_HERE, "codec.c")]
_ext = None
_ext_tried = False


def _build_ext() -> str | None:
    cc = os.environ.get("CC", "cc")
    inc = sysconfig.get_paths()["include"]
    try:
        newest_src = max(os.path.getmtime(s) for s in _EXT_SRCS)
        if (not os.path.exists(_EXT_SO)
                or os.path.getmtime(_EXT_SO) < newest_src):
            base = [cc, "-O3", "-shared", "-fPIC", f"-I{inc}",
                    "-o", _EXT_SO, *_EXT_SRCS]
            try:
                subprocess.run(base[:2] + ["-march=native"] + base[2:],
                               check=True, capture_output=True)
            except subprocess.CalledProcessError:
                subprocess.run(base, check=True, capture_output=True)
        return _EXT_SO
    except (OSError, subprocess.CalledProcessError):
        return None


def get_ext():
    """The CPython extension module (fast call path), or None."""
    global _ext, _ext_tried
    if _ext_tried:
        return _ext
    _ext_tried = True
    so = _build_ext()
    if so is None:
        return None
    try:
        import importlib.machinery
        import importlib.util
        loader = importlib.machinery.ExtensionFileLoader("_codec", so)
        spec = importlib.util.spec_from_loader("_codec", loader)
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        _ext = mod
    except (ImportError, OSError):
        _ext = None
    return _ext


def _build() -> str | None:
    cc = os.environ.get("CC", "cc")
    try:
        newest_src = max(os.path.getmtime(s) for s in _SRCS)
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < newest_src):
            # -march=native mirrors the reference's -C target-cpu=native
            # (reference .cargo/config.toml:1-2); the .so is built on the
            # machine it runs on. Fall back for compilers without it.
            try:
                subprocess.run(
                    [cc, "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, *_SRCS],
                    check=True, capture_output=True)
            except subprocess.CalledProcessError:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", _SO, *_SRCS],
                    check=True, capture_output=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def get_lib():
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        # eager init while single-threaded (GIL held here; the hot
        # entry points are later called GIL-released from pool threads)
        lib.ldrsx_global_init.restype = None
        lib.ldrsx_global_init()
        lib.assemble_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.assemble_rows.restype = None
        lib.deflate_c.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.deflate_c.restype = ctypes.c_int64
        lib.inflate_c.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.inflate_c.restype = ctypes.c_int64
        lib.crc32_c.argtypes = [
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_int64]
        lib.crc32_c.restype = ctypes.c_uint32
        lib.adler32_c.argtypes = [
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_int64]
        lib.adler32_c.restype = ctypes.c_uint32
        lib.dyn_tables_c.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.dyn_tables_c.restype = ctypes.c_int64
        lib.icx_size.argtypes = []
        lib.icx_size.restype = ctypes.c_int64
        lib.icx_init.argtypes = [ctypes.c_void_p]
        lib.icx_init.restype = None
        lib.icx_step.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.icx_step.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


_HDR_CAP = 512


def dyn_tables_native(ll_hist, of_hist, final: bool):
    """Histograms -> (ll_tab (288,) u32 `code|len<<16`, of_tab (30,) u32,
    header bytes, header bits) via the C builder, or None when no native
    library is available. Raises on Huffman build failure (histograms
    from the device pipeline are always buildable)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    llf = np.ascontiguousarray(ll_hist, dtype=np.uint32)
    off = np.ascontiguousarray(of_hist[:30], dtype=np.uint32)
    ll_tab = np.zeros(288, np.uint32)
    of_tab = np.zeros(30, np.uint32)
    hdr = np.zeros(_HDR_CAP, np.uint8)
    bits = lib.dyn_tables_c(
        llf.ctypes.data, off.ctypes.data, 1 if final else 0,
        ll_tab.ctypes.data, of_tab.ctypes.data, hdr.ctypes.data, _HDR_CAP)
    if bits < 0:
        raise RuntimeError(f"dyn_tables_c failed: {bits}")
    return ll_tab, of_tab, hdr[: (bits + 7) // 8].tobytes(), int(bits)


def assemble_rows_native(out, rows, byte_off, extent) -> bool:
    """OR-place row buffers into per-block output arrays.

    out: (B, out_cap) uint8 C-contiguous (modified in place);
    rows: (B, R, W) uint8; byte_off/extent: (B, R) int64.
    Returns False if the native library is unavailable.
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return False
    if not (out.flags["C_CONTIGUOUS"] and out.dtype == np.uint8):
        return False  # a copy would break the in-place contract
    rows_c = np.ascontiguousarray(rows, dtype=np.uint8)
    off_c = np.ascontiguousarray(byte_off, dtype=np.int64)
    ext_c = np.ascontiguousarray(extent, dtype=np.int64)
    b, r, w = rows_c.shape
    lib.assemble_rows(
        out.ctypes.data, rows_c.ctypes.data, off_c.ctypes.data,
        ext_c.ctypes.data, b, r, w, out.shape[1])
    return True
