"""C libdeflate control arm for the benchmark harness (ctypes).

The reference benchmarks itself head-to-head against `libdeflater` — the
Rust binding of C libdeflate (reference Cargo.toml:55, reference
benches/bench_main.rs:977-1122). This module gives our harness the same
control arm by binding the system `libdeflate.so` directly; BASELINE.md's
bar ("parity-or-better vs C libdeflate") is measured against exactly this.

Control-arm only: nothing in the library package imports this.
"""

from __future__ import annotations

import ctypes

__all__ = ["available", "compress", "decompress", "crc32", "adler32",
           "compress_bound"]

try:
    _lib = ctypes.CDLL("libdeflate.so.0")
except OSError:  # pragma: no cover - dev hosts without libdeflate
    _lib = None


def available() -> bool:
    return _lib is not None


if _lib is not None:
    _lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
    _lib.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
    _lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
    _lib.libdeflate_alloc_decompressor.argtypes = []
    for name in ("deflate", "zlib", "gzip"):
        fn = getattr(_lib, f"libdeflate_{name}_compress")
        fn.restype = ctypes.c_size_t
        fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                       ctypes.c_void_p, ctypes.c_size_t]
        bound = getattr(_lib, f"libdeflate_{name}_compress_bound")
        bound.restype = ctypes.c_size_t
        bound.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        dec = getattr(_lib, f"libdeflate_{name}_decompress")
        dec.restype = ctypes.c_int
        dec.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                        ctypes.c_void_p, ctypes.c_size_t,
                        ctypes.POINTER(ctypes.c_size_t)]
    _lib.libdeflate_crc32.restype = ctypes.c_uint32
    _lib.libdeflate_crc32.argtypes = [ctypes.c_uint32, ctypes.c_char_p,
                                      ctypes.c_size_t]
    _lib.libdeflate_adler32.restype = ctypes.c_uint32
    _lib.libdeflate_adler32.argtypes = [ctypes.c_uint32, ctypes.c_char_p,
                                        ctypes.c_size_t]

_COMPRESSORS: dict[int, int] = {}
_DECOMPRESSOR = None


def _compressor(level: int) -> int:
    c = _COMPRESSORS.get(level)
    if c is None:
        c = _lib.libdeflate_alloc_compressor(level)
        if not c:
            raise MemoryError("libdeflate_alloc_compressor failed")
        _COMPRESSORS[level] = c
    return c


def compress_bound(n: int, level: int = 6, format: str = "deflate") -> int:
    fn = getattr(_lib, f"libdeflate_{format}_compress_bound")
    return fn(_compressor(level), n)


def compress(data: bytes, level: int = 6, format: str = "deflate") -> bytes:
    """One-shot libdeflate compression (level 1..12)."""
    c = _compressor(level)
    bound = compress_bound(len(data), level, format)
    out = ctypes.create_string_buffer(bound)
    fn = getattr(_lib, f"libdeflate_{format}_compress")
    n = fn(c, data, len(data), out, bound)
    if n == 0:
        raise RuntimeError("libdeflate compression failed")
    return out.raw[:n]


def decompress(data: bytes, out_size: int, format: str = "deflate") -> bytes:
    """One-shot libdeflate decompression into an out_size buffer."""
    global _DECOMPRESSOR
    if _DECOMPRESSOR is None:
        _DECOMPRESSOR = _lib.libdeflate_alloc_decompressor()
    out = ctypes.create_string_buffer(out_size)
    actual = ctypes.c_size_t(0)
    fn = getattr(_lib, f"libdeflate_{format}_decompress")
    res = fn(_DECOMPRESSOR, data, len(data), out, out_size,
             ctypes.byref(actual))
    if res != 0:
        raise RuntimeError(f"libdeflate decompression failed: {res}")
    return out.raw[:actual.value]


def crc32(data: bytes, crc: int = 0) -> int:
    return _lib.libdeflate_crc32(crc, data, len(data))


def adler32(data: bytes, adler: int = 1) -> int:
    return _lib.libdeflate_adler32(adler, data, len(data))
