"""Host thread-pool — the analog of the reference's rayon layer.

The reference parallelizes three host paths with rayon: intra-buffer
>256 KiB chunking (reference src/compress/mod.rs:699-772), batch items
(reference src/batch.rs:34-57), and stream flushes (reference
src/stream.rs:100-146). The native codec releases the GIL (ctypes
always; the C extension explicitly on large calls), so a plain
ThreadPoolExecutor gives near-linear host scaling.

One deliberate improvement over the reference: its parallel chunks
reset LZ history at each 256 KiB boundary (ratio loss). Here each
chunk's history is the previous chunk's last 32 KiB of *plaintext*,
which is known before any compression starts — so chunks stay fully
parallel AND matches cross chunk boundaries.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor

_pool: ThreadPoolExecutor | None = None
_pool_width = 0


def pool_width() -> int:
    """Worker count: LIBDEFLATE_RSX_THREADS env var or os.cpu_count()."""
    env = os.environ.get("LIBDEFLATE_RSX_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 1


def get_pool() -> ThreadPoolExecutor | None:
    """The shared executor, or None when one worker wouldn't help."""
    global _pool, _pool_width
    width = pool_width()
    if width <= 1:
        return None
    if _pool is None or _pool_width != width:
        if _pool is not None:
            _pool.shutdown(wait=False)
        _pool = ThreadPoolExecutor(max_workers=width,
                                   thread_name_prefix="ldrsx")
        _pool_width = width
    return _pool


def pmap(fn, items: list) -> list:
    """Ordered map over the pool; serial when the pool is width 1 or the
    work list is trivial. Exceptions propagate (callers that need
    per-item fault isolation wrap `fn`).

    Re-entrant calls (a pool worker submitting to the same pool — e.g.
    BatchCompressor items >256 KiB re-entering the chunked one-shot
    path) run serially: blocking a worker on inner jobs that need a
    worker slot can deadlock the whole pool when every slot is blocked.
    """
    items = list(items)
    if len(items) <= 1:
        return [fn(x) for x in items]
    if threading.current_thread().name.startswith("ldrsx"):
        return [fn(x) for x in items]
    pool = get_pool()
    if pool is None:
        return [fn(x) for x in items]
    return list(pool.map(fn, items))
