"""Profiling hooks (SURVEY.md §5: the reference profiles externally via
criterion; the TPU build's analog is jax.profiler traces around device
sections plus lightweight wall-clock spans for host sections)."""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(name: str):
    """Wall-clock span; also emits a jax.profiler TraceAnnotation so the
    span shows up in TensorBoard/XProf device traces."""
    try:
        import jax.profiler
        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # profiling never breaks the codec
        ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    if os.environ.get("LIBDEFLATE_TPU_TRACE"):
        print(f"[trace] {name}: {dt * 1000:.2f} ms")


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a full device trace (jax.profiler.trace) around a region:

        with device_trace("/tmp/prof"):
            deflate_device_static(data)
    """
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
