"""Profiling: jax.profiler traces as first-class, replacing the reference's
print-stopwatch convention (`耗时统计 -`, survey §5 tracing).

    with trace_to("/tmp/tb"):         # XLA + host trace, view in TensorBoard
        reco.transcribe(wavs)

    with annotate("finalize"):        # named region inside a trace
        ...
"""
from __future__ import annotations

import contextlib
import logging
import os

logger = logging.getLogger("toolbox.profiling")


@contextlib.contextmanager
def trace_to(logdir: str, create_perfetto_link: bool = False):
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info("profile written to %s (tensorboard --logdir %s)",
                    logdir, logdir)


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory gauges (reference logged torch.cuda memory,
    tts_service.py:552-556)."""
    import jax
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out
