"""Energy-based VAD statistics.

The reference's *final* per-chunk speech decision is energy-only
(voice-service/app/services/voice_interface.py:1569-1606): a chunk is speech
iff mean(|x|) > 0.03 AND max(|x|) > 0.17. The FSMN-VAD model output is logged
but not decisive for chunk gating (it drives endpointing elsewhere). These
helpers keep those exact semantics, with both a numpy host path (latency: a
400 ms chunk is 6400 samples — not worth a device round-trip) and a jnp path
for fused batch pipelines.
"""
from __future__ import annotations

from typing import Tuple, Union

import numpy as np

try:  # jnp path optional so host-only callers stay torch/jax-free
    import jax.numpy as jnp
    _HAS_JAX = True
except Exception:  # pragma: no cover
    _HAS_JAX = False

MEAN_THRESHOLD = 0.03  # voice_interface.py:655
PEAK_THRESHOLD = 0.17  # voice_interface.py:657


def _is_host(x) -> bool:
    """True when x should take the numpy path: plain arrays/sequences, or
    anything when jax is absent (the guarded import's whole point — the jnp
    branch used to NameError in a jax-free host process, round-2 finding)."""
    return isinstance(x, np.ndarray) or not _HAS_JAX \
        or not isinstance(x, jnp.ndarray)


def energy_stats(x) -> Tuple[float, float]:
    """(mean_abs, peak_abs) of a chunk; (0, 0) for an empty chunk (a
    zero-byte WS frame must not emit NaN telemetry)."""
    if _is_host(x):
        a = np.abs(np.asarray(x))
        if a.size == 0:
            return 0.0, 0.0
        return float(a.mean()), float(a.max(initial=0.0))
    a = jnp.abs(x)
    return jnp.mean(a), jnp.max(a)


def is_speech_energy(x, mean_threshold: float = MEAN_THRESHOLD,
                     peak_threshold: float = PEAK_THRESHOLD) -> Union[bool, "jnp.ndarray"]:
    """AND-logic energy gate (voice_interface.py:1573-1578,1606)."""
    mean_abs, peak = energy_stats(x)
    if not _HAS_JAX or not isinstance(mean_abs, jnp.ndarray):
        return bool(mean_abs > mean_threshold and peak > peak_threshold)
    return (mean_abs > mean_threshold) & (peak > peak_threshold)


def rms(x) -> float:
    if _is_host(x):
        a = np.asarray(x)
        if a.size == 0:
            return 0.0
        return float(np.sqrt(np.mean(np.square(a)) + 1e-12))
    return jnp.sqrt(jnp.mean(jnp.square(x)) + 1e-12)


def dump_clipped_audio(x: np.ndarray, sample_rate: int = 16000,
                       dump_dir: str = "/tmp/voice_service_debug_audio",
                       clipping_threshold: float = 0.01) -> "str | None":
    """Write a debug WAV when a buffer shows heavy clipping (reference
    `_dump_clipped_audio`, voice_interface.py:942-980). Returns the path, or
    None when the buffer is clean."""
    import os
    import time as _time
    stats = audio_quality_stats(x)
    if stats["clipping_ratio"] < clipping_threshold:
        return None
    try:
        os.makedirs(dump_dir, exist_ok=True)
        from ..utils.audio import write_wav
        path = os.path.join(
            dump_dir, f"clipped_{int(_time.time() * 1000)}.wav")
        write_wav(path, np.asarray(x, np.float32), sample_rate)
        logger = __import__("logging").getLogger("toolbox.vad")
        logger.warning("clipped audio (%.1f%%) dumped to %s",
                       stats["clipping_ratio"] * 100, path)
        return path
    except OSError:
        return None


def audio_quality_stats(x: np.ndarray) -> dict:
    """RMS / clipping ratio / dynamic range / peak symmetry telemetry
    (port of `_log_audio_statistics`, voice_interface.py:873-939)."""
    a = np.asarray(x, dtype=np.float32)
    if a.size == 0:
        return {"rms": 0.0, "clipping_ratio": 0.0, "dynamic_range_db": 0.0,
                "peak_pos": 0.0, "peak_neg": 0.0}
    clip = float(np.mean(np.abs(a) >= 0.999))
    peak_pos = float(a.max(initial=0.0))
    peak_neg = float(-a.min(initial=0.0))
    r = rms(a)
    dyn = 20.0 * np.log10(max(peak_pos, peak_neg, 1e-9) / max(r, 1e-9))
    return {
        "rms": r,
        "clipping_ratio": clip,
        "dynamic_range_db": float(dyn),
        "peak_pos": peak_pos,
        "peak_neg": peak_neg,
    }
