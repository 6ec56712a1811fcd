"""Segment concatenation with pauses and linear crossfade.

Behavioral port of the reference's WAV stitching
(tts-service/app/services/tts_service.py:413-503): inter-segment silence
(soft 120 ms after weak/no punctuation, hard 200 ms after sentence-final
punctuation, :664-671) and a 60 ms linear crossfade at each boundary —
vectorized over numpy float32 instead of 16-bit byte loops.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def crossfade_concat(a: np.ndarray, b: np.ndarray, fade_samples: int) -> np.ndarray:
    """Concatenate with a linear crossfade over the boundary
    (reference `_crossfade_frames`, tts_service.py:418-465)."""
    if fade_samples <= 0 or len(a) < fade_samples or len(b) < fade_samples:
        return np.concatenate([a, b])
    n = fade_samples
    wa = np.linspace(1.0, 0.0, n, endpoint=True, dtype=np.float32) if n > 1 \
        else np.zeros(1, np.float32)
    wb = 1.0 - wa
    mixed = a[-n:] * wa + b[:n] * wb
    return np.concatenate([a[:-n], mixed, b[n:]])


def concat_segments(wavs: Sequence[np.ndarray], pauses_ms: Sequence[int],
                    sample_rate: int = 16000,
                    crossfade_ms: int = 60) -> np.ndarray:
    """Reference `_concat_wavs_smooth` (tts_service.py:467-503): insert the
    pause silence, then crossfade the running output with the next segment."""
    wavs = [np.asarray(w, np.float32) for w in wavs if len(w) > 0]
    if not wavs:
        return np.zeros(0, np.float32)
    fade = int(sample_rate * crossfade_ms / 1000)
    out = wavs[0]
    for i, w in enumerate(wavs[1:]):
        pause = pauses_ms[i] if i < len(pauses_ms) else 0
        if pause > 0:
            out = np.concatenate(
                [out, np.zeros(int(sample_rate * pause / 1000), np.float32)])
        out = crossfade_concat(out, w, fade)
    return out
