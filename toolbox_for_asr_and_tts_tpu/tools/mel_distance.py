"""TTS parity metric: log-mel spectral distance between two waveforms.

The acceptance bar for TTS is "perceptually identical audio" (BASELINE.md).
This tool quantifies it: mel-cepstral-style distance over our own fbank
frontend (dB-scale RMSE per frame after DTW-free length alignment), the
standard proxy for spectral closeness between a converted-weights synthesis
and the reference pipeline's output for the same text.

    python -m toolbox_for_asr_and_tts_tpu.tools.mel_distance a.wav b.wav
"""
from __future__ import annotations

import json
import sys

import numpy as np


def log_mel(wav: np.ndarray, sr: int = 16000) -> np.ndarray:
    import jax.numpy as jnp
    from ..ops import frontend as fe
    cfg = fe.FrontendConfig(lfr_m=1, lfr_n=1)
    return np.asarray(fe.fbank(jnp.asarray(wav[None]), cfg))[0]


def mel_distance(a: np.ndarray, b: np.ndarray, sr: int = 16000) -> dict:
    """Returns frame-aligned spectral stats. Lengths may differ slightly
    (trailing frames are trimmed to the shorter)."""
    ma, mb = log_mel(a, sr), log_mel(b, sr)
    n = min(len(ma), len(mb))
    if n == 0:
        return {"frames": 0, "rmse_db": None, "corr": None}
    da, db = ma[:n], mb[:n]
    # natural-log mel → dB
    scale = 10.0 / np.log(10.0)
    rmse = float(np.sqrt(np.mean((da - db) ** 2)) * scale)
    corr = float(np.corrcoef(da.reshape(-1), db.reshape(-1))[0, 1])
    return {"frames": int(n), "len_ratio": float(len(ma) / max(len(mb), 1)),
            "rmse_db": rmse, "corr": corr}


def main() -> None:
    from ..utils.audio import ensure_mono_16k, read_wav
    a, sra = read_wav(sys.argv[1])
    b, srb = read_wav(sys.argv[2])
    out = mel_distance(ensure_mono_16k(a, sra), ensure_mono_16k(b, srb))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
