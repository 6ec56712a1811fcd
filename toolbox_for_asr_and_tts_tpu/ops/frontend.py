"""Kaldi-compatible DSP frontend as XLA-friendly JAX: framing, window,
power spectrum, log-mel filterbank, LFR stacking, CMVN.

This replaces the reference's CPU frontend (FunASR `WavFrontend`, i.e.
torchaudio kaldi fbank, consumed by every voice model — reference
voice-service/app/services/voice_interface.py L0 layer) with a formulation
that maps onto the TPU:

- framing is a strided gather → (T, 400) matrix, computed once per utterance;
- the real DFT runs as `jnp.fft.rfft` (XLA TPU FFT);
- the mel filterbank is a dense (n_freqs, n_mels) matmul → MXU;
- everything is batch-first `[B, T_samples]` with a valid-length mask, so one
  compiled program serves a whole bucket of concurrent streams.

Kaldi semantics implemented (matching torchaudio.compliance.kaldi.fbank with
FunASR's settings: 16 kHz, 25 ms frames, 10 ms shift, hamming window, 80 mel
bins, snip_edges=True, remove_dc_offset=True, preemphasis 0.97, low_freq=20,
use_power=True, int16 input scaling, dither disabled for determinism).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# Pallas fused frame/window stage for fbank on TPU (ops/pallas/frame_window):
# compiled-on-chip since round 2. None = decide from the dispatch profile
# (tunnel: XLA's fused gather wins because fbank is call-bound there;
# direct-attached: the Pallas kernel wins — benchmarks/RESULTS.md). Set
# True/False (or USE_PALLAS_FRAMING env) to pin.
USE_PALLAS_FRAMING: Optional[bool] = None


def _use_pallas_framing() -> bool:
    if USE_PALLAS_FRAMING is not None:
        return USE_PALLAS_FRAMING
    from ..runtime.autotune import env_or_profile
    return env_or_profile("USE_PALLAS_FRAMING", "pallas_framing")


from .nn import _on_tpu  # single backend probe shared with the FSMN dispatch

EPSILON = 1.1920928955078125e-07  # torch.finfo(float32).eps — kaldi energy floor


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    n_mels: int = 80
    window: str = "hamming"          # FunASR WavFrontend default
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0           # <=0 → offset from nyquist
    snip_edges: bool = True
    use_power: bool = True
    int16_scale: bool = True         # FunASR multiplies waveform by 1<<15
    lfr_m: int = 7                   # paraformer: 7/6; fsmn-vad: 5/1
    lfr_n: int = 6

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000)

    @property
    def n_fft(self) -> int:
        return 1 << (self.frame_length - 1).bit_length()  # next pow2 (512)


def num_fbank_frames(n_samples: int, cfg: FrontendConfig) -> int:
    """snip_edges frame count (kaldi)."""
    if n_samples < cfg.frame_length:
        return 0
    return 1 + (n_samples - cfg.frame_length) // cfg.frame_shift


def num_lfr_frames(t: int, lfr_n: int) -> int:
    return int(math.ceil(t / lfr_n))


def _window_coeffs(cfg: FrontendConfig) -> np.ndarray:
    n = cfg.frame_length
    i = np.arange(n, dtype=np.float64)
    if cfg.window == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * i / (n - 1))
    elif cfg.window == "hanning":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))
    elif cfg.window == "povey":  # kaldi default window
        w = (0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))) ** 0.85
    elif cfg.window == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window {cfg.window}")
    return w.astype(np.float32)


def _mel_scale(hz: np.ndarray) -> np.ndarray:
    return 1127.0 * np.log(1.0 + hz / 700.0)


@functools.lru_cache(maxsize=8)
def _mel_banks_np(cfg: FrontendConfig) -> np.ndarray:
    """Kaldi mel filterbank matrix, shape (n_fft//2, n_mels).

    Matches kaldi/torchaudio `get_mel_banks`: triangular filters in mel space
    over the first n_fft//2 FFT bins (nyquist bin excluded).
    """
    n_bins = cfg.n_fft // 2
    nyquist = 0.5 * cfg.sample_rate
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    fft_bin_width = cfg.sample_rate / cfg.n_fft
    mel_low = _mel_scale(np.array(cfg.low_freq))
    mel_high = _mel_scale(np.array(high))
    mel_delta = (mel_high - mel_low) / (cfg.n_mels + 1)
    bin_mels = _mel_scale(fft_bin_width * np.arange(n_bins, dtype=np.float64))
    banks = np.zeros((n_bins, cfg.n_mels), dtype=np.float64)
    for m in range(cfg.n_mels):
        left = mel_low + m * mel_delta
        center = mel_low + (m + 1) * mel_delta
        right = mel_low + (m + 2) * mel_delta
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        banks[:, m] = np.maximum(0.0, np.minimum(up, down))
    return banks.astype(np.float32)


def _frame_indices(t_frames: int, cfg: FrontendConfig) -> jnp.ndarray:
    starts = jnp.arange(t_frames)[:, None] * cfg.frame_shift
    offs = jnp.arange(cfg.frame_length)[None, :]
    return starts + offs  # (T, L)


def fbank(x: jnp.ndarray, cfg: FrontendConfig = FrontendConfig(),
          t_frames: Optional[int] = None) -> jnp.ndarray:
    """Log-mel filterbank features.

    Args:
        x: waveform `[B, n_samples]` float32 in [-1, 1].
        t_frames: static frame count (defaults to the max frames for
            n_samples). Frames past a stream's valid length are garbage and
            must be masked by the caller using `num_fbank_frames(valid_len)`.

    Returns:
        `[B, t_frames, n_mels]` float32.
    """
    assert x.ndim == 2, "fbank expects [B, T] — batch-first everywhere"
    if cfg.int16_scale:
        x = x * 32768.0
    t_max = num_fbank_frames(x.shape[1], cfg)
    t = t_frames if t_frames is not None else t_max
    if _use_pallas_framing() and _on_tpu():
        from .pallas.frame_window import frame_window
        frames = frame_window(x, jnp.asarray(_window_coeffs(cfg), jnp.float32),
                              t, cfg.frame_length, cfg.frame_shift, cfg.n_fft,
                              preemphasis=cfg.preemphasis,
                              remove_dc=cfg.remove_dc_offset)
    else:
        idx = _frame_indices(t, cfg)
        # strided gather: (B, T, L)
        frames = x[:, idx]
        if cfg.remove_dc_offset:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if cfg.preemphasis != 0.0:
            # kaldi: offset frame where first sample is duplicated
            prev = jnp.concatenate([frames[..., :1], frames[..., :-1]],
                                   axis=-1)
            frames = frames - cfg.preemphasis * prev
        win = jnp.asarray(_window_coeffs(cfg))
        frames = frames * win
        # zero-pad to n_fft and real FFT
        pad = cfg.n_fft - cfg.frame_length
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    spec = jnp.fft.rfft(frames, axis=-1)[..., : cfg.n_fft // 2]
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if not cfg.use_power:
        power = jnp.sqrt(power)
    mel = jnp.einsum(
        "btf,fm->btm", power, jnp.asarray(_mel_banks_np(cfg)),
        preferred_element_type=jnp.float32,
    )
    return jnp.log(jnp.maximum(mel, EPSILON))


def apply_lfr(feats: jnp.ndarray, lfr_m: int, lfr_n: int,
              t_out: Optional[int] = None,
              valid_frames=None) -> jnp.ndarray:
    """Low frame rate stacking (FunASR `apply_lfr` semantics).

    Left-pads (m-1)//2 copies of the first frame, stacks m consecutive frames
    every n frames, repeating the last frame past the end.

    feats: [B, T, D] → [B, ceil(T/n), m*D]

    valid_frames: optional [B] per-row valid fbank frame counts. In the
    bucketed serving path the padded audio produces EXTRA fbank frames past
    the real signal (windows over zero padding); FunASR's replicate-last
    semantics require the last VALID frame to repeat instead, or the final
    LFR frame's lookahead taps differ from the exact-length computation —
    a one-token transcript seam caught by
    tests/test_service_transcript_rehearsal.py.
    """
    b, t, d = feats.shape
    t_lfr = t_out if t_out is not None else num_lfr_frames(t, lfr_n)
    left = (lfr_m - 1) // 2
    # index i of output, j of stack → input index i*n + j - left, clamped
    i = jnp.arange(t_lfr)[:, None] * lfr_n
    j = jnp.arange(lfr_m)[None, :]
    src = jnp.clip(i + j - left, 0, t - 1)  # (T_lfr, m)
    if valid_frames is not None:
        hi = jnp.maximum(valid_frames, 1) - 1        # [B]
        src = jnp.minimum(src[None], hi[:, None, None])  # (B, T_lfr, m)
        out = jnp.take_along_axis(feats, src.reshape(b, -1)[..., None],
                                  axis=1).reshape(b, t_lfr, lfr_m, d)
        return out.reshape(b, t_lfr, lfr_m * d)
    out = feats[:, src]  # (B, T_lfr, m, D)
    return out.reshape(b, t_lfr, lfr_m * d)


def apply_cmvn(feats: jnp.ndarray, means: jnp.ndarray, istd: jnp.ndarray) -> jnp.ndarray:
    """Kaldi-style global CMVN: (x + means) * istd.

    `means` is the negative mean (kaldi AddShift) and `istd` the inverse
    stddev (kaldi Rescale), as stored in FunASR `am.mvn` files.
    """
    return (feats + means) * istd


def compute_frontend(x: jnp.ndarray, cfg: FrontendConfig,
                     cmvn: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                     ) -> jnp.ndarray:
    """wav [B, T] → LFR+CMVN features [B, T_lfr, lfr_m*n_mels]."""
    f = fbank(x, cfg)
    f = apply_lfr(f, cfg.lfr_m, cfg.lfr_n)
    if cmvn is not None:
        f = apply_cmvn(f, cmvn[0], cmvn[1])
    return f


def frontend_valid_frames(n_samples, cfg: FrontendConfig):
    """Valid LFR frame count for a (possibly traced) valid sample length."""
    t = jnp.maximum(0, 1 + (n_samples - cfg.frame_length) // cfg.frame_shift)
    return (t + cfg.lfr_n - 1) // cfg.lfr_n
