"""Golden tests: JAX frontend vs an independent naive-numpy Kaldi fbank."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.ops.frontend import (  # noqa: E402
    EPSILON,
    FrontendConfig,
    apply_cmvn,
    apply_lfr,
    compute_frontend,
    fbank,
    num_fbank_frames,
    num_lfr_frames,
    _mel_banks_np,
    _window_coeffs,
)


def naive_kaldi_fbank(x: np.ndarray, cfg: FrontendConfig) -> np.ndarray:
    """Straight-line per-frame reimplementation of kaldi fbank semantics."""
    if cfg.int16_scale:
        x = x * 32768.0
    L, S = cfg.frame_length, cfg.frame_shift
    T = num_fbank_frames(len(x), cfg)
    win = _window_coeffs(cfg).astype(np.float64)
    banks = _mel_banks_np(cfg).astype(np.float64)
    out = np.zeros((T, cfg.n_mels))
    for t in range(T):
        fr = x[t * S: t * S + L].astype(np.float64).copy()
        if cfg.remove_dc_offset:
            fr -= fr.mean()
        if cfg.preemphasis:
            fr = fr - cfg.preemphasis * np.concatenate([[fr[0]], fr[:-1]])
        fr *= win
        spec = np.fft.rfft(fr, n=cfg.n_fft)[: cfg.n_fft // 2]
        power = np.abs(spec) ** 2
        out[t] = np.log(np.maximum(power @ banks, EPSILON))
    return out.astype(np.float32)


def naive_lfr(feats: np.ndarray, m: int, n: int) -> np.ndarray:
    """FunASR apply_lfr reimplemented per its documented semantics."""
    T, D = feats.shape
    T_lfr = num_lfr_frames(T, n)
    left = (m - 1) // 2
    padded = np.concatenate([np.repeat(feats[:1], left, axis=0), feats], axis=0)
    out = np.zeros((T_lfr, m * D), dtype=feats.dtype)
    for i in range(T_lfr):
        idx = [min(i * n + j, len(padded) - 1) for j in range(m)]
        out[i] = padded[idx].reshape(-1)
    return out


@pytest.fixture(scope="module")
def wav(rng=np.random.default_rng(42)):
    t = np.arange(16000) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(16000)
    return x.astype(np.float32)


def test_fbank_matches_naive(wav):
    cfg = FrontendConfig()
    got = np.asarray(fbank(wav[None, :], cfg))[0]
    want = naive_kaldi_fbank(wav, cfg)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fbank_batch_consistency(wav):
    cfg = FrontendConfig()
    single = np.asarray(fbank(wav[None, :], cfg))
    batch = np.asarray(fbank(np.stack([wav, wav * 0.5]), cfg))
    np.testing.assert_allclose(batch[0], single[0], rtol=1e-4, atol=1e-4)


def test_lfr_matches_naive(wav):
    cfg = FrontendConfig()
    f = np.asarray(fbank(wav[None, :], cfg))[0]
    got = np.asarray(apply_lfr(f[None], 7, 6))[0]
    want = naive_lfr(f, 7, 6)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lfr_vad_config(wav):
    cfg = FrontendConfig(lfr_m=5, lfr_n=1)
    f = np.asarray(fbank(wav[None, :], cfg))[0]
    got = np.asarray(apply_lfr(f[None], 5, 1))[0]
    want = naive_lfr(f, 5, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cmvn():
    f = jnp.ones((1, 4, 6))
    means = -jnp.ones((6,)) * 2.0
    istd = jnp.ones((6,)) * 0.5
    out = apply_cmvn(f, means, istd)
    np.testing.assert_allclose(np.asarray(out), -0.5)


def test_compute_frontend_jit(wav):
    cfg = FrontendConfig()
    fn = jax.jit(lambda x: compute_frontend(x, cfg))
    out = fn(jnp.asarray(wav[None, :]))
    assert out.shape == (1, num_lfr_frames(98, 6), 560)
    assert np.isfinite(np.asarray(out)).all()


def test_frame_count_formulas():
    cfg = FrontendConfig()
    assert num_fbank_frames(400, cfg) == 1
    assert num_fbank_frames(399, cfg) == 0
    assert num_fbank_frames(16000, cfg) == 98
    assert num_lfr_frames(98, 6) == 17
