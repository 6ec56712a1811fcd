"""Pallas kernels vs their jnp formulations (interpret mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.ops import frontend as fe  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops import nn  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops.pallas.frame_window import frame_window  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops.pallas.fsmn_conv import fsmn_depthwise  # noqa: E402


def test_frame_window_matches_jnp():
    cfg = fe.FrontendConfig()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    t = fe.num_fbank_frames(16000, cfg)
    win = jnp.asarray(fe._window_coeffs(cfg))
    got = np.asarray(frame_window(
        jnp.asarray(wav), win, t, cfg.frame_length, cfg.frame_shift,
        cfg.n_fft, cfg.preemphasis, cfg.remove_dc_offset, interpret=True))
    # jnp reference: the same ops as ops.frontend.fbank before the FFT
    idx = fe._frame_indices(t, cfg)
    frames = jnp.asarray(wav)[:, idx]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - cfg.preemphasis * prev
    frames = frames * win
    want = np.zeros_like(got)
    want[..., : cfg.frame_length] = np.asarray(frames)
    assert got.shape == (2, t, cfg.n_fft)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t,d,k,pad_l", [(100, 64, 11, 5), (50, 128, 20, 19),
                                         (200, 96, 11, 8)])
def test_fsmn_depthwise_matches_nn(t, d, k, pad_l):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, t, d)).astype(np.float32)
    w = (rng.standard_normal((d, 1, k)) * 0.1).astype(np.float32)
    pad_r = k - 1 - pad_l
    got = np.asarray(fsmn_depthwise(jnp.asarray(x), jnp.asarray(w),
                                    pad_l, pad_r, interpret=True))
    want = np.asarray(nn.fsmn_block({"w": jnp.asarray(w)}, jnp.asarray(x),
                                    (pad_l, pad_r)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
