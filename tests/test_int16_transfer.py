"""int16 audio transfer (VERDICT-r3 #9): halves the one-shot upload on a
tunnel link; must be EXACTLY lossless for PCM-sourced (int16-grid) audio
and numerically immaterial for arbitrary float audio."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer


@pytest.fixture(scope="module")
def reco():
    return Recognizer.random(use_mesh=False)


def _pcm_wav(secs=2.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    x = 0.3 * np.sin(2 * np.pi * 300 * t) + 0.02 * rng.standard_normal(len(t))
    # quantize onto the int16 grid — what WAV/base64 service inputs are
    return (np.clip(np.round(x * 32768), -32768, 32767) / 32768.0
            ).astype(np.float32)


def test_int16_transfer_lossless_for_pcm_audio(reco):
    wav = _pcm_wav()
    reco._int16_transfer = False
    a = reco.transcribe([wav])[0]
    reco._int16_transfer = True
    b = reco.transcribe([wav])[0]
    reco._int16_transfer = False
    assert a.tokens == b.tokens
    assert a.timestamps_ms == b.timestamps_ms
    assert a.timestamp == b.timestamp


def test_int16_transfer_roundtrip_exact():
    """The host-side conversion inverts exactly on the int16 grid."""
    wav = _pcm_wav(secs=0.3, seed=3)
    q = np.clip(np.round(wav * 32768.0), -32768.0, 32767.0).astype(np.int16)
    back = q.astype(np.float32) / 32768.0
    assert np.array_equal(back, wav)


def test_profile_knob_defaults():
    from toolbox_for_asr_and_tts_tpu.runtime.autotune import profile_knobs
    assert profile_knobs("tunnel", "tpu")["asr_int16_transfer"] is True
    assert profile_knobs("local", "tpu")["asr_int16_transfer"] is False
    assert profile_knobs("local", "cpu")["asr_int16_transfer"] is False
    assert profile_knobs("tunnel", "cpu")["asr_int16_transfer"] is False
