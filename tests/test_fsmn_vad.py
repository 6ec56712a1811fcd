import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import fsmn_vad  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.vad import (  # noqa: E402
    VadOptions,
    VadStateMachine,
    segments_from_probs,
)

CFG = fsmn_vad.FsmnVadConfig()


@pytest.fixture(scope="module")
def params():
    return fsmn_vad.init_params(jax.random.PRNGKey(0), CFG)


def test_apply_shapes_and_softmax(params):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 400)), jnp.float32)
    out = fsmn_vad.apply(params, x, CFG)
    assert out.shape == (2, 50, 248)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)
    sp = fsmn_vad.speech_prob(out, CFG)
    assert sp.shape == (2, 50)
    assert (np.asarray(sp) >= -1e-5).all() and (np.asarray(sp) <= 1 + 1e-5).all()


def test_causality(params):
    """FSMN with rorder=0 must be causal: past output unaffected by future."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 60, 400)).astype(np.float32)
    y = rng.standard_normal((1, 60, 400)).astype(np.float32)
    y[:, :30] = x[:, :30]
    a = np.asarray(fsmn_vad.apply(params, jnp.asarray(x), CFG))
    b = np.asarray(fsmn_vad.apply(params, jnp.asarray(y), CFG))
    np.testing.assert_allclose(a[:, :30], b[:, :30], rtol=1e-4, atol=1e-5)
    assert not np.allclose(a[:, 30:], b[:, 30:])


def test_streaming_matches_offline(params):
    """Chunked apply_streaming == offline apply on the concatenated stream."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 80, 400)).astype(np.float32)
    offline = np.asarray(fsmn_vad.apply(params, jnp.asarray(x), CFG))
    cache = fsmn_vad.init_cache(1, CFG)
    outs = []
    step = jax.jit(lambda f, c: fsmn_vad.apply_streaming(params, f, c, CFG))
    for i in range(0, 80, 20):
        o, cache = step(jnp.asarray(x[:, i:i + 20]), cache)
        outs.append(np.asarray(o))
    streaming = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streaming, offline, rtol=1e-4, atol=1e-5)


def test_vad_state_machine_segments():
    opts = VadOptions(speech_noise_thres=0.5, sil_to_speech_ms=30,
                      max_end_silence_ms=50, speech_to_sil_ms=50)
    # 100 frames: sil(20) speech(40) sil(40)
    p = np.concatenate([np.zeros(20), np.ones(40), np.zeros(40)])
    segs = segments_from_probs(p, opts)
    assert len(segs) == 1
    s, e = segs[0]
    assert abs(s - 200) <= 30 and abs(e - 600) <= 60


def test_vad_max_segment_split():
    opts = VadOptions(speech_noise_thres=0.5, sil_to_speech_ms=20,
                      max_single_segment_ms=300)
    p = np.ones(100)  # 1s continuous speech, must split at 300ms
    segs = segments_from_probs(p, opts)
    assert len(segs) >= 3


def test_vad_streaming_incremental():
    opts = VadOptions(speech_noise_thres=0.5, sil_to_speech_ms=30,
                      max_end_silence_ms=50, speech_to_sil_ms=50)
    sm = VadStateMachine(opts)
    assert sm.push(np.zeros(20)) == []
    assert sm.push(np.ones(40)) == []
    assert sm.in_speech
    closed = sm.push(np.zeros(40))
    assert len(closed) == 1
    assert not sm.in_speech


def test_streaming_vad_stepper(params):
    """Per-session stepper: chunked model VAD with carried conv cache."""
    from toolbox_for_asr_and_tts_tpu.asr.vad import StreamingVadStepper
    stepper = StreamingVadStepper(params, CFG, threshold=0.5)
    rng = np.random.default_rng(5)
    outs = [stepper(0.2 * rng.standard_normal(6400).astype(np.float32))
            for _ in range(4)]
    assert all(isinstance(o, bool) for o in outs)
    stepper.reset()
    outs2 = [stepper(0.2 * rng.standard_normal(6400).astype(np.float32))
             for _ in range(4)]
    assert all(isinstance(o, bool) for o in outs2)


def test_vad_windowed_voting_tolerates_flips():
    """With voting on, brief single-frame dropouts inside speech don't reset
    the onset counter (strict-run mode would)."""
    base = dict(speech_noise_thres=0.5, sil_to_speech_ms=50,
                max_end_silence_ms=100, speech_to_sil_ms=100)
    # speech with a flip every 5th frame
    p = np.ones(60)
    p[::5] = 0.0
    p = np.concatenate([np.zeros(10), p, np.zeros(30)])
    strict = segments_from_probs(p, VadOptions(**base))
    voting = segments_from_probs(
        p, VadOptions(window_ms=50, vote_ratio=0.6, **base))
    # voting yields one contiguous segment; strict may fragment or match
    assert len(voting) == 1
    assert len(voting) <= max(len(strict), 1)


def test_vad_windowed_voting_still_rejects_silence():
    opts = VadOptions(speech_noise_thres=0.5, sil_to_speech_ms=30,
                      window_ms=50, vote_ratio=0.8)
    assert segments_from_probs(np.zeros(200), opts) == []
