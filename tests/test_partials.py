"""2-pass streaming partials: DEFAULT-ON intermediate hypotheses in the
session (VOICE_ENABLE_PARTIALS=0 restores the reference's no-partials
behavior); round 3 serves them through the batched hub by default."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.asr import session as S  # noqa: E402


def _engines_with_partials(monkeypatch):
    monkeypatch.setenv("VOICE_ENABLE_PARTIALS", "1")
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    return build_test_engines()


def speech(seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(6400) / 16000
    return (0.3 * np.sin(2 * np.pi * 250 * t)
            + 0.02 * rng.standard_normal(6400)).astype(np.float32)


def test_partials_emitted_and_reset(monkeypatch):
    # per-session recognizer variant (hub path covered by test_hub)
    monkeypatch.setenv("VOICE_BATCH_SERVING", "0")
    engines = _engines_with_partials(monkeypatch)
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    assert sess.streaming is not None
    partials = [sess.process_chunk(speech(i))["intermediate_text"]
                for i in range(6)]
    assert all(isinstance(p, str) for p in partials)
    sess.reset_asr_state()
    # streaming state cleared between utterances
    assert len(sess.streaming._embeds) == 0


def test_hub_partials_emitted_and_reset(monkeypatch):
    # default path: partials through the batched ChunkedHub (pipelined)
    engines = _engines_with_partials(monkeypatch)
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    assert sess.streaming is not None
    partials = [sess.process_chunk(speech(i))["intermediate_text"]
                for i in range(6)]
    assert all(isinstance(p, str) for p in partials)
    sess.reset_asr_state()
    assert sess.streaming.partial_text() == ""


def test_partials_on_by_default_and_flag_disables(monkeypatch):
    monkeypatch.delenv("VOICE_ENABLE_PARTIALS", raising=False)
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    engines = build_test_engines()
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    assert sess.streaming is not None       # round-3 default
    monkeypatch.setenv("VOICE_ENABLE_PARTIALS", "0")
    engines_off = build_test_engines()
    sess_off = S.StreamingASRSession(engines_off, use_wake=False,
                                     use_sv=False)
    assert sess_off.streaming is None       # reference behavior restored
    r = sess_off.process_chunk(speech())
    assert r["intermediate_text"] == ""
