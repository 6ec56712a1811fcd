"""Replay tests for the streaming session FSM (survey §7: table-driven FSM
with replay tests, not ad hoc ifs)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.asr import session as S  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.corrections import (  # noqa: E402
    apply_hard_corrections,
    is_punct_only,
)
from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines  # noqa: E402

CHUNK = int(0.4 * 16000)  # 400 ms chunks, the reference cadence


def speech(seed=0, amp=0.3):
    rng = np.random.default_rng(seed)
    t = np.arange(CHUNK) / 16000
    return (amp * np.sin(2 * np.pi * 250 * t)
            + 0.02 * rng.standard_normal(CHUNK)).astype(np.float32)


def silence():
    return np.zeros(CHUNK, np.float32)


@pytest.fixture(scope="module")
def engines():
    eng = build_test_engines()
    yield eng
    eng.close()


def test_initial_mode_follows_use_wake(engines):
    assert S.StreamingASRSession(engines, use_wake=True).mode == S.WAITING_FOR_WAKEUP
    assert S.StreamingASRSession(engines, use_wake=False).mode == S.ASR_ACTIVE


def test_silence_never_finalizes(engines):
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    for _ in range(20):
        r = sess.process_chunk(silence())
        assert not r["should_finalize"]
    assert not sess.has_detected_speech
    # pre-speech FIFO capped at 400 ms
    assert len(sess.pre_speech_buffer) <= int(0.4 * 16000)


def test_speech_then_silence_finalizes_at_2s(engines):
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    sess.process_chunk(silence())           # goes to pre-speech buffer
    for i in range(4):
        r = sess.process_chunk(speech(i))
        assert not r["should_finalize"]
    results = [sess.process_chunk(silence()) for _ in range(6)]
    # 2.0 s = 5 silent chunks of 400 ms
    assert not results[3]["should_finalize"]
    assert results[4]["should_finalize"]
    # buffer: 1 pre-speech + 4 speech + 2 silent (cap) chunks
    assert len(sess.audio_buffer) == CHUNK * 7


def test_max_two_silent_chunks_accumulated(engines):
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    sess.process_chunk(speech(0))
    for _ in range(10):
        sess.process_chunk(silence())
    assert len(sess.audio_buffer) == CHUNK * 3  # 1 speech + 2 silence


def test_speech_resets_silence_timer(engines):
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    sess.process_chunk(speech(0))
    for _ in range(4):
        sess.process_chunk(silence())
    r = sess.process_chunk(speech(1))
    assert r["is_speech"]
    assert sess.silence_timer == 0.0
    assert sess.silence_chunk_count == 0


def test_finalize_returns_text_and_reset_allows_next_round(engines):
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    for i in range(4):
        sess.process_chunk(speech(i))
    for _ in range(5):
        r = sess.process_chunk(silence())
    assert r["should_finalize"]
    text = sess.finalize()
    assert isinstance(text, str)
    assert text not in (S.SV_NOT_ACTIVATED, S.SV_VERIFICATION_FAILED)
    sess.reset_asr_state()
    assert sess.mode == S.ASR_ACTIVE
    assert len(sess.audio_buffer) == 0
    assert not sess.has_detected_speech


def test_enrollment_and_confirm_flow(engines):
    sess = S.StreamingASRSession(engines, use_wake=True, use_sv=True)
    sess.mode = S.WAITING_FOR_ENROLLMENT  # as if KWS fired
    sess.is_activated = True
    # 13 speech chunks = 5.2 s ≥ 5 s (condition 1)
    for i in range(13):
        r = sess.process_enrollment_chunk(speech(i))
        assert not r["completed"]
    # 5 silence chunks = 2.0 s (condition 2) → completed
    done = False
    for _ in range(6):
        r = sess.process_enrollment_chunk(silence())
        if r["completed"]:
            done = True
            break
    assert done
    assert sess.mode == S.WAITING_FOR_ENROLLMENT_CONFIRM
    assert sess.is_enrolled and sess.enroll_audio is not None
    assert sess.confirm_start_asr()
    assert sess.mode == S.ASR_ACTIVE


def test_enrollment_needs_both_conditions(engines):
    sess = S.StreamingASRSession(engines, use_wake=True, use_sv=True)
    sess.mode = S.WAITING_FOR_ENROLLMENT
    # condition 2 (2 s silence) met but condition 1 (5 s since first speech,
    # silence included — reference voice.py:536) not yet → must not complete
    sess.process_enrollment_chunk(speech(0))
    for _ in range(5):                    # 0.4 + 2.0 s = 2.4 s total < 5 s
        r = sess.process_enrollment_chunk(silence())
    assert not r["completed"]
    assert sess.mode == S.WAITING_FOR_ENROLLMENT
    # 7 more chunks → ≥5 s since first speech AND ≥2 s silence → completes
    done = False
    for _ in range(7):
        if sess.process_enrollment_chunk(silence())["completed"]:
            done = True
    assert done


def test_sv_gates_results(engines):
    sess = S.StreamingASRSession(engines, use_wake=True, use_sv=True)
    # not activated + sv on + wake on → finalize refuses
    sess.mode = S.ASR_ACTIVE
    for i in range(4):
        sess.process_chunk(speech(i))
    for _ in range(5):
        sess.process_chunk(silence())
    assert sess.finalize() == S.SV_NOT_ACTIVATED


def test_sv_same_speaker_passes(engines):
    sess = S.StreamingASRSession(engines, use_wake=True, use_sv=True)
    sess.is_activated = True
    sess.is_enrolled = True
    enroll = np.concatenate([speech(i) for i in range(13)])
    sess.enroll_audio = enroll
    sess.mode = S.ASR_ACTIVE
    for i in range(4):
        sess.process_chunk(speech(i))
    for _ in range(5):
        sess.process_chunk(silence())
    text = sess.finalize()
    # same synthetic "voice" → random CAM++ embeddings still correlate
    # strongly (same generator), so verification passes
    assert text != S.SV_NOT_ACTIVATED


def test_experimental_chunk_sv(engines, monkeypatch):
    """Per-chunk experimental SV (reference voice_interface.py:1834-1871):
    OFF by default; when enabled, speech chunks accumulate and a score
    against the enrollment fires once ≥1 s is buffered, then the chunk
    buffer restarts while the accumulated buffer keeps growing."""
    sess_off = S.StreamingASRSession(engines, use_wake=False, use_sv=True)
    assert "experimental_sv" not in sess_off.process_chunk(speech())

    monkeypatch.setenv("VOICE_EXPERIMENTAL_CHUNK_SV", "1")
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=True)
    sess.is_activated = True
    sess.is_enrolled = True
    sess.enroll_audio = np.concatenate([speech(i) for i in range(13)])
    # 400 ms chunks: the first two return nothing (buffer < 1 s), the
    # third crosses 1.2 s and fires a verification
    assert sess.process_chunk(speech(0))["experimental_sv"] is None
    assert sess.process_chunk(speech(1))["experimental_sv"] is None
    r = sess.process_chunk(speech(2))["experimental_sv"]
    assert r is not None and isinstance(r["chunk_score"], float)
    assert r["accumulated_score"] is not None      # accumulated ≥ 1 s too
    assert len(sess.exp_sv_buffer) == 0            # chunk buffer restarted
    assert len(sess.exp_sv_accumulated) > 0        # accumulated persists
    # same synthetic voice → same-generator embeddings correlate
    assert r["chunk_verified"] in (True, False)
    # a long silence run drops a too-short pending chunk buffer
    sess.process_chunk(speech(3))
    assert len(sess.exp_sv_buffer) > 0
    sess.process_chunk(silence())
    assert len(sess.exp_sv_buffer) == 0
    # reset clears the experimental state with the ASR state
    sess.reset_asr_state()
    assert len(sess.exp_sv_accumulated) == 0 and sess.exp_sv_last is None


def test_set_use_wake_transitions(engines):
    sess = S.StreamingASRSession(engines, use_wake=True)
    assert sess.mode == S.WAITING_FOR_WAKEUP
    sess.set_use_wake(False)
    assert sess.mode == S.ASR_ACTIVE
    sess.set_use_wake(True)
    assert sess.mode == S.WAITING_FOR_WAKEUP


def test_reset_clears_everything(engines):
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    sess.process_chunk(speech(0))
    sess.reset()
    assert len(sess.audio_buffer) == 0
    assert sess.mode == S.ASR_ACTIVE  # use_wake False
    assert not sess.is_activated


# ------------------------------------------------------------ corrections
def test_hard_corrections_whole_utterance():
    assert apply_hard_corrections("五。") == "无"
    assert apply_hard_corrections("吴") == "无"
    assert apply_hard_corrections("5") == "无"
    # not alone → unchanged by rule 1
    assert apply_hard_corrections("无其他") == "无其他"


def test_hard_corrections_global():
    assert apply_hard_corrections("有前妻症状") == "有前期症状"
    assert apply_hard_corrections("黑边和黑变") == "黑便和黑便"
    assert apply_hard_corrections("肚子腾") == "肚子疼"
    assert apply_hard_corrections("我脱腾") == "我头疼"  # multi-char wins
    assert apply_hard_corrections("壳黄色粘痰") == "咳黄色粘痰"
    assert apply_hard_corrections("气串") == "气喘"
    assert apply_hard_corrections("肚子涨") == "肚子胀"
    assert apply_hard_corrections("正在树叶") == "正在输液"
    assert apply_hard_corrections("颜面不通") == "颜面部痛"
    assert apply_hard_corrections("犯罪症状") == "伴随症状"


def test_interjection_stripping():
    assert apply_hard_corrections("啊，我头疼。") == "，我头疼。"
    assert apply_hard_corrections("我呃呃不知道呜呜怎么说") == "我不知道呜呜怎么说"
    assert apply_hard_corrections("嗯哎呦。") == "。"


def test_is_punct_only():
    assert is_punct_only("。，！")
    assert is_punct_only("")
    assert not is_punct_only("好。")


def test_session_soak_many_rounds(engines):
    """State hygiene across many utterance rounds on one connection:
    buffers, timers and flags must not leak between rounds."""
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    for round_i in range(5):
        for i in range(3):
            r = sess.process_chunk(speech(round_i * 10 + i))
            assert not r["should_finalize"]
        fired = False
        for _ in range(6):
            r = sess.process_chunk(silence())
            if r["should_finalize"]:
                fired = True
                break
        assert fired, f"round {round_i} never finalized"
        text = sess.finalize()
        assert isinstance(text, str)
        sess.reset_asr_state()
        assert len(sess.audio_buffer) == 0
        assert sess.silence_timer == 0.0
        assert not sess.has_detected_speech
        assert sess.mode == S.ASR_ACTIVE
    # a full reset also clears activation
    sess.is_activated = True
    sess.reset()
    assert not sess.is_activated
