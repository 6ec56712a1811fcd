"""Long-form transcription: silence-aware split + merged absolute
timestamps (audio past the largest bucket used to TRUNCATE silently)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime.bucketing import Bucketer  # noqa: E402

CFG = paraformer.ParaformerConfig(
    d_model=32, n_heads=2, ffn_dim=64,
    encoder_layers=2, decoder_layers=1, vocab_size=64)
SR = 16000


@pytest.fixture(scope="module")
def reco():
    # small bucket envelope (max 4 s) so "long" audio is cheap to test
    return Recognizer.random(
        cfg=CFG, use_mesh=False,
        bucketer=Bucketer((SR, 2 * SR, 4 * SR)))


def _bursty(total_s: float, silence_at=(0.4, 0.7)):
    """Speech-like noise with true silences at given relative positions."""
    rng = np.random.default_rng(0)
    n = int(total_s * SR)
    x = 0.1 * rng.standard_normal(n).astype(np.float32)
    for rel in silence_at:
        c = int(rel * n)
        x[c - SR // 5: c + SR // 5] = 0.0      # 400 ms of silence
    return x


def test_split_long_bounds_and_silence_preference(reco):
    wav = _bursty(10.0)
    pieces = reco.split_long(wav)
    assert len(pieces) >= 3
    # pieces tile the input exactly
    assert pieces[0][0] == 0
    reassembled = np.concatenate([p for _, p in pieces])
    np.testing.assert_array_equal(reassembled, wav)
    for start, p in pieces:
        assert len(p) <= 4 * SR
    # interior cuts land in silence (quietest-frame rule)
    for start, _ in pieces[1:]:
        win = wav[max(0, start - 200): start + 200]
        assert np.abs(win).max() < 0.05, np.abs(win).max()


def test_short_audio_passthrough(reco):
    wav = _bursty(2.0, silence_at=())
    got = reco.transcribe_long(wav)
    ref = reco.transcribe([wav])[0]
    assert got.token_ids == ref.token_ids
    assert got.timestamps_ms == ref.timestamps_ms


def test_long_merge_offsets_and_counts(reco):
    wav = _bursty(10.0)
    merged = reco.transcribe_long(wav)
    pieces = reco.split_long(wav)
    per = reco.transcribe([p for _, p in pieces])
    assert merged.token_ids == sum((r.token_ids for r in per), [])
    assert merged.text == "".join(r.text for r in per)
    assert len(merged.timestamps_ms) == len(merged.token_ids)
    # timestamps are absolute: nondecreasing across piece boundaries and
    # within the audio duration
    ts = merged.timestamps_ms
    assert all(b >= a for a, b in zip(ts, ts[1:])), ts
    assert not ts or ts[-1] <= 10_000
    assert merged.audio_s == pytest.approx(10.0, abs=0.01)


def test_diarize_uses_long_path(reco, monkeypatch):
    from toolbox_for_asr_and_tts_tpu.asr import diarization as D
    from toolbox_for_asr_and_tts_tpu.asr.speaker import SpeakerVerifier
    dia = D.Diarizer(reco, SpeakerVerifier.random(), punctuator=None)
    calls = []
    orig = reco.transcribe_long
    monkeypatch.setattr(reco, "transcribe_long",
                        lambda w, **kw: calls.append(len(w)) or orig(w, **kw))
    wav = _bursty(10.0)
    dia.diarize(wav)
    assert calls == [len(wav)]
