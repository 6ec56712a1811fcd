"""Speaker clustering validated against synthetic ground truth — VERDICT
round-1 item #8: assignments, not just "runs"."""
import numpy as np
import pytest

from toolbox_for_asr_and_tts_tpu.asr.diarization import (
    _renumber, cluster_embeddings, spectral_cluster)


def _synthetic(labels, d=192, noise=0.5, seed=0):
    """Embeddings for a ground-truth label sequence: per-speaker random unit
    anchors + a noise vector of total norm `noise`, length-normalized like
    CAM++ outputs. noise=0.5 → within-speaker cosine ≈ 0.8, the regime real
    same-speaker CAM++ scores live in."""
    rng = np.random.default_rng(seed)
    k = max(labels) + 1
    anchors = rng.standard_normal((k, d))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    out = []
    for l in labels:
        g = rng.standard_normal(d)
        e = anchors[l] + g / np.linalg.norm(g) * noise
        out.append(e / np.linalg.norm(e))
    return np.stack(out)


def _agree(got, want):
    """Exact agreement after first-appearance renumbering of both."""
    return np.array_equal(_renumber(np.asarray(got)),
                          _renumber(np.asarray(want)))


TWO_SPK = [0, 0, 1, 0, 1, 1, 0, 1]
THREE_SPK = [0, 1, 2, 0, 1, 2, 2, 0, 1, 0]


@pytest.mark.parametrize("algo", [spectral_cluster,
                                  lambda e: cluster_embeddings(e, 0.60)])
@pytest.mark.parametrize("truth", [TWO_SPK, THREE_SPK],
                         ids=["2spk", "3spk"])
def test_recovers_ground_truth(algo, truth):
    for seed in range(3):
        emb = _synthetic(truth, seed=seed)
        got = algo(emb)
        assert _agree(got, truth), (seed, got.tolist(), truth)


@pytest.mark.parametrize("algo", [spectral_cluster,
                                  lambda e: cluster_embeddings(e, 0.60)])
def test_single_speaker_stays_single(algo):
    emb = _synthetic([0] * 10, noise=0.2, seed=1)
    got = algo(emb)
    assert got.max() == 0, got.tolist()


def test_spectral_noise_robustness():
    """Higher noise (within-speaker cosine ~0.6) must still recover the
    2-speaker structure."""
    truth = TWO_SPK * 2
    emb = _synthetic(truth, noise=0.8, seed=2)
    assert _agree(spectral_cluster(emb), truth)


def test_spectral_edge_cases():
    assert spectral_cluster(np.zeros((0, 8))).shape == (0,)
    assert spectral_cluster(np.ones((1, 8))).tolist() == [0]
    two = _synthetic([0, 1], noise=0.1, seed=3)
    assert _agree(spectral_cluster(two), [0, 1])
    same = _synthetic([0, 0], noise=0.1, seed=3)
    assert _agree(spectral_cluster(same), [0, 0])


def test_spectral_respects_max_speakers():
    truth = list(range(6)) * 2
    emb = _synthetic(truth, noise=0.1, seed=4)
    got = spectral_cluster(emb, max_speakers=4)
    assert got.max() + 1 <= 4


# ------------------------------------------------- overlap refinement
from toolbox_for_asr_and_tts_tpu.asr.diarization import (  # noqa: E402
    Sentence, refine_overlap)

SR = 16000


class FakeVerifier:
    """Embeds a segment as the (unit-norm) histogram of per-sample speaker
    codes: speaker s is encoded in the waveform as constant amplitude
    0.1·(s+1), so a window over speaker s embeds one-hot, and a window over
    mixed speech embeds the mixture — exactly the blind spot under test."""

    def embed(self, segs):
        out = []
        for s in segs:
            codes = np.clip(np.round(np.abs(np.asarray(s)) * 10)
                            .astype(int) - 1, 0, 2)
            h = np.bincount(codes, minlength=3).astype(float)
            out.append(h / (np.linalg.norm(h) + 1e-9))
        return np.stack(out)


def _speaker_wav(spans):
    """spans: list of (speaker, dur_ms) → concatenated coded waveform."""
    parts = [np.full(int(d * SR / 1000), 0.1 * (s + 1), np.float32)
             for s, d in spans]
    return np.concatenate(parts)


def test_overlap_detected_within_sentence():
    """A sentence whose span contains a speaker change gets the secondary
    speaker recorded in overlap_spk (label unchanged — not mixture-dominated
    enough to reassign); pure sentences stay None."""
    wav = _speaker_wav([(0, 2000), (0, 1000), (1, 2000), (1, 2000)])
    sents = [Sentence("甲", 0, 2000, spk=0),
             Sentence("混", 2000, 5000, spk=1),   # 1 s spk0 + 2 s spk1
             Sentence("乙", 5000, 7000, spk=1)]
    v = FakeVerifier()
    emb = v.embed([wav[0:2000 * 16], wav[2000 * 16:5000 * 16],
                   wav[5000 * 16:]])
    labels = np.array([0, 1, 1])
    out = refine_overlap(wav, sents, emb, labels, v)
    assert out[0].overlap_spk is None
    assert out[2].overlap_spk is None
    assert out[1].overlap_spk == [0]
    assert out[1].spk == 1


def test_overlap_reassigns_mixture_dominated():
    """Sentence-level label disagrees with ≥70% of its windows → spk is
    reassigned to the window majority and the old label lands in
    overlap_spk."""
    v = FakeVerifier()
    wav = _speaker_wav([(0, 4000), (1, 500), (1, 2000), (0, 2000)])
    sents = [Sentence("甲", 0, 4500, spk=1),
             Sentence("乙", 4500, 6500, spk=1),
             Sentence("丙", 6500, 8500, spk=0)]
    emb = v.embed([wav[0:4500 * 16], wav[4500 * 16:6500 * 16],
                   wav[6500 * 16:]])
    out = refine_overlap(wav, sents, emb, np.array([1, 1, 0]), v)
    assert out[0].spk == 0, out[0]
    assert 1 in out[0].overlap_spk
    assert out[1].spk == 1 and out[1].overlap_spk is None


def test_overlap_short_sentences_skipped():
    wav = _speaker_wav([(0, 800), (1, 800)])
    sents = [Sentence("a", 0, 800, spk=0), Sentence("b", 800, 1600, spk=1)]
    v = FakeVerifier()
    emb = v.embed([wav[: 800 * 16], wav[800 * 16:]])
    out = refine_overlap(wav, sents, emb, np.array([0, 1]), v)
    assert all(s.overlap_spk is None for s in out)
