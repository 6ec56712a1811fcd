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
