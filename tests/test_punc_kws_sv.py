import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import campplus, ct_transformer, kws_ctc  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models.ct_transformer import (  # noqa: E402
    Punctuator,
    split_words,
)
from toolbox_for_asr_and_tts_tpu.asr.speaker import SpeakerVerifier  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.diarization import (  # noqa: E402
    cluster_embeddings,
    extract_speaker_audio,
    group_by_speaker,
)


# -------------------------------------------------------------- punctuation
def test_split_words():
    assert split_words("你好world吗") == ["你", "好", "world", "吗"]
    assert split_words("abc def") == ["abc", "def"]
    assert split_words("心率120次") == ["心", "率", "120", "次"]


def test_punctuator_inserts_and_terminates():
    p = Punctuator.random()
    out = p.punctuate("你好今天天气怎么样")
    assert out[-1] in "。？！，、"
    # all original chars preserved in order
    stripped = [c for c in out if c not in "。？！，、_"]
    assert "".join(stripped) == "你好今天天气怎么样"


def test_punctuator_bucket_reuse():
    p = Punctuator.random()
    p.punctuate("一二三")
    n = len(p._fns)
    p.punctuate("四五六七")
    assert len(p._fns) == n  # same 16-bucket


def test_ct_transformer_forward_mask():
    cfg = ct_transformer.CTTransformerConfig(
        vocab_size=128, embed_dim=32, d_model=32, n_heads=2, ffn_dim=64,
        num_layers=2)
    params = ct_transformer.init_params(jax.random.PRNGKey(0), cfg)
    ids = np.ones((2, 16), np.int32)
    out = ct_transformer.forward(params, jnp.asarray(ids),
                                 jnp.asarray([16, 8]), cfg)
    assert out.shape == (2, 16, cfg.punc_size)
    assert np.isfinite(np.asarray(out)).all()


# ----------------------------------------------------------------- KWS CTC
def _naive_ctc_score(logp, labels, blank=0):
    """Brute-force CTC forward via dynamic programming in numpy."""
    T, V = logp.shape
    ext = [blank]
    for l in labels:
        ext += [l, blank]
    S = len(ext)
    NEG = -1e30
    a = np.full(S, NEG)
    a[0] = logp[0, blank]
    if S > 1:
        a[1] = logp[0, ext[1]]
    for t in range(1, T):
        na = np.full(S, NEG)
        for s in range(S):
            best = a[s]
            if s >= 1:
                best = np.logaddexp(best, a[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                best = np.logaddexp(best, a[s - 2])
            na[s] = best + logp[t, ext[s]]
        a = na
    return np.logaddexp(a[S - 1], a[S - 2])


def test_ctc_forward_matches_naive():
    rng = np.random.default_rng(0)
    T, V = 20, 8
    logits = rng.standard_normal((T, V)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    labels = np.array([3, 5, 3], np.int32)
    pad = np.zeros(6, np.int32)
    pad[:3] = labels
    got = float(kws_ctc.ctc_forward_score(
        jnp.asarray(logp), jnp.asarray(pad), jnp.asarray(3), jnp.asarray(T)))
    want = _naive_ctc_score(logp, labels.tolist())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kws_spotter_detects_planted_keyword():
    spotter = kws_ctc.KeywordSpotter.random(threshold=0.0)
    cfg = spotter.cfg
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((40, cfg.input_dim)).astype(np.float32)
    det_noise, score_noise = spotter.detect_feats(feats, 40)
    # plant the keyword by biasing the output layer toward its chars mid-window
    # instead: score of true keyword vs an impossible long keyword
    spotter2 = kws_ctc.KeywordSpotter.random(threshold=0.0)
    spotter2.set_keyword("小护小护小护")
    _, score_long = spotter2.detect_feats(feats, 40)
    assert np.isfinite(score_noise) and np.isfinite(score_long)


def test_kws_forward_shapes():
    cfg = kws_ctc.KwsConfig(vocab_size=32, hidden_dim=16, proj_dim=8, num_layers=2)
    params = kws_ctc.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 30, cfg.input_dim))
    out = kws_ctc.forward(params, x, cfg)
    assert out.shape == (2, 30, 32)
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0, rtol=1e-4)


# ------------------------------------------------------------------ CAM++
def test_campplus_embedding_shapes():
    sv = SpeakerVerifier.random()
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    emb = sv.embed([wav, wav * 0.5])
    assert emb.shape == (2, sv.cfg.embedding_size)
    assert np.isfinite(emb).all()


def test_sv_identical_audio_scores_high():
    sv = SpeakerVerifier.random(threshold=0.4)
    wav = np.random.default_rng(1).standard_normal(16000).astype(np.float32) * 0.1
    same, score = sv.verify(wav, wav.copy())
    assert score > 0.99
    assert same


def test_cosine_score():
    a, b = np.array([1.0, 0.0]), np.array([0.0, 1.0])
    assert abs(campplus.cosine_score(a, a) - 1.0) < 1e-6
    assert abs(campplus.cosine_score(a, b)) < 1e-6


# -------------------------------------------------------------- clustering
def test_cluster_embeddings_two_speakers():
    rng = np.random.default_rng(2)
    a = rng.standard_normal(32)
    b = rng.standard_normal(32)
    embs = np.stack([a + 0.05 * rng.standard_normal(32) for _ in range(3)]
                    + [b + 0.05 * rng.standard_normal(32) for _ in range(3)])
    labels = cluster_embeddings(embs, threshold=0.6)
    assert labels[:3].tolist() == [0, 0, 0]
    assert labels[3:].tolist() == [1, 1, 1]


def test_group_and_extract():
    from toolbox_for_asr_and_tts_tpu.asr.diarization import Sentence
    sents = [Sentence("a", 0, 1000, 0), Sentence("b", 1000, 2000, 1),
             Sentence("c", 2000, 3000, 0)]
    g = group_by_speaker(sents)
    assert set(g) == {0, 1} and len(g[0]) == 2
    wav = np.arange(48000, dtype=np.float32)
    x = extract_speaker_audio(wav, sents, 0)
    assert len(x) == 32000


def test_punctuator_classify():
    p = Punctuator.random()
    cls = p.classify(["你", "好", "吗"])
    assert cls.shape == (3,)
    assert (cls >= 0).all()
    assert p.classify([]).shape == (0,)


def test_ct_transformer_right_context_is_causal_bound():
    """With right_context=0, position t must not see future tokens."""
    cfg = ct_transformer.CTTransformerConfig(
        vocab_size=64, embed_dim=32, d_model=32, n_heads=2, ffn_dim=64,
        num_layers=2, right_context=0)
    params = ct_transformer.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    a = rng.integers(1, 64, (1, 12)).astype(np.int32)
    b = a.copy()
    b[0, 8:] = rng.integers(1, 64, 4)  # change the future
    la = np.asarray(ct_transformer.forward(params, jnp.asarray(a),
                                           jnp.asarray([12]), cfg))
    lb = np.asarray(ct_transformer.forward(params, jnp.asarray(b),
                                           jnp.asarray([12]), cfg))
    np.testing.assert_allclose(la[0, :8], lb[0, :8], rtol=1e-4, atol=1e-5)
    # unlimited context: the future does change early positions
    cfg2 = ct_transformer.CTTransformerConfig(
        vocab_size=64, embed_dim=32, d_model=32, n_heads=2, ffn_dim=64,
        num_layers=2, right_context=-1)
    la2 = np.asarray(ct_transformer.forward(params, jnp.asarray(a),
                                            jnp.asarray([12]), cfg2))
    lb2 = np.asarray(ct_transformer.forward(params, jnp.asarray(b),
                                            jnp.asarray([12]), cfg2))
    assert not np.allclose(la2[0, :8], lb2[0, :8])
