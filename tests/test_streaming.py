import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models.paraformer_streaming import (  # noqa: E402
    StreamingConfig,
    StreamingFrontend,
    StreamingRecognizer,
    cif_step,
)
from toolbox_for_asr_and_tts_tpu.ops import frontend as fe  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.tokenizer import CharTokenizer  # noqa: E402

TINY = paraformer.ParaformerConfig(
    input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
    encoder_layers=2, decoder_layers=2, vocab_size=64)


def test_cif_step_matches_offline():
    """Chunked cif_step must fire the same tokens as offline cif."""
    rng = np.random.default_rng(0)
    T, D = 48, 8
    enc = rng.standard_normal((T, D)).astype(np.float32)
    alphas = rng.uniform(0.05, 0.5, T).astype(np.float32)
    off_emb, off_count, _, _, _ = paraformer.cif(
        jnp.asarray(enc[None]), jnp.asarray(alphas[None]), 32, tail_threshold=0.0)
    n_off = int(off_count[0])

    mass = jnp.zeros(())
    acc = jnp.zeros((D,))
    fired = []
    for i in range(0, T, 8):
        emb, n, mass, acc = cif_step(jnp.asarray(enc[i:i + 8]),
                                     jnp.asarray(alphas[i:i + 8]),
                                     mass, acc, k_cap=8)
        fired.extend(np.asarray(emb[: int(n)]))
    assert len(fired) == n_off
    np.testing.assert_allclose(np.stack(fired),
                               np.asarray(off_emb[0, :n_off]),
                               rtol=1e-4, atol=1e-4)


def test_cif_step_no_fire_carries_partial():
    enc = jnp.ones((4, 3))
    alphas = jnp.full((4,), 0.1)
    emb, n, mass, acc = cif_step(enc, alphas, jnp.zeros(()), jnp.zeros((3,)), 4)
    assert int(n) == 0
    np.testing.assert_allclose(float(mass), 0.4, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), 0.4, rtol=1e-5)
    # continue: another 0.7 mass → fires one token of total weight 1.0
    emb, n, mass, acc = cif_step(enc, jnp.full((4,), 0.175), mass, acc, 4)
    assert int(n) == 1
    np.testing.assert_allclose(np.asarray(emb[0]), 1.0, rtol=1e-4)


def test_streaming_frontend_matches_offline():
    rng = np.random.default_rng(1)
    wav = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    cfg = fe.FrontendConfig()  # 7/6 LFR
    offline = np.asarray(fe.apply_lfr(
        fe.fbank(jnp.asarray(wav[None]), cfg), cfg.lfr_m, cfg.lfr_n))[0]
    sf = StreamingFrontend(cfg)
    chunks = []
    for i in range(0, len(wav), 6400):
        out = sf.push(wav[i:i + 6400])
        if len(out):
            chunks.append(out)
    streamed = np.concatenate(chunks)
    n = len(streamed)
    assert n >= offline.shape[0] - 2  # ≤2 trailing frames await lookahead
    np.testing.assert_allclose(streamed, offline[:n], rtol=1e-3, atol=1e-3)


def test_streaming_recognizer_runs_and_finalizes():
    params = paraformer.init_params(jax.random.PRNGKey(0), TINY)
    sr = StreamingRecognizer(params, TINY, CharTokenizer.dummy(TINY.vocab_size),
                             StreamingConfig(chunk_frames=4, encoder_lookback=2))
    rng = np.random.default_rng(2)
    wav = (0.3 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)
           + 0.02 * rng.standard_normal(32000)).astype(np.float32)
    partials = []
    for i in range(0, len(wav), 6400):
        partials.append(sr.push_audio(wav[i:i + 6400]))
    final = sr.finalize()
    assert isinstance(final, str)
    assert len(sr._embeds) == 0  # reset happened
    # deterministic across identical replays
    sr2 = StreamingRecognizer(params, TINY, CharTokenizer.dummy(TINY.vocab_size),
                              StreamingConfig(chunk_frames=4, encoder_lookback=2))
    for i in range(0, len(wav), 6400):
        sr2.push_audio(wav[i:i + 6400])
    assert sr2.finalize() == final


def test_finalize_padding_adds_no_mass():
    """Regression (round-2 self-review): zero-pad rows in the last partial
    chunk must contribute no CIF mass and no decode memory."""
    params = paraformer.init_params(jax.random.PRNGKey(0), TINY)
    sr = StreamingRecognizer(params, TINY, CharTokenizer.dummy(TINY.vocab_size),
                             StreamingConfig(chunk_frames=4))
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((8, TINY.input_dim)).astype(np.float32)
    for i in range(0, 8, 4):
        sr._process_chunk(feats[i:i+4])
    mass_before = float(sr._mass)
    mem_before = len(sr._memory)
    sr._process_chunk(np.zeros((4, TINY.input_dim), np.float32), n_valid=0)
    assert float(sr._mass) == mass_before
    assert len(sr._memory) == mem_before
