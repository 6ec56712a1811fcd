"""W8A8 int8 serving quantization: numerics + end-to-end guards.

The encoder's linears quantize to int8 (per-output-channel weight scales,
dynamic per-token activation scales, s32 accumulation) for the MXU's
2×-throughput s8 path; these tests lock the dequantization math and bound
the accuracy cost on the full (tiny) Paraformer stack.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops import nn  # noqa: E402


def test_linear_int8_matches_f32():
    key = jax.random.PRNGKey(0)
    p = nn.linear_init(key, 64, 48)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 64))
    ref = nn.linear(p, x)
    q = nn.quantize_linear_int8(p)
    assert q["w"].dtype == jnp.int8 and q["s"].shape == (48,)
    got = nn.linear(q, x)       # dispatches on the int8 dtype
    denom = np.maximum(np.abs(np.asarray(ref)), 1e-3)
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
    assert float(np.median(rel)) < 0.02, float(np.median(rel))


def test_linear_int8_under_jit_and_bf16():
    p = nn.quantize_linear_int8(nn.linear_init(jax.random.PRNGKey(0), 32, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32), jnp.bfloat16)
    y = jax.jit(lambda p, x: nn.linear(p, x))(p, x)
    assert y.dtype == jnp.bfloat16 and np.isfinite(
        np.asarray(y, np.float32)).all()


def _tiny():
    cfg = paraformer.ParaformerConfig(
        input_dim=40, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=3, decoder_layers=2, vocab_size=64)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_quantized_encoder_close_and_tokens_stable():
    cfg, params = _tiny()
    qparams = paraformer.quantize_encoder_int8(params)
    # non-encoder subtrees untouched (same objects is fine; same values)
    np.testing.assert_array_equal(
        np.asarray(qparams["decoder"]["out"]["w"]),
        np.asarray(params["decoder"]["out"]["w"]))
    b, t, k = 3, 50, 12
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.input_dim))
    lens = jnp.asarray([50, 37, 20], jnp.int32)
    ref = paraformer.forward(params, feats, lens, k, cfg)
    got = paraformer.forward(qparams, feats, lens, k, cfg)
    a = np.asarray(ref["logits"], np.float32).reshape(-1)
    c = np.asarray(got["logits"], np.float32).reshape(-1)
    cos = float(a @ c / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-9))
    assert cos > 0.995, cos
    # token counts identical; greedy tokens near-identical
    np.testing.assert_array_equal(np.asarray(ref["token_count"]),
                                  np.asarray(got["token_count"]))
    same = np.mean(np.asarray(ref["tokens"]) == np.asarray(got["tokens"]))
    assert same > 0.9, same


def test_recognizer_env_flag(monkeypatch):
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    monkeypatch.setenv("PARAFORMER_QUANT", "int8")
    cfg = paraformer.ParaformerConfig(   # input_dim must match the frontend
        d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=3, decoder_layers=2, vocab_size=64)
    reco = Recognizer.random(cfg=cfg, use_mesh=False)
    layer = reco.params["encoder"]["layers"][0]
    assert layer["attn"]["qkv"]["w"].dtype == jnp.int8
    wav = 0.1 * np.random.default_rng(0).standard_normal(16000).astype(
        np.float32)
    res = reco.transcribe([wav])
    assert isinstance(res[0].text, str)
