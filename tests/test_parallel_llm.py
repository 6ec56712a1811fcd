import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel.sharding import (  # noqa: E402
    make_2d_mesh,
    param_shardings,
    shard_params,
    spec_for_path,
)
from toolbox_for_asr_and_tts_tpu.parallel.trainstep import (  # noqa: E402
    make_train_step,
    paraformer_loss,
)

TINY = paraformer.ParaformerConfig(
    input_dim=32, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=2, decoder_layers=1, vocab_size=32)


def test_spec_rules():
    assert spec_for_path("encoder.layers.0.ffn.w1.w", 2) == P(None, "model")
    assert spec_for_path("encoder.layers.0.ffn.w2.w", 2) == P("model", None)
    assert spec_for_path("encoder.layers.3.attn.qkv.w", 2) == P(None, "model")
    assert spec_for_path("decoder.out.w", 2) == P(None, "model")
    assert spec_for_path("encoder.layers.0.norm1.g", 1) == P()


def test_train_step_decreases_loss():
    params = paraformer.init_params(jax.random.PRNGKey(0), TINY)
    init_opt, step = make_train_step(TINY)
    opt_state = init_opt(params)
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32),
        "feat_lens": jnp.asarray([12, 10], jnp.int32),
        "targets": jnp.asarray(rng.integers(3, 32, (2, 6)), jnp.int32),
        "target_lens": jnp.asarray([6, 4], jnp.int32),
    }
    step = jax.jit(step)
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_sharded_train_step_matches_local():
    mesh = make_2d_mesh(8, model_parallel=2)
    params = paraformer.init_params(jax.random.PRNGKey(1), TINY)
    rng = np.random.default_rng(1)
    batch_np = {
        "feats": rng.standard_normal((8, 12, 32)).astype(np.float32),
        "feat_lens": np.full((8,), 12, np.int32),
        "targets": rng.integers(3, 32, (8, 6)).astype(np.int32),
        "target_lens": np.full((8,), 6, np.int32),
    }
    loss_local, _ = paraformer_loss(
        params, jnp.asarray(batch_np["feats"]),
        jnp.asarray(batch_np["feat_lens"]), jnp.asarray(batch_np["targets"]),
        jnp.asarray(batch_np["target_lens"]), TINY)
    sp = shard_params(params, mesh)
    dsh = NamedSharding(mesh, P("data"))
    sb = {k: jax.device_put(v, dsh) for k, v in batch_np.items()}
    loss_sh, _ = jax.jit(lambda p, b: paraformer_loss(
        p, b["feats"], b["feat_lens"], b["targets"], b["target_lens"], TINY)
    )(sp, sb)
    np.testing.assert_allclose(float(loss_sh), float(loss_local),
                               rtol=1e-4, atol=1e-5)


def test_param_shardings_cover_tree():
    mesh = make_2d_mesh(8, model_parallel=2)
    params = paraformer.init_params(jax.random.PRNGKey(2), TINY)
    sh = param_shardings(params, mesh)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(sh, is_leaf=lambda x: isinstance(x, NamedSharding))
    assert len(flat_p) == len(flat_s)


def test_graft_entry_dryrun():
    import importlib
    m = importlib.import_module("__graft_entry__")
    m.dryrun_multichip(8)


# --------------------------------------------------------------- LLM mock
def test_llm_corrector_noop_without_endpoint(monkeypatch):
    from toolbox_for_asr_and_tts_tpu.llm.correction import LLMCorrector
    c = LLMCorrector(base_url="")
    assert not c.enabled
    assert c.correct_text_only(["心衰"], "测试文本") == "测试文本"


def test_llm_corrector_parses_and_guards(monkeypatch):
    from toolbox_for_asr_and_tts_tpu.llm import correction as C
    c = C.LLMCorrector(base_url="http://fake")
    monkeypatch.setattr(c, "_call",
                        lambda msgs: '{"corrected": "修正后文本"}')
    assert c.correct_text_only(["心衰"], "修正前文本") == "修正后文本"
    # length-drift guard rejects wild outputs
    monkeypatch.setattr(c, "_call",
                        lambda msgs: '{"corrected": "' + "长" * 99 + '"}')
    assert c.correct_text_only([], "短文本") == "短文本"
    # garbage JSON → passthrough
    monkeypatch.setattr(c, "_call", lambda msgs: "not json at all")
    assert c.correct_text_only([], "原文") == "原文"


def test_load_hotwords_list_fallback():
    from toolbox_for_asr_and_tts_tpu.llm.correction import load_hotwords_list
    words = load_hotwords_list(None)
    assert "心悸" in words and len(words) > 100


def test_extract_json():
    from toolbox_for_asr_and_tts_tpu.llm.correction import _extract_json
    assert _extract_json('{"a": 1}') == {"a": 1}
    assert _extract_json('text {"a": 1} more') == {"a": 1}
    assert _extract_json("none") is None


def test_train_step_with_remat_matches():
    """jax.checkpoint'ed encoder gives the same loss/grads as plain."""
    import dataclasses
    cfg_plain = TINY
    cfg_remat = dataclasses.replace(TINY, remat=True)
    params = paraformer.init_params(jax.random.PRNGKey(3), TINY)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
    lens = jnp.asarray([10, 8], jnp.int32)
    tgt = jnp.asarray(rng.integers(3, 32, (2, 5)), jnp.int32)
    tlens = jnp.asarray([5, 4], jnp.int32)

    def loss(cfg):
        l, _ = paraformer_loss(params, feats, lens, tgt, tlens, cfg)
        return l

    g_plain = jax.grad(lambda p: paraformer_loss(
        p, feats, lens, tgt, tlens, cfg_plain)[0])(params)
    g_remat = jax.grad(lambda p: paraformer_loss(
        p, feats, lens, tgt, tlens, cfg_remat)[0])(params)
    np.testing.assert_allclose(float(loss(cfg_plain)), float(loss(cfg_remat)),
                               rtol=1e-5)
    a = jax.tree.leaves(g_plain)
    b = jax.tree.leaves(g_remat)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)
