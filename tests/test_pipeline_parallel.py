"""Pipeline-parallel encoder (GPipe over the model axis) == sequential
encoder — outputs AND gradients, on the 8-virtual-device mesh (dp×pp)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops import nn  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel import pipeline  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel.sharding import make_2d_mesh  # noqa: E402

CFG = paraformer.ParaformerConfig(
    input_dim=24, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=5,              # layer 0 replicated + 4 pipelined (2/stage)
    decoder_layers=1, vocab_size=32)


@pytest.fixture(scope="module")
def setup():
    mesh = make_2d_mesh(8, model_parallel=2)          # data=4 × model=2
    params = paraformer.init_params(jax.random.PRNGKey(0), CFG)
    stage_params = pipeline.stack_stage_params(
        params["encoder"]["layers"], mesh.shape["model"])
    rng = np.random.default_rng(0)
    b, t = 8, 20
    feats = jnp.asarray(rng.standard_normal((b, t, CFG.input_dim)),
                        jnp.float32)
    lens = jnp.asarray([t, t, 15, t, 9, t, t, 12], jnp.int32)
    mask = nn.length_mask(lens, t)
    return mesh, params, stage_params, feats, mask


def test_stack_stage_params_shapes(setup):
    _, params, stage_params, _, _ = setup
    w = stage_params["ffn"]["w1"]["w"]
    assert w.shape[:2] == (2, 2)           # [S, L/S]
    np.testing.assert_array_equal(
        np.asarray(w[1, 0]),
        np.asarray(params["encoder"]["layers"][3]["ffn"]["w1"]["w"]))


@pytest.mark.parametrize("n_micro", [2, 4])
def test_pipelined_forward_matches_sequential(setup, n_micro):
    mesh, params, stage_params, feats, mask = setup
    ref = paraformer.encode(params, feats, mask, CFG)
    got = pipeline.encode_pipelined(params, stage_params, feats, mask, CFG,
                                    mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pipelined_gradients_match(setup):
    mesh, params, stage_params, feats, mask = setup

    def loss_pp(sp):
        y = pipeline.encode_pipelined(params, sp, feats, mask, CFG, mesh,
                                      n_micro=2)
        return jnp.sum(y * y)

    def loss_seq(layers_rest):
        p = dict(params)
        p["encoder"] = dict(params["encoder"])
        p["encoder"]["layers"] = [params["encoder"]["layers"][0]] + layers_rest
        y = paraformer.encode(p, feats, mask, CFG)
        return jnp.sum(y * y)

    g_pp = jax.grad(loss_pp)(stage_params)
    g_seq = jax.grad(loss_seq)(params["encoder"]["layers"][1:])
    g_seq_stacked = pipeline.stack_stage_params(
        [params["encoder"]["layers"][0]] + g_seq, mesh.shape["model"])
    flat_pp = jax.tree.leaves(g_pp)
    flat_seq = jax.tree.leaves(g_seq_stacked)
    assert len(flat_pp) == len(flat_seq)
    for a, b in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
