"""Sequence-parallel encoding == single-device encoding (survey §5's
long-audio answer: shard the time axis over the mesh, all-gather K/V).

Runs on the 8-virtual-CPU-device mesh the conftest forces.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops import nn  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel import seqparallel  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel.sharding import make_2d_mesh  # noqa: E402

CFG = paraformer.ParaformerConfig(
    input_dim=24, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=3, decoder_layers=1, vocab_size=32)


@pytest.fixture(scope="module")
def setup():
    mesh = make_2d_mesh(8, model_parallel=1)   # 8-way "data" axis → seq axis
    params = paraformer.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    b, t = 2, 64                               # 64 % 8 == 0
    feats = jnp.asarray(rng.standard_normal((b, t, CFG.input_dim)),
                        jnp.float32)
    lens = jnp.asarray([t, 41], jnp.int32)     # one full row, one padded row
    return mesh, params, feats, lens


def test_seq_parallel_encode_matches_offline(setup):
    mesh, params, feats, lens = setup
    t = feats.shape[1]
    mask = nn.length_mask(lens, t)
    ref = paraformer.encode(params, feats, mask, CFG)
    got = seqparallel.encode_seq_parallel(params, feats, mask, CFG, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_seq_parallel_full_forward_matches(setup):
    mesh, params, feats, lens = setup
    k_max = 12
    ref = paraformer.forward(params, feats, lens, k_max, CFG)

    fn = jax.jit(lambda p, f, l: seqparallel.transcribe_long_forward(
        p, f, l, k_max, CFG, mesh))
    got = fn(params, feats, lens)
    np.testing.assert_array_equal(np.asarray(got["token_count"]),
                                  np.asarray(ref["token_count"]))
    np.testing.assert_array_equal(np.asarray(got["tokens"]),
                                  np.asarray(ref["tokens"]))


def test_pad_to_blocks_keeps_padding_inert(setup):
    mesh, params, feats, lens = setup
    t = feats.shape[1]
    mask = nn.length_mask(lens, t)
    # odd length: 64+49=113 → pads to 120 on an 8-axis
    feats_odd = jnp.concatenate(
        [feats, feats[:, :49]], axis=1)
    lens_odd = lens  # valid prefix unchanged
    mask_odd = nn.length_mask(lens_odd, feats_odd.shape[1])
    f_p, m_p = seqparallel.pad_to_blocks(feats_odd, mask_odd, 8)
    assert f_p.shape[1] % 8 == 0
    got = np.asarray(seqparallel.encode_seq_parallel(params, f_p, m_p, CFG,
                                                     mesh))
    ref = np.asarray(paraformer.encode(params, feats, mask, CFG))
    # each row's valid prefix equals the unpadded offline encoding
    for row, n_valid in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[row, :n_valid], ref[row, :n_valid],
                                   atol=2e-4, rtol=2e-4)
