import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models.paraformer import (  # noqa: E402
    ParaformerConfig,
    cif,
    forward,
    init_params,
    max_tokens_for,
)

TINY = ParaformerConfig(
    input_dim=24, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=2, decoder_layers=2, vocab_size=50,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), TINY)


def naive_cif(h: np.ndarray, alphas: np.ndarray, threshold=1.0):
    """Reference integrate-and-fire: the data-dependent loop the paper
    describes (and FunASR's `cif` implements) — fires when the integrated
    weight crosses threshold, splitting the crossing frame's weight."""
    T, D = h.shape
    integ = 0.0
    frame = np.zeros(D)
    out = []
    for t in range(T):
        a = alphas[t]
        if integ + a < threshold:
            integ += a
            frame += a * h[t]
        else:
            take = threshold - integ
            out.append(frame + take * h[t])
            rem = a - take
            # consecutive fires if one frame carries >1.0 mass (α<1 ⇒ rare)
            while rem >= threshold:
                out.append(threshold * h[t])
                rem -= threshold
            integ = rem
            frame = rem * h[t]
    return np.array(out) if out else np.zeros((0, D))


def test_cif_matches_naive_loop():
    rng = np.random.default_rng(0)
    T, D = 37, 8
    h = rng.standard_normal((T, D)).astype(np.float32)
    alphas = rng.uniform(0.05, 0.6, T).astype(np.float32)
    k_max = 32
    embeds, count, fire, _, _ = cif(jnp.asarray(h[None]), jnp.asarray(alphas[None]),
                              k_max, tail_threshold=0.0)
    want = naive_cif(h, alphas)
    n = int(count[0])
    assert n == len(want) == int(np.floor(alphas.sum()))
    np.testing.assert_allclose(np.asarray(embeds[0, :n]), want, rtol=1e-4, atol=1e-4)
    # fire frames monotonically non-decreasing
    ff = np.asarray(fire[0, :n])
    assert (np.diff(ff) >= 0).all()


def test_cif_tail_fires_partial_token():
    h = jnp.ones((1, 10, 4))
    alphas = jnp.full((1, 10), 0.17)  # total 1.7 → tail 0.45 pushes to 2.15
    _, count, _, _, _ = cif(h, alphas, 8, tail_threshold=0.45)
    assert int(count[0]) == 2


def test_forward_shapes_and_jit(params):
    rng = np.random.default_rng(1)
    B, T = 2, 40
    k_max = max_tokens_for(T)
    feats = rng.standard_normal((B, T, TINY.input_dim)).astype(np.float32)
    lens = np.array([40, 25], np.int32)
    fn = jax.jit(lambda f, l: forward(params, f, l, k_max, TINY))
    out = fn(jnp.asarray(feats), jnp.asarray(lens))
    assert out["logits"].shape == (B, k_max, TINY.vocab_size)
    assert out["tokens"].shape == (B, k_max)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert (np.asarray(out["token_count"]) <= k_max).all()


def test_padding_invariance(params):
    """Recognition of an utterance must not change when batch-padded."""
    rng = np.random.default_rng(2)
    T_valid, T_pad = 30, 48
    x = rng.standard_normal((1, T_valid, TINY.input_dim)).astype(np.float32)
    k_max = max_tokens_for(T_pad)
    xp = np.zeros((1, T_pad, TINY.input_dim), np.float32)
    xp[:, :T_valid] = x
    # garbage in the padding must be ignored
    xp[:, T_valid:] = 99.0
    out_a = forward(params, jnp.asarray(x), jnp.asarray([T_valid]), k_max, TINY)
    out_b = forward(params, jnp.asarray(xp), jnp.asarray([T_valid]), k_max, TINY)
    na, nb = int(out_a["token_count"][0]), int(out_b["token_count"][0])
    assert na == nb
    np.testing.assert_allclose(np.asarray(out_a["logits"][0, :na]),
                               np.asarray(out_b["logits"][0, :nb]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out_a["tokens"][0, :na]),
                                  np.asarray(out_b["tokens"][0, :nb]))


def test_batch_sharding_runs(params):
    """Forward over an 8-device data-parallel mesh executes and matches."""
    from toolbox_for_asr_and_tts_tpu.runtime.mesh import (
        batch_sharding, serving_mesh)
    rng = np.random.default_rng(3)
    B, T = 8, 24
    k_max = max_tokens_for(T)
    feats = rng.standard_normal((B, T, TINY.input_dim)).astype(np.float32)
    lens = np.full((B,), T, np.int32)
    local = forward(params, jnp.asarray(feats), jnp.asarray(lens), k_max, TINY)
    mesh = serving_mesh()
    sh = batch_sharding(mesh)
    fs = jax.device_put(feats, sh)
    ls = jax.device_put(lens, sh)
    sharded = jax.jit(lambda f, l: forward(params, f, l, k_max, TINY))(fs, ls)
    np.testing.assert_allclose(np.asarray(sharded["logits"]),
                               np.asarray(local["logits"]), rtol=1e-3, atol=1e-3)


def test_cif_token_center_timestamps():
    """Token centers are the α-weighted mean frame of each integration
    window: monotonic, inside the window, strictly before the fire frame
    for multi-frame tokens."""
    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.models.paraformer import cif
    rng = np.random.default_rng(0)
    t, d = 20, 4
    h = rng.standard_normal((1, t, d)).astype(np.float32)
    alphas = np.full((1, t), 0.25, np.float32)   # token every 4 frames
    emb, count, fire, center, start = cif(jnp.asarray(h), jnp.asarray(alphas), 8,
                                   tail_threshold=0.0)
    n = int(count[0])
    assert n == 5
    c = np.asarray(center[0, :n])
    f = np.asarray(fire[0, :n])
    assert np.all(np.diff(c) > 0), c        # monotonic
    assert np.all(c <= f + 1e-6), (c, f)    # center ≤ fire frame
    # token k spans frames [4k, 4k+4) → center ≈ middle of the window
    want = np.array([4 * k + 1.5 for k in range(n)])
    np.testing.assert_allclose(c, want, atol=0.6)


def test_predictor_asymmetric_orders_match_torch_padding():
    """FunASR CifPredictorV2 pads ConstantPad1d((l_order, r_order)); a
    checkpoint with l_order != r_order must not be given symmetric padding
    (round-2d review finding: alphas shifted one frame for such configs)."""
    import torch
    from toolbox_for_asr_and_tts_tpu.models import paraformer as pf
    from toolbox_for_asr_and_tts_tpu.ops import nn

    cfg = pf.ParaformerConfig(
        input_dim=20, d_model=16, n_heads=2, ffn_dim=32, encoder_layers=1,
        decoder_layers=1, vocab_size=32, predictor_kernel=3,
        predictor_l_order=2)
    params = pf.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    enc = rng.standard_normal((1, 12, 16)).astype(np.float32)
    mask = np.ones((1, 12), np.float32)
    got = np.asarray(pf.predictor_alphas(params, jnp.asarray(enc),
                                         jnp.asarray(mask), cfg))

    w = np.asarray(params["predictor"]["conv"]["w"])   # (O, I, K)
    b = np.asarray(params["predictor"]["conv"]["b"])
    tconv = torch.nn.Conv1d(16, 16, 3)
    tconv.weight.data = torch.from_numpy(w.copy())
    tconv.bias.data = torch.from_numpy(b.copy())
    x = torch.from_numpy(enc.transpose(0, 2, 1).copy())
    h = tconv(torch.nn.functional.pad(x, (2, 0)))       # (l_order, r_order)
    h = torch.relu(h.transpose(1, 2) + torch.from_numpy(enc))
    ow = torch.from_numpy(np.asarray(params["predictor"]["out"]["w"]))
    ob = torch.from_numpy(np.asarray(params["predictor"]["out"]["b"]))
    want = torch.sigmoid(h @ ow + ob)[..., 0].detach().numpy()  # w: [in,out]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
