"""Op-level parity vs torch: locks the weight-layout assumptions the
checkpoint converter relies on (torch Linear [out,in] → ours [in,out];
Conv1d (O, I/g, K) shared layout; ConvTranspose1d (I, O, K); LayerNorm).
These are the exact contracts `runtime/checkpoints.py` name-maps assume."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.ops import nn  # noqa: E402

RNG = np.random.default_rng(0)


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    x = RNG.standard_normal((2, 5, 8)).astype(np.float32)
    tl = torch.nn.Linear(8, 6)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    p = {"w": jnp.asarray(tl.weight.detach().numpy().T),
         "b": jnp.asarray(tl.bias.detach().numpy())}
    got = _np(nn.linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("groups,dilation,pad", [(1, 1, (1, 1)), (8, 1, (2, 0)),
                                                 (1, 2, (2, 2))])
def test_conv1d_matches_torch(groups, dilation, pad):
    cin, cout, k, t = 8, 8, 3, 20
    x = RNG.standard_normal((2, t, cin)).astype(np.float32)
    tc = torch.nn.Conv1d(cin, cout, k, groups=groups, dilation=dilation)
    with torch.no_grad():
        xt = torch.nn.functional.pad(torch.from_numpy(x).transpose(1, 2), pad)
        want = tc(xt).transpose(1, 2).numpy()
    p = {"w": jnp.asarray(tc.weight.detach().numpy()),
         "b": jnp.asarray(tc.bias.detach().numpy())}
    got = _np(nn.conv1d(p, jnp.asarray(x), padding=pad, groups=groups,
                        dilation=dilation))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,k,padding", [(5, 11, 3), (2, 4, 1), (4, 8, 2)])
def test_conv_transpose1d_matches_torch(stride, k, padding):
    cin, cout, t = 6, 4, 10
    x = RNG.standard_normal((2, t, cin)).astype(np.float32)
    tc = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=padding)
    with torch.no_grad():
        want = tc(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    p = {"w": jnp.asarray(tc.weight.detach().numpy()),
         "b": jnp.asarray(tc.bias.detach().numpy())}
    got = _np(nn.conv_transpose1d(p, jnp.asarray(x), stride=stride,
                                  padding=padding))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_layernorm_matches_torch():
    x = RNG.standard_normal((3, 7, 16)).astype(np.float32)
    tl = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tl.weight.mul_(1.3)
        tl.bias.add_(0.2)
        want = tl(torch.from_numpy(x)).numpy()
    p = {"g": jnp.asarray(tl.weight.detach().numpy()),
         "b": jnp.asarray(tl.bias.detach().numpy())}
    got = _np(nn.layernorm(p, jnp.asarray(x), eps=tl.eps))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_embedding_matches_torch():
    emb = torch.nn.Embedding(10, 4)
    ids = np.array([[1, 2], [9, 0]])
    with torch.no_grad():
        want = emb(torch.from_numpy(ids)).numpy()
    p = {"table": jnp.asarray(emb.weight.detach().numpy())}
    got = _np(nn.embedding(p, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fsmn_conv_matches_torch_depthwise():
    """The SAN-M fsmn_block == torch depthwise Conv1d with (l, r) padding +
    residual — the exact op FunASR's `fsmn_block` weight maps onto."""
    d, k, t = 8, 11, 30
    x = RNG.standard_normal((1, t, d)).astype(np.float32)
    tc = torch.nn.Conv1d(d, d, k, groups=d, bias=False)
    l, r = nn.sanm_pad(k)
    with torch.no_grad():
        xt = torch.nn.functional.pad(torch.from_numpy(x).transpose(1, 2), (l, r))
        want = (tc(xt).transpose(1, 2) + torch.from_numpy(x)).numpy()
    p = {"w": jnp.asarray(tc.weight.detach().numpy())}
    got = _np(nn.fsmn_block(p, jnp.asarray(x), (l, r)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_matches_torch():
    from toolbox_for_asr_and_tts_tpu.models.campplus import _conv2d
    x = RNG.standard_normal((2, 16, 10, 3)).astype(np.float32)  # B,F,T,C
    tc = torch.nn.Conv2d(3, 5, 3, stride=(2, 1), padding=1, bias=False)
    with torch.no_grad():
        want = tc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    p = {"w": jnp.asarray(tc.weight.detach().numpy()), "stride": None}
    got = _np(_conv2d(p, jnp.asarray(x), (2, 1), padding=1))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)
