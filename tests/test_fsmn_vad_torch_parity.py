"""FSMN-VAD full-model parity vs a torch re-implementation of FunASR's FSMN
encoder (funasr fsmn_vad_streaming structure + state-dict names): locks
models/fsmn_vad.py numerics, the converter name map, AND the conv_left
kernel orientation (round 2 found the round-1 `squeeze_flip` transform
reversed time: torch Conv2d([lorder,1]) with left zero-pad is exactly our
causal depthwise conv1d with the kernel order UNCHANGED — both are
cross-correlations with index 0 on the oldest frame)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import fsmn_vad  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402

torch.manual_seed(0)

CFG = fsmn_vad.FsmnVadConfig(
    input_dim=20, input_affine_dim=12, linear_dim=16, proj_dim=8,
    fsmn_layers=3, lorder=5, output_affine_dim=12, output_dim=10)


class AffineTransform(torch.nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.linear = torch.nn.Linear(i, o)

    def forward(self, x):
        return self.linear(x)


class LinearTransform(torch.nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.linear = torch.nn.Linear(i, o, bias=False)

    def forward(self, x):
        return self.linear(x)


class FSMNBlock(torch.nn.Module):
    """FunASR VAD FSMNBlock: depthwise Conv2d [lorder, 1] over left-padded
    (or cache-prepended) frames + residual."""

    def __init__(self, dim, lorder):
        super().__init__()
        self.lorder = lorder
        self.conv_left = torch.nn.Conv2d(dim, dim, (lorder, 1),
                                         groups=dim, bias=False)

    def forward(self, x, cache=None):
        x_per = x.permute(0, 2, 1).unsqueeze(3)     # [B, D, T, 1]
        if cache is None:
            y = torch.nn.functional.pad(x_per, [0, 0, self.lorder - 1, 0])
        else:
            y = torch.cat((cache, x_per), dim=2)
            cache = y[:, :, -(self.lorder - 1):, :]
        y = self.conv_left(y)
        out = (x_per + y).squeeze(3).permute(0, 2, 1)
        return out, cache


class FsmnUnit(torch.nn.Module):
    def __init__(self, linear_dim, proj_dim, lorder):
        super().__init__()
        # names 0/1/2 like funasr's nn.Sequential repeats
        self.add_module("0", LinearTransform(linear_dim, proj_dim))
        self.add_module("1", FSMNBlock(proj_dim, lorder))
        self.add_module("2", AffineTransform(proj_dim, linear_dim))

    def forward(self, x, cache=None):
        h = getattr(self, "0")(x)
        h, cache = getattr(self, "1")(h, cache)
        return torch.relu(getattr(self, "2")(h)), cache


class TorchFSMN(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        enc = torch.nn.Module()
        enc.in_linear1 = AffineTransform(cfg.input_dim, cfg.input_affine_dim)
        enc.in_linear2 = AffineTransform(cfg.input_affine_dim, cfg.linear_dim)
        enc.fsmn = torch.nn.ModuleList([
            FsmnUnit(cfg.linear_dim, cfg.proj_dim, cfg.lorder)
            for _ in range(cfg.fsmn_layers)])
        enc.out_linear1 = AffineTransform(cfg.linear_dim,
                                          cfg.output_affine_dim)
        enc.out_linear2 = AffineTransform(cfg.output_affine_dim,
                                          cfg.output_dim)
        self.encoder = enc

    def forward(self, x, caches=None):
        e = self.encoder
        x = torch.relu(e.in_linear2(e.in_linear1(x)))
        new_caches = []
        for i, unit in enumerate(e.fsmn):
            c = caches[i] if caches is not None else None
            x, c = unit(x, c)
            new_caches.append(c)
        x = e.out_linear2(e.out_linear1(x))
        return torch.softmax(x, dim=-1), new_caches


def _converted():
    torch.manual_seed(0)  # order-independent weights
    tmodel = TorchFSMN(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    template = fsmn_vad.init_params(jax.random.PRNGKey(0), CFG)
    rules = ckpt.fsmn_vad_rules(CFG.fsmn_layers)
    params = ckpt.convert_state_dict(sd, rules, template, strict=True)
    return tmodel, params


def test_fsmn_vad_full_model_parity():
    tmodel, params = _converted()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 30, CFG.input_dim)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(feats))
    got = np.asarray(fsmn_vad.apply(params, jnp.asarray(feats), CFG))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-6)


def test_fsmn_vad_streaming_cache_parity():
    """Chunked inference with caches matches torch's cache semantics AND the
    one-shot offline pass."""
    tmodel, params = _converted()
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 24, CFG.input_dim)).astype(np.float32)
    with torch.no_grad():
        want_full, _ = tmodel(torch.from_numpy(feats))

    cache = fsmn_vad.init_cache(1, CFG)
    tcaches = [torch.zeros(1, CFG.proj_dim, CFG.lorder - 1, 1)
               for _ in range(CFG.fsmn_layers)]
    outs = []
    for s in range(0, 24, 6):
        chunk = feats[:, s:s+6]
        got, cache = fsmn_vad.apply_streaming(params, jnp.asarray(chunk),
                                              cache, CFG)
        with torch.no_grad():
            want, tcaches = tmodel(torch.from_numpy(chunk), tcaches)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-6, err_msg=f"chunk {s}")
        outs.append(np.asarray(got))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               want_full.numpy(), rtol=1e-4, atol=1e-6)
