"""charctc-KWS full-model parity vs a torch re-implementation of the
ModelScope/FunASR KWS FSMN (nearfield `fsmn.py` structure + state-dict
names): locks models/kws_ctc.py numerics, the converter name map, AND the
right-context semantics (conv_right skips the current frame — taps
t+1..t+rorder), which the VAD lock (rorder=0) cannot exercise.

Reference behavior: the KWS engine behind
voice-service/app/services/voice_interface.py:404-502 (1600 ms window,
"detected"/"rejected" on the keyword posterior score).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import kws_ctc  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402

CFG = kws_ctc.KwsConfig(
    input_dim=18, input_affine_dim=10, hidden_dim=16, proj_dim=8,
    num_layers=3, lorder=5, rorder=2, output_affine_dim=12, vocab_size=26)


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
    """ModelScope KWS FSMNBlock: depthwise conv_left over left-padded frames
    + depthwise conv_right over future frames (skipping the current one)
    + residual."""

    def __init__(self, dim, lorder, rorder):
        super().__init__()
        self.lorder, self.rorder = lorder, rorder
        self.conv_left = torch.nn.Conv2d(dim, dim, (lorder, 1),
                                         groups=dim, bias=False)
        if rorder > 0:
            self.conv_right = torch.nn.Conv2d(dim, dim, (rorder, 1),
                                              groups=dim, bias=False)

    def forward(self, x):
        x_per = x.permute(0, 2, 1).unsqueeze(3)         # [B, D, T, 1]
        y = torch.nn.functional.pad(x_per, [0, 0, self.lorder - 1, 0])
        out = x_per + self.conv_left(y)
        if self.rorder > 0:
            y_r = torch.nn.functional.pad(x_per, [0, 0, 0, self.rorder])
            out = out + self.conv_right(y_r[:, :, 1:, :])
        return out.squeeze(3).permute(0, 2, 1)


class FsmnUnit(torch.nn.Module):
    def __init__(self, linear_dim, proj_dim, lorder, rorder):
        super().__init__()
        self.add_module("0", LinearTransform(linear_dim, proj_dim))
        self.add_module("1", FSMNBlock(proj_dim, lorder, rorder))
        self.add_module("2", AffineTransform(proj_dim, linear_dim))

    def forward(self, x):
        h = getattr(self, "1")(getattr(self, "0")(x))
        return torch.relu(getattr(self, "2")(h))


class TorchKwsFSMN(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        enc = torch.nn.Module()
        enc.in_linear1 = AffineTransform(cfg.input_dim, cfg.input_affine_dim)
        enc.in_linear2 = AffineTransform(cfg.input_affine_dim, cfg.hidden_dim)
        enc.fsmn = torch.nn.ModuleList([
            FsmnUnit(cfg.hidden_dim, cfg.proj_dim, cfg.lorder, cfg.rorder)
            for _ in range(cfg.num_layers)])
        enc.out_linear1 = AffineTransform(cfg.hidden_dim,
                                          cfg.output_affine_dim)
        enc.out_linear2 = AffineTransform(cfg.output_affine_dim,
                                          cfg.vocab_size)
        self.encoder = enc

    def forward(self, x):
        e = self.encoder
        x = torch.relu(e.in_linear2(e.in_linear1(x)))
        for unit in e.fsmn:
            x = unit(x)
        logits = e.out_linear2(e.out_linear1(x))
        return torch.log_softmax(logits, dim=-1)


def _converted(cfg):
    torch.manual_seed(0)  # order-independent weights
    tmodel = TorchKwsFSMN(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    template = kws_ctc.init_params(jax.random.PRNGKey(0), cfg)
    rules = ckpt.kws_rules(cfg.num_layers, cfg.rorder)
    params = ckpt.convert_state_dict(sd, rules, template, strict=True)
    return tmodel, params


def test_kws_full_model_parity():
    tmodel, params = _converted(CFG)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 40, CFG.input_dim)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(feats)).numpy()
    got = np.asarray(kws_ctc.forward(params, jnp.asarray(feats), CFG))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kws_parity_without_right_context():
    cfg = kws_ctc.KwsConfig(
        input_dim=12, input_affine_dim=8, hidden_dim=10, proj_dim=6,
        num_layers=2, lorder=4, rorder=0, output_affine_dim=8, vocab_size=17)
    tmodel, params = _converted(cfg)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 25, cfg.input_dim)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(feats)).numpy()
    got = np.asarray(kws_ctc.forward(params, jnp.asarray(feats), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kws_score_on_converted_weights():
    """The detection score path runs end-to-end on converter-shaped params
    (keyword CTC score vs blank path), not just raw random pytrees."""
    _, params = _converted(CFG)
    spotter = kws_ctc.KeywordSpotter(
        params, CFG, {"小": 1, "护": 2}, keyword="小护", threshold=-1e9)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((30, CFG.input_dim)).astype(np.float32)
    detected, score = spotter.detect_feats(feats, 30)
    assert np.isfinite(score) and detected
