"""CAM++ full-model parity vs a torch re-implementation in speakerlab's
module structure and state-dict naming (3D-Speaker `CAMPPlus`) — locks
models/campplus.py numerics AND runtime/checkpoints.campplus_rules the same
way test_full_layer_parity.py locks Paraformer and
test_tts_convert_parity.py locks HiFi-GAN."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import campplus  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402

torch.manual_seed(0)

CFG = campplus.CampPlusConfig(
    feat_dim=16, fcm_channels=4, init_channels=8, growth_rate=4, bn_size=2,
    block_layers=(2, 3), block_dilations=(1, 2), embedding_size=12,
    cam_seg_len=10)


def _bn(ch):
    bn = torch.nn.BatchNorm1d(ch)
    bn.eval()
    with torch.no_grad():  # non-trivial running stats
        bn.running_mean.uniform_(-0.2, 0.2)
        bn.running_var.uniform_(0.6, 1.4)
        bn.weight.uniform_(0.7, 1.3)
        bn.bias.uniform_(-0.2, 0.2)
    return bn


def _bn2d(ch):
    bn = torch.nn.BatchNorm2d(ch)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.uniform_(-0.2, 0.2)
        bn.running_var.uniform_(0.6, 1.4)
        bn.weight.uniform_(0.7, 1.3)
        bn.bias.uniform_(-0.2, 0.2)
    return bn


class NonLinear(torch.nn.Module):
    """speakerlab get_nonlinear('batchnorm-relu'): bn then relu."""

    def __init__(self, ch, affine=True):
        super().__init__()
        self.batchnorm = _bn(ch)
        if not affine:
            # 'batchnorm_' variant: affine=False
            bn = torch.nn.BatchNorm1d(ch, affine=False)
            bn.eval()
            with torch.no_grad():
                bn.running_mean.uniform_(-0.2, 0.2)
                bn.running_var.uniform_(0.6, 1.4)
            self.batchnorm = bn
        self.affine = affine

    def forward(self, x):
        x = self.batchnorm(x)
        return torch.relu(x) if self.affine else x


class BasicResBlock(torch.nn.Module):
    def __init__(self, ch, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(ch, ch, 3, (stride, 1), 1, bias=False)
        self.bn1 = _bn2d(ch)
        self.conv2 = torch.nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = _bn2d(ch)
        self.shortcut = torch.nn.Sequential()
        if stride != 1:
            self.shortcut = torch.nn.Sequential(
                torch.nn.Conv2d(ch, ch, 1, (stride, 1), bias=False),
                _bn2d(ch))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + self.shortcut(x))


class FCM(torch.nn.Module):
    def __init__(self, ch, feat_dim):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(1, ch, 3, 1, 1, bias=False)
        self.bn1 = _bn2d(ch)
        self.layer1 = torch.nn.Sequential(BasicResBlock(ch, 2),
                                          BasicResBlock(ch, 1))
        self.layer2 = torch.nn.Sequential(BasicResBlock(ch, 2),
                                          BasicResBlock(ch, 1))
        self.conv2 = torch.nn.Conv2d(ch, ch, 3, (2, 1), 1, bias=False)
        self.bn2 = _bn2d(ch)

    def forward(self, x):  # x [B, 1, F, T]
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = torch.relu(self.bn2(self.conv2(out)))
        b, c, f, t = out.shape
        return out.reshape(b, c * f, t)


class CAMLayer(torch.nn.Module):
    def __init__(self, bn_ch, out_ch, k, dilation, seg_len, reduction=2):
        super().__init__()
        self.linear_local = torch.nn.Conv1d(
            bn_ch, out_ch, k, padding=dilation * (k - 1) // 2,
            dilation=dilation, bias=False)
        self.linear1 = torch.nn.Conv1d(bn_ch, bn_ch // reduction, 1)
        self.linear2 = torch.nn.Conv1d(bn_ch // reduction, out_ch, 1)
        self.seg_len = seg_len

    def seg_pooling(self, x):
        seg = torch.nn.functional.avg_pool1d(
            x, self.seg_len, stride=self.seg_len, ceil_mode=True)
        shape = seg.shape
        seg = seg.unsqueeze(-1).expand(*shape, self.seg_len) \
            .reshape(*shape[:-1], -1)
        return seg[..., : x.shape[-1]]

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        m = torch.sigmoid(self.linear2(torch.relu(self.linear1(context))))
        return y * m


class CAMDenseTDNNLayer(torch.nn.Module):
    def __init__(self, in_ch, out_ch, bn_ch, k, dilation, seg_len):
        super().__init__()
        self.nonlinear1 = NonLinear(in_ch)
        self.linear1 = torch.nn.Conv1d(in_ch, bn_ch, 1, bias=False)
        self.nonlinear2 = NonLinear(bn_ch)
        self.cam_layer = CAMLayer(bn_ch, out_ch, k, dilation, seg_len)

    def forward(self, x):
        x = self.linear1(self.nonlinear1(x))
        return self.cam_layer(self.nonlinear2(x))


class TransitLayer(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.nonlinear = NonLinear(in_ch)
        self.linear = torch.nn.Conv1d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.linear = torch.nn.Conv1d(in_ch, out_ch, 1, bias=False)
        self.nonlinear = NonLinear(out_ch, affine=False)

    def forward(self, x):  # x [B, C]
        x = self.linear(x.unsqueeze(-1)).squeeze(-1)
        return self.nonlinear.batchnorm(x.unsqueeze(-1)).squeeze(-1)


class TorchCAMPPlus(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.head = FCM(cfg.fcm_channels, cfg.feat_dim)
        xv = torch.nn.Module()
        tdnn = torch.nn.Module()
        tdnn.linear = torch.nn.Conv1d(cfg.fcm_out_dim, cfg.init_channels,
                                      5, stride=2, padding=2)
        tdnn.nonlinear = NonLinear(cfg.init_channels)
        xv.tdnn = tdnn
        ch = cfg.init_channels
        for b, (n_layers, dil) in enumerate(zip(cfg.block_layers,
                                                cfg.block_dilations), 1):
            blk = torch.nn.Module()
            for i in range(n_layers):
                setattr(blk, f"tdnnd{i + 1}", CAMDenseTDNNLayer(
                    ch, cfg.growth_rate, cfg.bn_size * cfg.growth_rate,
                    cfg.kernel_size, dil, cfg.cam_seg_len))
                ch += cfg.growth_rate
            setattr(xv, f"block{b}", blk)
            if b < len(cfg.block_layers):
                setattr(xv, f"transit{b}", TransitLayer(ch, ch // 2))
                ch //= 2
        xv.out_nonlinear = NonLinear(ch)
        xv.dense = DenseLayer(2 * ch, cfg.embedding_size)
        self.xvector = xv
        self._final_ch = ch

    def forward(self, feats):  # [B, T, F]
        x = feats.transpose(1, 2).unsqueeze(1)   # [B, 1, F, T]
        x = self.head(x)
        x = self.xvector.tdnn.nonlinear(self.xvector.tdnn.linear(x))
        for b, n_layers in enumerate(self.cfg.block_layers, 1):
            blk = getattr(self.xvector, f"block{b}")
            for i in range(n_layers):
                new = getattr(blk, f"tdnnd{i + 1}")(x)
                x = torch.cat([x, new], dim=1)
            if b < len(self.cfg.block_layers):
                x = getattr(self.xvector, f"transit{b}")(x)
        x = self.xvector.out_nonlinear(x)
        mean = x.mean(-1)
        std = x.std(-1, unbiased=True)
        stats = torch.cat([mean, std], dim=-1)
        return self.xvector.dense(stats)


def test_campplus_full_model_parity():
    torch.manual_seed(0)  # order-independent weights
    tmodel = TorchCAMPPlus(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}
    template = campplus.init_params(jax.random.PRNGKey(0), CFG)
    rules = ckpt.campplus_rules(CFG.block_layers)
    params = ckpt.convert_state_dict(sd, rules, template, strict=True)

    rng = np.random.default_rng(0)
    t = 44  # deliberately not a multiple of seg_len or stride
    feats = rng.standard_normal((2, t, CFG.feat_dim)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(feats)).numpy()
    got = np.asarray(campplus.forward(params, jnp.asarray(feats),
                                      lengths=None, cfg=CFG))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_campplus_masked_matches_exact_length():
    """Masked batched forward == per-utterance unpadded forward."""
    torch.manual_seed(0)  # order-independent weights
    tmodel = TorchCAMPPlus(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}
    template = campplus.init_params(jax.random.PRNGKey(0), CFG)
    params = ckpt.convert_state_dict(sd, ckpt.campplus_rules(CFG.block_layers),
                                     template, strict=True)
    rng = np.random.default_rng(1)
    t_full, t_short = 40, 28
    feats = rng.standard_normal((1, t_full, CFG.feat_dim)).astype(np.float32)
    feats[:, t_short:] = 0.0
    got = np.asarray(campplus.forward(
        params, jnp.asarray(feats), jnp.asarray([t_short]), CFG))[0]
    exact = np.asarray(campplus.forward(
        params, jnp.asarray(feats[:, :t_short]), None, CFG))[0]
    # FCM convs see zero-pad beyond t_short (edge effects at the boundary),
    # so equality is approximate but must be close
    cos = float(got @ exact / (np.linalg.norm(got) * np.linalg.norm(exact)))
    assert cos > 0.98, cos
