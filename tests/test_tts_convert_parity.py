"""TTS checkpoint-conversion fidelity: HiFi-GAN full-generator parity vs a
torch re-implementation (standard V1 architecture, weight-normed like real
checkpoints), and Sambert PNCA name-map round-trips (VERDICT round-1 #3)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import hifigan, sambert  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402

torch.manual_seed(0)

TINY_HIFI = hifigan.HifiGanConfig(
    n_mels=8, upsample_initial_channel=16,
    upsample_rates=(2, 2), upsample_kernels=(4, 4),
    resblock_kernels=(3, 5), resblock_dilations=((1, 2), (1, 2)))


class TorchResBlock1(torch.nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = torch.nn.ModuleList([
            weight_norm(torch.nn.Conv1d(ch, ch, k, dilation=d,
                                        padding=d * (k - 1) // 2))
            for d in dilations])
        self.convs2 = torch.nn.ModuleList([
            weight_norm(torch.nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
            for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = torch.nn.functional.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = torch.nn.functional.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = x + xt
        return x


class TorchHiFiGAN(torch.nn.Module):
    """Standard HiFi-GAN V1 generator with torch-style state-dict names."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.conv_pre = weight_norm(torch.nn.Conv1d(
            cfg.n_mels, cfg.upsample_initial_channel, 7, padding=3))
        self.ups = torch.nn.ModuleList()
        self.resblocks = torch.nn.ModuleList()
        ch = cfg.upsample_initial_channel
        for r, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
            self.ups.append(weight_norm(torch.nn.ConvTranspose1d(
                ch, ch // 2, k, r, padding=(k - r) // 2)))
            ch //= 2
            for rk, rd in zip(cfg.resblock_kernels, cfg.resblock_dilations):
                self.resblocks.append(TorchResBlock1(ch, rk, rd))
        self.conv_post = weight_norm(torch.nn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, mel):  # mel [B, T, n_mels]
        x = self.conv_pre(mel.transpose(1, 2))
        nk = len(self.cfg.resblock_kernels)
        for i, up in enumerate(self.ups):
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = up(x)
            xs = None
            for j in range(nk):
                y = self.resblocks[i * nk + j](x)
                xs = y if xs is None else xs + y
            x = xs / nk
        x = torch.nn.functional.leaky_relu(x, 0.1)
        return torch.tanh(self.conv_post(x))[:, 0]


def test_hifigan_full_generator_parity():
    """Weight-normed torch V1 generator → fold → convert → JAX forward must
    match the torch waveform sample-for-sample."""
    torch.manual_seed(0)  # order-independent weights
    tmodel = TorchHiFiGAN(TINY_HIFI).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # torch stores weight_norm as parametrizations or weight_g/weight_v
    sd = {k.replace("parametrizations.weight.original0", "weight_g")
           .replace("parametrizations.weight.original1", "weight_v"): v
          for k, v in sd.items()}
    sd = ckpt.fold_weight_norm(sd)
    template = hifigan.init_params(jax.random.PRNGKey(0), TINY_HIFI)
    rules = ckpt.hifigan_rules(len(TINY_HIFI.upsample_rates),
                               len(TINY_HIFI.resblock_kernels),
                               len(TINY_HIFI.resblock_dilations[0]))
    params = ckpt.convert_state_dict(sd, rules, template, strict=True)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 12, TINY_HIFI.n_mels)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel)).numpy()
    got = np.asarray(hifigan.forward(params, jnp.asarray(mel), TINY_HIFI))
    assert got.shape == want.shape == (2, 12 * TINY_HIFI.hop_length)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fold_weight_norm_matches_torch():
    conv = weight_norm(torch.nn.Conv1d(4, 6, 3))
    with torch.no_grad():
        want = conv.weight.detach().numpy()
    sd = {k.replace("parametrizations.weight.original0", "weight_g")
           .replace("parametrizations.weight.original1", "weight_v"): v
          .detach().numpy() for k, v in conv.state_dict().items()}
    folded = ckpt.fold_weight_norm(sd)
    np.testing.assert_allclose(folded["weight"], want, rtol=1e-6, atol=1e-7)
    assert "weight_g" not in folded and "weight_v" not in folded


TINY_SAM = sambert.SambertConfig(
    vocab_size=32, n_speakers=2, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=2, decoder_layers=2, pnca_layers=2, postnet_layers=3,
    var_channels=16)


def test_sambert_pnca_roundtrip():
    """invert → torch-save-style dict → convert: every PNCA-mapped tensor
    round-trips; the NAR fast-mode decoder keeps its template values."""
    params = sambert.init_params(jax.random.PRNGKey(0), TINY_SAM)
    rules = ckpt.sambert_rules(TINY_SAM.encoder_layers, TINY_SAM.pnca_layers,
                               TINY_SAM.postnet_layers)
    sd = ckpt.invert_to_state_dict(params, rules)
    template = sambert.init_params(jax.random.PRNGKey(1), TINY_SAM)
    out = ckpt.convert_state_dict(sd, rules, template, strict=True,
                                  keep_missing=True)
    flat_in = ckpt.flatten_params(params)
    flat_tpl = ckpt.flatten_params(template)
    mapped = {p for p, _ in rules}
    for k, v in ckpt.flatten_params(out).items():
        src = flat_in if k in mapped else flat_tpl
        np.testing.assert_allclose(np.asarray(src[k]), v, rtol=1e-6,
                                   err_msg=k)
    # the framework-only NAR decoder is exactly the unmapped set
    unmapped = {k for k in flat_tpl if k not in mapped}
    assert all(k.startswith(("decoder.", "mel_out.")) for k in unmapped), \
        sorted(unmapped)[:5]


def test_sambert_postnet_bn_fold_matches_torch():
    """Real KAN-TTS postnet is Conv1d+BatchNorm1d; fold_batch_norm turns a
    state dict WITH running stats into the channel affine our postnet
    applies — folded conversion must reproduce torch's eval-mode BN."""
    c = 6
    bn = torch.nn.BatchNorm1d(c)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)
    bn.running_mean.data.uniform_(-1, 1)
    bn.running_var.data.uniform_(0.5, 2.0)
    bn.eval()
    sd = {f"mel_postnet.conv_stack.0.norm.{k}": v.detach().numpy()
          for k, v in bn.state_dict().items()}
    folded = ckpt.fold_batch_norm(sd)
    assert set(folded) == {"mel_postnet.conv_stack.0.norm.weight",
                           "mel_postnet.conv_stack.0.norm.bias"}
    x = torch.randn(2, c, 10)
    want = bn(x).detach().numpy()
    g = folded["mel_postnet.conv_stack.0.norm.weight"]
    b = folded["mel_postnet.conv_stack.0.norm.bias"]
    got = x.numpy() * g[None, :, None] + b[None, :, None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sambert_convert_with_bn_stats_roundtrip():
    """A synthetic checkpoint carrying BN running stats converts cleanly
    (stats folded + dropped, zero unmapped) through the sambert family."""
    params = sambert.init_params(jax.random.PRNGKey(0), TINY_SAM)
    rules = ckpt.sambert_rules(TINY_SAM.encoder_layers, TINY_SAM.pnca_layers,
                               TINY_SAM.postnet_layers)
    sd = ckpt.invert_to_state_dict(params, rules)
    rng = np.random.default_rng(0)
    for i in range(TINY_SAM.postnet_layers):
        base = f"mel_postnet.conv_stack.{i}.norm."
        cdim = sd[base + "weight"].shape[0]
        sd[base + "running_mean"] = rng.standard_normal(cdim).astype(
            np.float32)
        sd[base + "running_var"] = (0.5 + rng.random(cdim)).astype(np.float32)
        sd[base + "num_batches_tracked"] = np.int64(1000)
    folded = ckpt.fold_batch_norm(sd)
    out = ckpt.convert_state_dict(folded, rules,
                                  sambert.init_params(jax.random.PRNGKey(1),
                                                      TINY_SAM),
                                  strict=True, keep_missing=True)
    g0 = np.asarray(out["postnet"][0]["norm"]["g"])
    want = sd["mel_postnet.conv_stack.0.norm.weight"] / np.sqrt(
        sd["mel_postnet.conv_stack.0.norm.running_var"] + 1e-5)
    np.testing.assert_allclose(g0, want, rtol=1e-6)


def test_sambert_ar_shapes_and_masking():
    params = sambert.init_params(jax.random.PRNGKey(0), TINY_SAM)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 32, (2, 6)),
                      jnp.int32)
    lens = jnp.asarray([6, 4], jnp.int32)
    spk = jnp.zeros((2,), jnp.int32)
    out = sambert.forward_ar(params, ids, lens, spk, TINY_SAM)
    r = TINY_SAM.outputs_per_step
    assert out["mel"].shape[1] % r == 0
    assert bool(jnp.isfinite(out["mel"]).all())
    ml = int(out["mel_lens"][1])
    np.testing.assert_array_equal(np.asarray(out["mel"])[1, ml:], 0.0)


def test_pnca_scan_causality_and_band():
    """PNCA decoder semantics on a FIXED memory: perturbing memory at steps
    beyond the h_band of step t must not change step t's output (X attention
    is causal; H attention is banded around the aligned position)."""
    cfg = sambert.SambertConfig(
        vocab_size=32, n_speakers=2, d_model=16, n_heads=2, ffn_dim=32,
        encoder_layers=1, decoder_layers=1, pnca_layers=2, postnet_layers=2,
        h_band=2)
    params = sambert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    b, s, r, d = 1, 12, cfg.outputs_per_step, cfg.d_model
    mem = rng.standard_normal((b, s, r, d)).astype(np.float32) * 0.3
    mask = jnp.ones((b, s * r))
    out_a = np.asarray(sambert._pnca_scan(params["pnca"], jnp.asarray(mem),
                                          mask, cfg))
    mem_b = mem.copy()
    mem_b[:, -1] += 1.0  # perturb the LAST step's memory frames
    out_b = np.asarray(sambert._pnca_scan(params["pnca"], jnp.asarray(mem_b),
                                          mask, cfg))
    # steps t with t + h_band < s-1 cannot see the perturbed step
    safe_steps = s - 1 - cfg.h_band
    assert safe_steps > 0
    np.testing.assert_allclose(out_a[:, : safe_steps * r],
                               out_b[:, : safe_steps * r], atol=1e-6)
    # ...and at least one later step DOES change (the band is effective)
    assert np.abs(out_a[:, safe_steps * r:] - out_b[:, safe_steps * r:]).max() > 1e-6


# --------------------------------------------- full-model torch parity lock
def test_sambert_full_model_torch_parity():
    """The HiFi-GAN-equivalent lock for Sambert (VERDICT round-2 #1): a
    torch KanTtsSAMBERT carrying the real kantts state-dict names
    (tests/ref_kantts_sambert.py) is converted through sambert_rules —
    BN postnet folded — and the JAX forward_ar must reproduce its mel
    output bit-closely, teacher-forced durations. Also proves the rule set
    covers the WHOLE checkpoint tree (zero unmapped torch tensors)."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from ref_kantts_sambert import RefKanTtsSambert

    import dataclasses
    cfg = dataclasses.replace(
        TINY_SAM, pnca_layers=2, postnet_layers=3, outputs_per_step=3,
        prenet_units=12, n_mels=8, h_band=2, x_band=-1,
        tone_size=6, sylfl_size=4, wseg_size=5, n_emotions=3)
    torch.manual_seed(7)
    ref = RefKanTtsSambert(cfg).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    rules = ckpt.sambert_rules(cfg.encoder_layers, cfg.pnca_layers,
                               cfg.postnet_layers)
    folded = ckpt.fold_batch_norm(sd)
    # the rule set consumes the ENTIRE torch tree — nothing unmapped
    consumed = {ckpt._parse(spec)[0] for _, spec in rules}
    leftover = {k for k in folded if k not in consumed
                and not k.endswith("num_batches_tracked")}
    assert not leftover, sorted(leftover)[:8]

    template = sambert.init_params(jax.random.PRNGKey(3), cfg)
    params = ckpt.convert_state_dict(folded, rules, template, strict=True,
                                     keep_missing=True)

    rng = np.random.default_rng(5)
    b, l = 2, 7
    ling = np.stack([
        rng.integers(1, cfg.vocab_size, (b, l)),
        rng.integers(0, cfg.tone_size, (b, l)),
        rng.integers(0, cfg.sylfl_size, (b, l)),
        rng.integers(0, cfg.wseg_size, (b, l)),
    ], axis=-1).astype(np.int64)
    lens = np.array([7, 5], np.int64)
    spk = np.array([1, 0], np.int64)
    emo = np.array([2, 1], np.int64)
    dur = rng.integers(1, 4, (b, l)).astype(np.int64)
    t_mel = 18  # multiple of outputs_per_step, > max total duration

    with torch.no_grad():
        tout = ref(torch.from_numpy(ling), torch.from_numpy(lens),
                   torch.from_numpy(spk), torch.from_numpy(emo),
                   torch.from_numpy(dur), t_mel)
    jout = sambert.forward_ar(
        params, jnp.asarray(ling, jnp.int32), jnp.asarray(lens, jnp.int32),
        jnp.asarray(spk, jnp.int32), cfg,
        duration_override=jnp.asarray(dur, jnp.int32), t_mel=t_mel,
        emotion_ids=jnp.asarray(emo, jnp.int32))

    np.testing.assert_allclose(np.asarray(jout["mel"]),
                               tout["mel"].numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(jout["mel_lens"]),
                                  tout["mel_lens"].numpy())


def test_sambert_full_model_parity_sensitivity():
    """The lock actually bites: perturbing ONE converted tensor (a PNCA
    memory projection) must break mel parity."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from ref_kantts_sambert import RefKanTtsSambert

    import dataclasses
    cfg = dataclasses.replace(
        TINY_SAM, pnca_layers=1, postnet_layers=2, outputs_per_step=2,
        prenet_units=12, n_mels=8, h_band=2, tone_size=6, sylfl_size=4,
        wseg_size=5, n_emotions=3)
    torch.manual_seed(11)
    ref = RefKanTtsSambert(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd["mel_decoder.layer_stack.0.pnca_attn.w_vs_h.weight"] = (
        sd["mel_decoder.layer_stack.0.pnca_attn.w_vs_h.weight"] + 0.05)
    rules = ckpt.sambert_rules(cfg.encoder_layers, cfg.pnca_layers,
                               cfg.postnet_layers)
    params = ckpt.convert_state_dict(
        ckpt.fold_batch_norm(sd), rules,
        sambert.init_params(jax.random.PRNGKey(3), cfg), strict=True,
        keep_missing=True)
    rng = np.random.default_rng(2)
    b, l = 1, 5
    ling = np.stack([rng.integers(1, cfg.vocab_size, (b, l)),
                     np.zeros((b, l)), np.zeros((b, l)),
                     np.zeros((b, l))], -1).astype(np.int64)
    lens = np.array([5], np.int64)
    dur = np.full((b, l), 2, np.int64)
    with torch.no_grad():
        tout = ref(torch.from_numpy(ling), torch.from_numpy(lens),
                   torch.zeros(1, dtype=torch.long),
                   torch.zeros(1, dtype=torch.long),
                   torch.from_numpy(dur), 10)
    jout = sambert.forward_ar(
        params, jnp.asarray(ling, jnp.int32), jnp.asarray(lens, jnp.int32),
        jnp.zeros((1,), jnp.int32), cfg,
        duration_override=jnp.asarray(dur, jnp.int32), t_mel=10)
    assert not np.allclose(np.asarray(jout["mel"]), tout["mel"].numpy(),
                           atol=2e-4)
