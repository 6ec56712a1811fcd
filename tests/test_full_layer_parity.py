"""Full-layer + full-model numerical parity vs a torch re-implementation of
FunASR's Paraformer building blocks (VERDICT round-1 item #2).

test_torch_op_parity.py locks primitive-op layouts; this file locks the
COMPOSITE math and every converter name-map rule: the torch modules below
reproduce FunASR's `EncoderLayerSANM`, `MultiHeadedAttentionSANM`,
`DecoderLayerSANM`, `PositionwiseFeedForwardDecoderSANM`,
`MultiHeadedAttentionSANMDecoder`, `MultiHeadedAttentionCrossAtt` and
`CifPredictorV2` (funasr/models/sanm/{encoder,decoder,attention}.py,
funasr/models/paraformer/cif_predictor.py — re-implemented from the
architecture, not copied) with state-dict names matching the real
checkpoints, so `convert_state_dict(torch_model.state_dict(), paraformer_rules
(...))` is exercised end-to-end and the JAX model must match the torch output
through the full encoder → CIF → decoder stack.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops import nn  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402

torch.manual_seed(0)


class LayerNorm(torch.nn.LayerNorm):
    """ESPnet/FunASR LayerNorm: eps=1e-12 (not torch's 1e-5)."""

    def __init__(self, n):
        super().__init__(n, eps=1e-12)


class SANMAttention(torch.nn.Module):
    """MultiHeadedAttentionSANM: fused qkv + depthwise FSMN memory on V."""

    def __init__(self, n_head, in_feat, n_feat, kernel_size, sanm_shift=0):
        super().__init__()
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_out = torch.nn.Linear(n_feat, n_feat)
        self.linear_q_k_v = torch.nn.Linear(in_feat, n_feat * 3)
        self.fsmn_block = torch.nn.Conv1d(n_feat, n_feat, kernel_size,
                                          groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2 + sanm_shift
        self.pad_fn = torch.nn.ConstantPad1d((left, kernel_size - 1 - left), 0.0)

    def forward_fsmn(self, inputs, mask):
        m = mask[:, :, None]
        inputs = inputs * m
        x = self.pad_fn(inputs.transpose(1, 2))
        x = self.fsmn_block(x).transpose(1, 2)
        return (x + inputs) * m

    def forward(self, x, mask):
        b, t, _ = x.shape
        qkv = self.linear_q_k_v(x)
        q, k, v = torch.split(qkv, self.h * self.d_k, dim=-1)
        fsmn = self.forward_fsmn(v, mask)
        q_h = q.reshape(b, t, self.h, self.d_k).transpose(1, 2) * self.d_k ** -0.5
        k_h = k.reshape(b, t, self.h, self.d_k).transpose(1, 2)
        v_h = v.reshape(b, t, self.h, self.d_k).transpose(1, 2)
        scores = q_h @ k_h.transpose(-2, -1)
        invalid = mask[:, None, None, :] == 0
        scores = scores.masked_fill(invalid, torch.finfo(scores.dtype).min)
        att = torch.softmax(scores, dim=-1).masked_fill(invalid, 0.0)
        out = (att @ v_h).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(out) + fsmn


class EncFFN(torch.nn.Module):
    """PositionwiseFeedForward (encoder): both linears biased, relu."""

    def __init__(self, d, h):
        super().__init__()
        self.w_1 = torch.nn.Linear(d, h)
        self.w_2 = torch.nn.Linear(h, d)

    def forward(self, x):
        return self.w_2(torch.relu(self.w_1(x)))


class DecFFN(torch.nn.Module):
    """PositionwiseFeedForwardDecoderSANM: inner LayerNorm, w_2 bias=False."""

    def __init__(self, d, h):
        super().__init__()
        self.w_1 = torch.nn.Linear(d, h)
        self.w_2 = torch.nn.Linear(h, d, bias=False)
        self.norm = LayerNorm(h)

    def forward(self, x):
        return self.w_2(self.norm(torch.relu(self.w_1(x))))


class EncoderLayerSANM(torch.nn.Module):
    def __init__(self, in_size, size, n_head, ffn_dim, kernel_size):
        super().__init__()
        self.in_size, self.size = in_size, size
        self.self_attn = SANMAttention(n_head, in_size, size, kernel_size)
        self.feed_forward = EncFFN(size, ffn_dim)
        self.norm1 = LayerNorm(in_size)
        self.norm2 = LayerNorm(size)

    def forward(self, x, mask):
        residual = x
        x = self.self_attn(self.norm1(x), mask)
        if self.in_size == self.size:
            x = residual + x
        residual = x
        return residual + self.feed_forward(self.norm2(x))


class FsmnDecoder(torch.nn.Module):
    """MultiHeadedAttentionSANMDecoder: depthwise conv memory, residual inside."""

    def __init__(self, n_feat, kernel_size, sanm_shift=0):
        super().__init__()
        self.fsmn_block = torch.nn.Conv1d(n_feat, n_feat, kernel_size,
                                          groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2 + sanm_shift
        self.pad_fn = torch.nn.ConstantPad1d((left, kernel_size - 1 - left), 0.0)

    def forward(self, inputs, mask):
        m = mask[:, :, None]
        inputs = inputs * m
        x = self.pad_fn(inputs.transpose(1, 2))
        x = self.fsmn_block(x).transpose(1, 2)
        return (x + inputs) * m


class CrossAtt(torch.nn.Module):
    """MultiHeadedAttentionCrossAtt: q from decoder, fused kv from memory."""

    def __init__(self, n_head, n_feat):
        super().__init__()
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_q = torch.nn.Linear(n_feat, n_feat)
        self.linear_k_v = torch.nn.Linear(n_feat, n_feat * 2)
        self.linear_out = torch.nn.Linear(n_feat, n_feat)

    def forward(self, x, memory, memory_mask):
        b, tq, _ = x.shape
        tk = memory.shape[1]
        q = self.linear_q(x).reshape(b, tq, self.h, self.d_k).transpose(1, 2)
        k, v = torch.split(self.linear_k_v(memory), self.h * self.d_k, dim=-1)
        k = k.reshape(b, tk, self.h, self.d_k).transpose(1, 2)
        v = v.reshape(b, tk, self.h, self.d_k).transpose(1, 2)
        scores = (q * self.d_k ** -0.5) @ k.transpose(-2, -1)
        invalid = memory_mask[:, None, None, :] == 0
        scores = scores.masked_fill(invalid, torch.finfo(scores.dtype).min)
        att = torch.softmax(scores, dim=-1).masked_fill(invalid, 0.0)
        return self.linear_out((att @ v).transpose(1, 2).reshape(b, tq, -1))


class DecoderLayerSANM(torch.nn.Module):
    def __init__(self, d, n_head, ffn_dim, kernel_size,
                 with_self=True, with_src=True):
        super().__init__()
        self.feed_forward = DecFFN(d, ffn_dim)
        self.norm1 = LayerNorm(d)
        self.self_attn = FsmnDecoder(d, kernel_size) if with_self else None
        self.src_attn = CrossAtt(n_head, d) if with_src else None
        if with_self:
            self.norm2 = LayerNorm(d)
        if with_src:
            self.norm3 = LayerNorm(d)

    def forward(self, tgt, tgt_mask, memory, memory_mask):
        residual = tgt
        tgt = self.feed_forward(self.norm1(tgt))
        x = tgt
        if self.self_attn is not None:
            x = residual + self.self_attn(self.norm2(tgt), tgt_mask)
        if self.src_attn is not None:
            residual = x
            x = residual + self.src_attn(self.norm3(x), memory, memory_mask)
        return x


class CifPredictorV2(torch.nn.Module):
    def __init__(self, idim, l_order=1, r_order=1, threshold=1.0,
                 tail_threshold=0.45):
        super().__init__()
        self.pad = torch.nn.ConstantPad1d((l_order, r_order), 0.0)
        self.cif_conv1d = torch.nn.Conv1d(idim, idim, l_order + r_order + 1)
        self.cif_output = torch.nn.Linear(idim, 1)
        self.threshold = threshold
        self.tail_threshold = tail_threshold

    def alphas(self, hidden, mask):
        context = hidden.transpose(1, 2)
        memory = self.cif_conv1d(self.pad(context))
        output = torch.relu((memory + context).transpose(1, 2))
        a = torch.sigmoid(self.cif_output(output)).squeeze(-1)
        return a * mask

    def forward(self, hidden, mask):
        a = self.alphas(hidden, mask)
        b, t, d = hidden.shape
        # tail_process_fn: tail α goes at the first invalid frame position
        zeros = torch.zeros((b, 1))
        mask1 = torch.cat([mask, zeros], dim=1)
        mask2 = torch.cat([torch.ones((b, 1)), mask], dim=1)
        tail = (mask2 - mask1) * self.tail_threshold
        a = torch.cat([a, zeros], dim=1) + tail
        hidden = torch.cat([hidden, torch.zeros((b, 1, d))], dim=1)
        token_num = torch.floor(a.sum(-1))
        embeds = cif_loop(hidden, a, self.threshold)
        return embeds, token_num, a


def cif_loop(hidden, alphas, threshold):
    """FunASR's sequential integrate-and-fire (cif_predictor.py `cif`)."""
    b, t, d = hidden.shape
    integrate = torch.zeros(b)
    frame = torch.zeros(b, d)
    fires, frames = [], []
    for i in range(t):
        alpha = alphas[:, i]
        completion = 1.0 - integrate
        integrate = integrate + alpha
        fires.append(integrate)
        fire = integrate >= threshold
        integrate = torch.where(fire, integrate - 1.0, integrate)
        cur = torch.where(fire, completion, alpha)
        remainder = alpha - cur
        frame = frame + cur[:, None] * hidden[:, i]
        frames.append(frame)
        frame = torch.where(fire[:, None], remainder[:, None] * hidden[:, i], frame)
    fires = torch.stack(fires, 1)
    frames = torch.stack(frames, 1)
    k_max = int(torch.round(alphas.sum(-1)).max().item())
    out = torch.zeros(b, max(k_max, 1), d)
    for bi in range(b):
        sel = frames[bi][fires[bi] >= threshold]
        out[bi, : sel.shape[0]] = sel
    return out


class TorchParaformer(torch.nn.Module):
    """Tiny Paraformer assembled with FunASR state-dict names."""

    def __init__(self, cfg: paraformer.ParaformerConfig):
        super().__init__()
        self.cfg = cfg
        enc = torch.nn.Module()
        enc.encoders0 = torch.nn.ModuleList([
            EncoderLayerSANM(cfg.input_dim, cfg.d_model, cfg.n_heads,
                             cfg.ffn_dim, cfg.kernel_size)])
        enc.encoders = torch.nn.ModuleList([
            EncoderLayerSANM(cfg.d_model, cfg.d_model, cfg.n_heads,
                             cfg.ffn_dim, cfg.kernel_size)
            for _ in range(cfg.encoder_layers - 1)])
        enc.after_norm = LayerNorm(cfg.d_model)
        self.encoder = enc
        self.predictor = CifPredictorV2(
            cfg.d_model, tail_threshold=cfg.predictor_tail_threshold)
        dec = torch.nn.Module()
        dec.decoders = torch.nn.ModuleList([
            DecoderLayerSANM(cfg.d_model, cfg.n_heads, cfg.ffn_dim,
                             cfg.kernel_size)
            for _ in range(cfg.decoder_layers)])
        dec.decoders3 = torch.nn.ModuleList([
            DecoderLayerSANM(cfg.d_model, cfg.n_heads, cfg.ffn_dim,
                             cfg.kernel_size, with_self=False, with_src=False)])
        dec.after_norm = LayerNorm(cfg.d_model)
        dec.output_layer = torch.nn.Linear(cfg.d_model, cfg.vocab_size)
        self.decoder = dec

    def posenc(self, t, d):
        pos = torch.arange(1, t + 1, dtype=torch.float32)[:, None]
        half = d // 2
        inv = torch.exp(torch.arange(half, dtype=torch.float32)
                        * -(np.log(10000.0) / (half - 1)))
        ang = pos * inv[None]
        return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)

    def encode(self, feats, mask):
        x = feats * self.cfg.d_model ** 0.5
        x = x + self.posenc(feats.shape[1], feats.shape[2])[None]
        for layer in self.encoder.encoders0:
            x = layer(x, mask)
        for layer in self.encoder.encoders:
            x = layer(x, mask)
        return self.encoder.after_norm(x)

    def decode(self, embeds, token_mask, memory, memory_mask):
        x = embeds
        for layer in self.decoder.decoders:
            x = layer(x, token_mask, memory, memory_mask)
        for layer in self.decoder.decoders3:
            x = layer(x, token_mask, memory, memory_mask)
        return self.decoder.output_layer(self.decoder.after_norm(x))


def _tiny_cfg():
    return paraformer.ParaformerConfig(
        input_dim=24, d_model=16, n_heads=2, ffn_dim=32,
        encoder_layers=3, decoder_layers=2, vocab_size=40)


def _converted_params(tmodel, cfg):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    template = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rules = ckpt.paraformer_rules(cfg.encoder_layers, cfg.decoder_layers)
    return ckpt.convert_state_dict(sd, rules, template, strict=True)


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    torch.manual_seed(0)  # order-independent weights
    tmodel = TorchParaformer(cfg).eval()
    params = _converted_params(tmodel, cfg)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 20, cfg.input_dim)).astype(np.float32) * 0.5
    lens = np.array([20, 14], np.int32)
    return cfg, tmodel, params, feats, lens


def test_convert_covers_all_rules_strict(setup):
    """Every converter rule resolves against the FunASR-named state dict —
    a missing/renamed torch key would raise KeyError (ADVICE round-1 high)."""
    cfg, tmodel, params, _, _ = setup
    n_leaves = len(jax.tree.leaves(params))
    n_torch = len(tmodel.state_dict())
    assert n_leaves == n_torch, (n_leaves, n_torch)


def test_encoder_full_stack_parity(setup):
    cfg, tmodel, params, feats, lens = setup
    mask_t = torch.from_numpy(
        (np.arange(20)[None] < lens[:, None]).astype(np.float32))
    with torch.no_grad():
        want = tmodel.encode(torch.from_numpy(feats), mask_t).numpy()
    mask = nn.length_mask(jnp.asarray(lens), 20)
    got = np.asarray(paraformer.encode(params, jnp.asarray(feats), mask, cfg))
    valid = np.asarray(mask)[..., None]
    np.testing.assert_allclose(got * valid, want * valid, rtol=2e-4, atol=2e-4)


def test_predictor_alpha_parity(setup):
    cfg, tmodel, params, feats, lens = setup
    mask = nn.length_mask(jnp.asarray(lens), 20)
    enc = paraformer.encode(params, jnp.asarray(feats), mask, cfg)
    with torch.no_grad():
        want = tmodel.predictor.alphas(
            torch.from_numpy(np.asarray(enc)),
            torch.from_numpy(np.asarray(mask))).numpy()
    got = np.asarray(paraformer.predictor_alphas(params, enc, mask, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cif_matmul_matches_sequential_loop(setup):
    """The static-shape overlap-matmul CIF == FunASR's sequential
    integrate-and-fire, token embedding by token embedding."""
    cfg, tmodel, params, feats, lens = setup
    mask = nn.length_mask(jnp.asarray(lens), 20)
    enc = paraformer.encode(params, jnp.asarray(feats), mask, cfg)
    alphas = paraformer.predictor_alphas(params, enc, mask, cfg)
    k_max = paraformer.max_tokens_for(20)
    embeds, counts, _, _, _ = paraformer.cif(enc, alphas, k_max,
                                       cfg.predictor_tail_threshold)
    with torch.no_grad():
        want, want_num, _ = tmodel.predictor(
            torch.from_numpy(np.asarray(enc)),
            torch.from_numpy(np.asarray(mask)))
    np.testing.assert_array_equal(np.asarray(counts),
                                  want_num.numpy().astype(np.int32))
    for b in range(2):
        k = int(counts[b])
        assert k > 0
        np.testing.assert_allclose(np.asarray(embeds)[b, :k],
                                   want.numpy()[b, :k], rtol=2e-4, atol=2e-4)


def test_full_forward_logit_parity(setup):
    """End-to-end: feats → encoder → CIF → decoder → logits, torch vs JAX,
    through the REAL converter name-maps."""
    cfg, tmodel, params, feats, lens = setup
    k_max = paraformer.max_tokens_for(20)
    out = paraformer.forward(params, jnp.asarray(feats), jnp.asarray(lens),
                             k_max, cfg)
    mask_t = torch.from_numpy(
        (np.arange(20)[None] < lens[:, None]).astype(np.float32))
    with torch.no_grad():
        enc_t = tmodel.encode(torch.from_numpy(feats), mask_t)
        embeds_t, num_t, _ = tmodel.predictor(enc_t, mask_t)
        counts = num_t.numpy().astype(np.int32)
        kt = embeds_t.shape[1]
        tok_mask = torch.from_numpy(
            (np.arange(kt)[None] < counts[:, None]).astype(np.float32))
        logits_t = tmodel.decode(embeds_t, tok_mask, enc_t, mask_t).numpy()
    got = np.asarray(out["logits"])
    np.testing.assert_array_equal(np.asarray(out["token_count"]), counts)
    for b in range(2):
        k = int(counts[b])
        np.testing.assert_allclose(got[b, :k], logits_t[b, :k],
                                   rtol=5e-4, atol=5e-4)
        # greedy tokens identical
        np.testing.assert_array_equal(np.asarray(out["tokens"])[b, :k],
                                      logits_t[b, :k].argmax(-1))


def test_decoder_layer_isolated_parity(setup):
    """One DecoderLayerSANM in isolation (FFN inner-norm + fsmn + cross-att)."""
    cfg, tmodel, params, feats, lens = setup
    rng = np.random.default_rng(3)
    k, t = 6, 20
    x = rng.standard_normal((2, k, cfg.d_model)).astype(np.float32)
    mem = rng.standard_normal((2, t, cfg.d_model)).astype(np.float32)
    tok_mask = np.ones((2, k), np.float32)
    tok_mask[1, 4:] = 0.0
    mem_mask = (np.arange(t)[None] < lens[:, None]).astype(np.float32)
    with torch.no_grad():
        want = tmodel.decoder.decoders[0](
            torch.from_numpy(x), torch.from_numpy(tok_mask),
            torch.from_numpy(mem), torch.from_numpy(mem_mask)).numpy()
    layer = params["decoder"]["layers"][0]
    pad = nn.sanm_pad(cfg.kernel_size, cfg.sanm_shift)
    xj = jnp.asarray(x)
    residual = xj
    h = nn.layernorm(layer["norm1"], xj)
    h = nn.dec_ffn(layer["ffn"], h)
    h = nn.layernorm(layer["norm2"], h)
    h = nn.fsmn_block(layer["fsmn"], h, pad, jnp.asarray(tok_mask))
    xj = residual + h
    residual = xj
    h = nn.layernorm(layer["norm3"], xj)
    xj = residual + nn.cross_attention(layer["src_attn"], h, jnp.asarray(mem),
                                       cfg.n_heads, jnp.asarray(mem_mask))
    got = np.asarray(xj)
    valid = tok_mask[..., None]
    np.testing.assert_allclose(got * valid, want * valid, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------- CT-Transformer (punc)
def test_ct_transformer_full_model_parity():
    """Full CT-Transformer (embed → SANM encoder → classifier) vs the torch
    reference modules, weights through ct_transformer_rules (round 2)."""
    from toolbox_for_asr_and_tts_tpu.models import ct_transformer as ctm

    pcfg = ctm.CTTransformerConfig(
        vocab_size=50, embed_dim=24, d_model=16, n_heads=2, ffn_dim=32,
        num_layers=3, punc_size=6, right_context=-1)

    class TorchCT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = torch.nn.Embedding(pcfg.vocab_size, pcfg.embed_dim)
            enc = torch.nn.Module()
            enc.encoders0 = torch.nn.ModuleList([
                EncoderLayerSANM(pcfg.embed_dim, pcfg.d_model, pcfg.n_heads,
                                 pcfg.ffn_dim, pcfg.kernel_size)])
            enc.encoders = torch.nn.ModuleList([
                EncoderLayerSANM(pcfg.d_model, pcfg.d_model, pcfg.n_heads,
                                 pcfg.ffn_dim, pcfg.kernel_size)
                for _ in range(pcfg.num_layers - 1)])
            enc.after_norm = LayerNorm(pcfg.d_model)
            self.encoder = enc
            self.decoder = torch.nn.Linear(pcfg.d_model, pcfg.punc_size)

        def forward(self, ids, mask):
            x = self.embed(ids) * pcfg.d_model ** 0.5
            t, d = x.shape[1], x.shape[2]
            pos = torch.arange(1, t + 1, dtype=torch.float32)[:, None]
            half = d // 2
            inv = torch.exp(torch.arange(half, dtype=torch.float32)
                            * -(np.log(10000.0) / (half - 1)))
            ang = pos * inv[None]
            x = x + torch.cat([torch.sin(ang), torch.cos(ang)], -1)[None]
            for layer in self.encoder.encoders0:
                x = layer(x, mask)
            for layer in self.encoder.encoders:
                x = layer(x, mask)
            return self.decoder(self.encoder.after_norm(x))

    tmodel = TorchCT().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    template = ctm.init_params(jax.random.PRNGKey(0), pcfg)
    rules = ckpt.ct_transformer_rules(pcfg.num_layers)
    params = ckpt.convert_state_dict(sd, rules, template, strict=True)

    rng = np.random.default_rng(4)
    ids = rng.integers(1, pcfg.vocab_size, (2, 12)).astype(np.int32)
    lens = np.array([12, 9], np.int32)
    mask_t = torch.from_numpy(
        (np.arange(12)[None] < lens[:, None]).astype(np.float32))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ids.astype(np.int64)), mask_t).numpy()
    got = np.asarray(ctm.forward(params, jnp.asarray(ids), jnp.asarray(lens),
                                 pcfg))
    valid = np.asarray(nn.length_mask(jnp.asarray(lens), 12))[..., None]
    np.testing.assert_allclose(got * valid, want * valid,
                               rtol=2e-4, atol=2e-4)


def test_ct_transformer_real_large_geometry_parity():
    """CT-Transformer at the REAL `punc_ct-transformer_cn-en-common-
    vocab471067-large` geometry (VERDICT round-2 #5): the full 471067-row
    embedding at embed_dim 256 feeding d_model 512 / 8-head / ffn 2048
    SAN-M layers (2 of the 12 — full width, fewer layers for test runtime).
    Locks the embedding + width-changing encoders0 path at size, including
    the LAST vocab row, and memory-sanity (≈0.5 GB embedding converts and
    runs on host)."""
    from toolbox_for_asr_and_tts_tpu.models import ct_transformer as ctm

    pcfg = ctm.CTTransformerConfig(num_layers=2)  # real defaults otherwise
    assert (pcfg.vocab_size, pcfg.embed_dim, pcfg.d_model, pcfg.n_heads,
            pcfg.ffn_dim) == (471067, 256, 512, 8, 2048)

    class TorchCT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = torch.nn.Embedding(pcfg.vocab_size, pcfg.embed_dim)
            enc = torch.nn.Module()
            enc.encoders0 = torch.nn.ModuleList([
                EncoderLayerSANM(pcfg.embed_dim, pcfg.d_model, pcfg.n_heads,
                                 pcfg.ffn_dim, pcfg.kernel_size)])
            enc.encoders = torch.nn.ModuleList([
                EncoderLayerSANM(pcfg.d_model, pcfg.d_model, pcfg.n_heads,
                                 pcfg.ffn_dim, pcfg.kernel_size)
                for _ in range(pcfg.num_layers - 1)])
            enc.after_norm = LayerNorm(pcfg.d_model)
            self.encoder = enc
            self.decoder = torch.nn.Linear(pcfg.d_model, pcfg.punc_size)

        def forward(self, ids, mask):
            x = self.embed(ids) * pcfg.d_model ** 0.5
            t, d = x.shape[1], x.shape[2]
            pos = torch.arange(1, t + 1, dtype=torch.float32)[:, None]
            half = d // 2
            inv = torch.exp(torch.arange(half, dtype=torch.float32)
                            * -(np.log(10000.0) / (half - 1)))
            ang = pos * inv[None]
            x = x + torch.cat([torch.sin(ang), torch.cos(ang)], -1)[None]
            for layer in self.encoder.encoders0:
                x = layer(x, mask)
            for layer in self.encoder.encoders:
                x = layer(x, mask)
            return self.decoder(self.encoder.after_norm(x))

    torch.manual_seed(6)
    tmodel = TorchCT().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    template = ctm.init_params(jax.random.PRNGKey(0), pcfg)
    params = ckpt.convert_state_dict(
        sd, ckpt.ct_transformer_rules(pcfg.num_layers), template, strict=True)
    assert params["embed"]["table"].shape == (471067, 256)

    rng = np.random.default_rng(9)
    t = 16
    ids = rng.integers(1, pcfg.vocab_size, (2, t)).astype(np.int32)
    ids[0, 0] = pcfg.vocab_size - 1          # exercise the LAST vocab row
    ids[1, 1] = 0
    lens = np.array([t, t - 5], np.int32)
    mask_t = torch.from_numpy(
        (np.arange(t)[None] < lens[:, None]).astype(np.float32))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ids.astype(np.int64)), mask_t).numpy()
    got = np.asarray(ctm.forward(params, jnp.asarray(ids), jnp.asarray(lens),
                                 pcfg))
    valid = np.asarray(nn.length_mask(jnp.asarray(lens), t))[..., None]
    np.testing.assert_allclose(got * valid, want * valid,
                               rtol=2e-3, atol=2e-3)


def test_ct_transformer_cn_en_config_pins_punc_list():
    """A mounted cn-en large dir's config.yaml pins geometry AND the
    punc_list (the service inserts punc_list[c] verbatim, so an extended
    cn-en list must flow through unchanged)."""
    from toolbox_for_asr_and_tts_tpu.models import ct_transformer as ctm
    conf = {
        "encoder_conf": {"attention_heads": 8, "linear_units": 2048,
                         "num_blocks": 12, "output_size": 512,
                         "input_size": 256, "kernel_size": 11,
                         "sanm_shift": 0},
        "model_conf": {"punc_list": ["<unk>", "_", "，", "。", "？", "、",
                                     "；", "："],
                       "vocab_size": 471067},
    }
    cfg = ctm.CTTransformerConfig.from_funasr(conf)
    assert (cfg.vocab_size, cfg.embed_dim, cfg.d_model, cfg.num_layers) == \
        (471067, 256, 512, 12)
    assert cfg.punc_size == 8 and cfg.punc_list[-1] == "："
