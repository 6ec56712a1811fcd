"""Paraformer: non-autoregressive ASR (SAN-M encoder + CIF + NAR decoder).

TPU-native re-implementation of the model family behind ModelScope
`speech_paraformer-large_asr_nat-zh-cn-16k-common-vocab8404` — the model the
reference uses for final transcription via its diarization pipeline
(voice-service/app/services/voice_interface.py:776-841) and, in streaming
form, `paraformer-zh-streaming` (voice_interface.py:629-634).

Structure (FunASR Paraformer):
    frontend: fbank80 → LFR 7/6 → CMVN → 560-dim @ 60 ms
    encoder:  x·√d + sinusoidal PE → 1 × SAN-M layer (in 560 → 512, no
              attention residual) → 49 × SAN-M layers (512) → LayerNorm
              SAN-M layer: norm → self-attn(MHA + depthwise FSMN memory on V,
              kernel 11) (+residual) → norm → FFN 2048 relu (+residual)
    predictor (CIF v2): pad(1,1) conv1d(512,512,k=3) → relu → linear(512,1)
              → sigmoid → α per frame; Σα = token count
    decoder:  16 × SAN-M decoder layers (ffn → FSMN self-memory k=11 →
              cross-attn over encoder) + 1 ffn-only layer → LayerNorm →
              linear 512→8404
    greedy:   argmax over vocab at each CIF-fired token position.

TPU-first formulation of CIF (survey §7 "hard parts"): instead of the
reference's data-dependent integrate-and-fire loop, token embeddings are a
single [K, T] overlap-weight matmul against encoder frames — token k's weight
on frame t is the measure overlap of [k, k+1) with [cumsum α_{t-1}, cumsum
α_t). Identical result for threshold 1.0, static shapes, runs on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.frontend import FrontendConfig


@dataclasses.dataclass(frozen=True)
class ParaformerConfig:
    input_dim: int = 560           # 80 mel × LFR m=7
    d_model: int = 512
    n_heads: int = 4
    ffn_dim: int = 2048
    encoder_layers: int = 50       # first layer takes input_dim
    decoder_layers: int = 16       # full layers; +1 ffn-only layer
    kernel_size: int = 11
    sanm_shift: int = 0
    vocab_size: int = 8404
    predictor_kernel: int = 3      # l_order + r_order + 1
    predictor_l_order: int = -1    # CIF conv left context; -1 = symmetric
                                   # (k-1)//2 — FunASR pads (l_order, r_order)
    predictor_tail_threshold: float = 0.45
    bicif: bool = False            # BiCifParaformer: upsampled second CIF
                                   # (timestamp predictor of the spk model,
                                   # voice_interface.py:776-841)
    upsample_times: int = 3        # LFR 60 ms → 20 ms timestamp resolution
    blank_id: int = 0
    sos_id: int = 1
    eos_id: int = 2
    unk_id: int = 8403
    remat: bool = False            # jax.checkpoint each encoder layer
                                   # (training-memory ↔ FLOPs trade)
    lfr_m: int = 7
    lfr_n: int = 6

    @property
    def frontend(self) -> FrontendConfig:
        return FrontendConfig(lfr_m=self.lfr_m, lfr_n=self.lfr_n)

    @classmethod
    def from_funasr(cls, conf: dict, **overrides) -> "ParaformerConfig":
        """Config from a FunASR checkpoint's own config.yaml, so a mounted
        real dir pins geometry (encoder/decoder blocks, dims, CIF orders,
        LFR) instead of this file's defaults. Handles FunASR's historical
        `sanm_shfit` spelling."""
        kw = {}
        enc = conf.get("encoder_conf", {}) or {}
        for src, dst in (("output_size", "d_model"),
                         ("attention_heads", "n_heads"),
                         ("linear_units", "ffn_dim"),
                         ("num_blocks", "encoder_layers"),
                         ("kernel_size", "kernel_size"),
                         ("sanm_shift", "sanm_shift"),
                         ("sanm_shfit", "sanm_shift")):
            if src in enc:
                kw[dst] = enc[src]
        dec = conf.get("decoder_conf", {}) or {}
        if "num_blocks" in dec:
            kw["decoder_layers"] = dec["num_blocks"]
        pred = conf.get("predictor_conf", {}) or {}
        if "tail_threshold" in pred:
            kw["predictor_tail_threshold"] = pred["tail_threshold"]
        if "l_order" in pred and "r_order" in pred:
            kw["predictor_kernel"] = pred["l_order"] + pred["r_order"] + 1
            kw["predictor_l_order"] = pred["l_order"]
        fr = conf.get("frontend_conf", {}) or {}
        lfr_m = fr.get("lfr_m", 7)
        lfr_n = fr.get("lfr_n", 6)
        kw["lfr_m"], kw["lfr_n"] = lfr_m, lfr_n
        kw["input_dim"] = fr.get("n_mels", 80) * lfr_m
        if conf.get("model") == "BicifParaformer" \
                or "upsample_times" in pred:
            kw["bicif"] = True
            if "upsample_times" in pred:
                kw["upsample_times"] = pred["upsample_times"]
        kw.update(overrides)
        return cls(**kw)


def max_tokens_for(t_frames: int) -> int:
    """Static decode capacity for a given (bucketed) encoder length.

    CIF emits ≈1 token per 2–4 LFR frames for Mandarin (60 ms frames,
    ~4–6 chars/s); T//2 + 8, rounded up to 8, is a safe static cap.
    """
    k = t_frames // 2 + 8
    return ((k + 7) // 8) * 8


# -------------------------------------------------------------------- init
def init_params(key, cfg: ParaformerConfig = ParaformerConfig()) -> nn.Params:
    n_enc, n_dec = cfg.encoder_layers, cfg.decoder_layers
    keys = jax.random.split(key, 2 * n_enc + 3 * (n_dec + 1) + 8)
    ki = iter(range(len(keys)))
    enc_layers = []
    for i in range(n_enc):
        d_in = cfg.input_dim if i == 0 else cfg.d_model
        enc_layers.append({
            "norm1": nn.layernorm_init(d_in),
            "attn": nn.sanm_attention_init(keys[next(ki)], d_in, cfg.d_model,
                                           cfg.n_heads, cfg.kernel_size),
            "norm2": nn.layernorm_init(cfg.d_model),
            "ffn": nn.ffn_init(keys[next(ki)], cfg.d_model, cfg.ffn_dim),
        })
    dec_layers = []
    for _ in range(n_dec):
        dec_layers.append({
            "norm1": nn.layernorm_init(cfg.d_model),
            "ffn": nn.dec_ffn_init(keys[next(ki)], cfg.d_model, cfg.ffn_dim),
            "norm2": nn.layernorm_init(cfg.d_model),
            "fsmn": nn.fsmn_memory_init(keys[next(ki)], cfg.d_model, cfg.kernel_size),
            "norm3": nn.layernorm_init(cfg.d_model),
            "src_attn": nn.cross_attention_init(keys[next(ki)], cfg.d_model,
                                                cfg.d_model, cfg.d_model, cfg.n_heads),
        })
    dec_final = {
        "norm1": nn.layernorm_init(cfg.d_model),
        "ffn": nn.dec_ffn_init(keys[next(ki)], cfg.d_model, cfg.ffn_dim),
    }
    predictor = {
        "conv": nn.conv1d_init(keys[next(ki)], cfg.d_model, cfg.d_model,
                               cfg.predictor_kernel),
        "out": nn.linear_init(keys[next(ki)], cfg.d_model, 1),
    }
    if cfg.bicif:
        d, u = cfg.d_model, cfg.upsample_times
        k2 = jax.random.split(keys[next(ki)], 8)
        s = 1.0 / (d ** 0.5)

        def lstm_dir(ka, kb):
            return {"w_ih": jax.random.uniform(ka, (4 * d, d), minval=-s,
                                               maxval=s),
                    "w_hh": jax.random.uniform(kb, (4 * d, d), minval=-s,
                                               maxval=s),
                    "b_ih": jnp.zeros((4 * d,)), "b_hh": jnp.zeros((4 * d,))}

        predictor["upsample"] = {
            # ConvTranspose1d(d, d, u, u): torch weight layout [in, out, k]
            "cnn": {"w": jax.random.normal(k2[0], (d, d, u)) * s,
                    "b": jnp.zeros((d,))},
            "fwd": lstm_dir(k2[1], k2[2]),
            "bwd": lstm_dir(k2[3], k2[4]),
            "out": nn.linear_init(k2[5], 2 * d, 1),
        }
    return {
        "encoder": {"layers": enc_layers,
                    "after_norm": nn.layernorm_init(cfg.d_model)},
        "predictor": predictor,
        "decoder": {"layers": dec_layers, "final": dec_final,
                    "after_norm": nn.layernorm_init(cfg.d_model),
                    "out": nn.linear_init(keys[next(ki)], cfg.d_model,
                                          cfg.vocab_size)},
    }


def quantize_encoder_int8(params: nn.Params) -> nn.Params:
    """W8A8 serving quantization of the SAN-M encoder stack — the encoder
    holds ~90% of offline-recognition FLOPs (50 layers vs the 16-layer
    decoder running on ~6× fewer positions), and v5e's s8×s8 MXU path has
    2× bf16 throughput. Only the attention qkv/out and FFN w1/w2 linears
    quantize (per-output-channel weight scales + dynamic per-token
    activation scales in ops/nn.py); layernorms, the depthwise FSMN conv,
    predictor, and decoder stay in the float dtype, so accuracy-critical
    CIF/decode math is untouched. Serving-only: quantized trees are not
    trainable and not sharded parameter-wise (replicate on the mesh)."""
    out = jax.tree.map(lambda a: a, params)  # shallow-copy containers
    layers = []
    for layer in params["encoder"]["layers"]:
        q = dict(layer)
        q["attn"] = dict(layer["attn"])
        q["attn"]["qkv"] = nn.quantize_linear_int8(layer["attn"]["qkv"])
        q["attn"]["out"] = nn.quantize_linear_int8(layer["attn"]["out"])
        q["ffn"] = {"w1": nn.quantize_linear_int8(layer["ffn"]["w1"]),
                    "w2": nn.quantize_linear_int8(layer["ffn"]["w2"])}
        layers.append(q)
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["layers"] = layers
    return out


# ----------------------------------------------------------------- encoder
def encode(params: nn.Params, feats: jnp.ndarray, mask: jnp.ndarray,
           cfg: ParaformerConfig = ParaformerConfig()) -> jnp.ndarray:
    """feats: [B, T, 560]; mask: [B, T] → encoder states [B, T, 512]."""
    b, t, _ = feats.shape
    x = feats * (cfg.d_model ** 0.5)
    x = x + nn.sinusoidal_posenc(t, feats.shape[-1])[None]

    def layer_fn(layer, x, first: bool):
        residual = x
        h = nn.layernorm(layer["norm1"], x)
        h = nn.sanm_attention(layer["attn"], h, cfg.n_heads, mask,
                              cfg.kernel_size, cfg.sanm_shift)
        x = h if first else residual + h  # no residual when in_dim ≠ d_model
        residual = x
        h = nn.ffn(layer["ffn"], nn.layernorm(layer["norm2"], x))
        return residual + h

    if cfg.remat:  # rematerialize activations during fine-tuning
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(2,))
    for i, layer in enumerate(params["encoder"]["layers"]):
        x = layer_fn(layer, x, i == 0)
    x = nn.layernorm(params["encoder"]["after_norm"], x)
    return x * mask[..., None]


# --------------------------------------------------------------- predictor
def predictor_lpad(cfg: "ParaformerConfig") -> int:
    """Left padding of the CIF predictor conv (FunASR ConstantPad1d
    (l_order, r_order)); -1 config default = symmetric kernel."""
    return (cfg.predictor_l_order if cfg.predictor_l_order >= 0
            else (cfg.predictor_kernel - 1) // 2)


def predictor_alphas(params: nn.Params, enc: jnp.ndarray, mask: jnp.ndarray,
                     cfg: ParaformerConfig = ParaformerConfig()) -> jnp.ndarray:
    """CIF v2 α weights: [B, T] in [0, 1), masked."""
    p = params["predictor"]
    lpad = predictor_lpad(cfg)
    # FunASR CifPredictorV2: conv output adds onto its input (residual) BEFORE
    # the relu — `output = memory + context` in predictor.py; padding is
    # (l_order, r_order), NOT symmetric, for checkpoints with l≠r
    h = nn.conv1d(p["conv"], enc,
                  padding=(lpad, cfg.predictor_kernel - 1 - lpad)) + enc
    h = jax.nn.relu(h)
    alphas = jax.nn.sigmoid(nn.linear(p["out"], h))[..., 0]
    return alphas * mask


def cif(enc: jnp.ndarray, alphas: jnp.ndarray, k_max: int,
        tail_threshold: float = 0.45
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Continuous integrate-and-fire as a static-shape overlap matmul.

    Args:
        enc:    [B, T, D] encoder states.
        alphas: [B, T] CIF weights.
        k_max:  static token capacity.

    Returns:
        (embeds [B, K, D], token_count [B] int32, fire_frame [B, K] int32 —
        the frame at which each token's integration crossed its boundary —
        and token_center [B, K] float32, the α-weighted mean frame of each
        token's integration window: the refined timestamp).

    Tail handling (FunASR CifPredictorV2.tail_process_fn): a virtual tail
    frame with α = tail_threshold and zero hidden is appended, so a trailing
    partial token ≥ (1 − tail_threshold) still fires (with zero contribution
    from the virtual frame itself).
    """
    b, t, d = enc.shape
    alphas = jnp.concatenate(
        [alphas, jnp.full((b, 1), tail_threshold, alphas.dtype)], axis=1)
    enc = jnp.concatenate([enc, jnp.zeros((b, 1, d), enc.dtype)], axis=1)
    csum = jnp.cumsum(alphas, axis=1)              # [B, T+1]
    lo = jnp.concatenate([jnp.zeros((b, 1)), csum[:, :-1]], axis=1)
    k = jnp.arange(k_max, dtype=jnp.float32)
    # weight of frame t on token k: |[lo_t, csum_t) ∩ [k, k+1)|
    w = jnp.minimum(csum[:, None, :], k[None, :, None] + 1.0) - \
        jnp.maximum(lo[:, None, :], k[None, :, None])
    w = jnp.maximum(w, 0.0)                        # [B, K, T+1]
    embeds = jnp.einsum("bkt,btd->bkd", w, enc,
                        preferred_element_type=jnp.float32)
    token_count = jnp.floor(csum[:, -1]).astype(jnp.int32)
    token_count = jnp.minimum(token_count, k_max)
    # fire frame of token k = first frame where csum ≥ k+1 (its END);
    # start frame = first frame contributing mass to it (csum > k)
    fired = (csum[:, None, :] >= (k[None, :, None] + 1.0)).astype(jnp.int32)
    fire_frame = jnp.argmax(fired, axis=2).astype(jnp.int32)  # [B, K]
    started = (csum[:, None, :] > k[None, :, None]).astype(jnp.int32)
    start_frame = jnp.argmax(started, axis=2).astype(jnp.int32)  # [B, K]
    # refined token time: CIF center of mass — the α-weighted mean frame of
    # token k's integration window (the quantity FunASR's timestamp
    # prediction derives from the same alphas; far tighter than the fire
    # frame, which lands at the END of the window)
    t_idx = jnp.arange(w.shape[-1], dtype=jnp.float32)
    mass = jnp.maximum(w.sum(axis=2), 1e-6)                   # [B, K]
    center = jnp.einsum("bkt,t->bk", w, t_idx) / mass         # [B, K]
    return embeds, token_count, fire_frame, center, start_frame


# ------------------------------------------------- BiCIF timestamp branch
def _lstm_dir(p: nn.Params, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """One torch-layout LSTM direction over [B, T, D] (gate order i,f,g,o:
    torch.nn.LSTM semantics, so the real blstm weights load unchanged)."""
    if reverse:
        x = x[:, ::-1]
    b, t, _ = x.shape
    h_dim = p["w_hh"].shape[1]
    # input contribution precomputed for every step (one big MXU matmul)
    xw = jnp.einsum("btd,gd->btg", x, p["w_ih"]) + p["b_ih"] + p["b_hh"]

    def step(carry, xt):
        h, c = carry
        g = xt + h @ p["w_hh"].T
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    zeros = jnp.zeros((b, h_dim), x.dtype)
    _, ys = jax.lax.scan(step, (zeros, zeros), xw.transpose(1, 0, 2))
    ys = ys.transpose(1, 0, 2)
    return ys[:, ::-1] if reverse else ys


def upsample_alphas(params: nn.Params, enc: jnp.ndarray, mask: jnp.ndarray,
                    cfg: ParaformerConfig) -> jnp.ndarray:
    """BiCIF upsampled alphas (FunASR CifPredictorV3: upsample_cnn → blstm →
    cif_output2 → sigmoid), the 20 ms-resolution timestamp signal of
    `paraformer-large-vad-punc-spk` (voice_interface.py:776-841).

    enc: [B, T, D]; mask: [B, T] → us_alphas [B, T·u] (padding masked).
    ConvTranspose1d with stride == kernel == u is frame-local: input frame t
    produces output frames t·u..t·u+u−1 through kernel slice j — an einsum,
    no overlap-add needed.
    """
    p = params["predictor"]["upsample"]
    b, t, d = enc.shape
    u = p["cnn"]["w"].shape[-1]
    up = jnp.einsum("btd,dok->btko", enc, p["cnn"]["w"]) + p["cnn"]["b"]
    up = up.reshape(b, t * u, d)
    ys = jnp.concatenate([_lstm_dir(p["fwd"], up, False),
                          _lstm_dir(p["bwd"], up, True)], axis=-1)
    alphas = jax.nn.sigmoid(nn.linear(p["out"], ys))[..., 0]     # [B, T·u]
    return alphas * jnp.repeat(mask, u, axis=1)


def upsample_fire_frames(us_alphas: jnp.ndarray, token_count: jnp.ndarray,
                         k_max: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token boundary frames from upsampled alphas.

    FunASR rescales us_alphas so total mass equals the main CIF's token
    count, then integrates-and-fires at threshold 1 (cif_wo_hidden); here the
    fire positions come straight from the rescaled cumsum (static shapes):
    token k occupies upsampled frames [us_start_k, us_end_k].
    """
    n = token_count.astype(jnp.float32)[:, None]
    mass = jnp.maximum(us_alphas.sum(axis=-1, keepdims=True), 1e-6)
    csum = jnp.cumsum(us_alphas * (n / mass), axis=-1)           # [B, U]
    k = jnp.arange(k_max, dtype=jnp.float32)
    ended = csum[:, None, :] >= (k[None, :, None] + 1.0 - 1e-4)
    started = csum[:, None, :] > (k[None, :, None] + 1e-4)
    us_end = jnp.argmax(ended.astype(jnp.int32), axis=2)
    us_start = jnp.argmax(started.astype(jnp.int32), axis=2)
    return us_start.astype(jnp.int32), us_end.astype(jnp.int32)


# ----------------------------------------------------------------- decoder
def decode(params: nn.Params, embeds: jnp.ndarray, token_mask: jnp.ndarray,
           memory: jnp.ndarray, memory_mask: jnp.ndarray,
           cfg: ParaformerConfig = ParaformerConfig()) -> jnp.ndarray:
    """NAR decode: CIF embeds [B, K, D] → logits [B, K, vocab].

    Layer structure mirrors FunASR `DecoderLayerSANM`: the FFN output feeds
    the FSMN self-memory whose output adds onto the *pre-FFN* residual; then
    cross-attention over the encoder memory with its own residual.
    """
    x = embeds
    pad = nn.sanm_pad(cfg.kernel_size, cfg.sanm_shift)
    for layer in params["decoder"]["layers"]:
        residual = x
        h = nn.layernorm(layer["norm1"], x)
        h = nn.dec_ffn(layer["ffn"], h)
        h = nn.layernorm(layer["norm2"], h)
        h = nn.fsmn_block(layer["fsmn"], h, pad, token_mask)
        x = residual + h
        residual = x
        h = nn.layernorm(layer["norm3"], x)
        x = residual + nn.cross_attention(layer["src_attn"], h, memory,
                                          cfg.n_heads, memory_mask)
    # decoders3: ffn-only DecoderLayerSANM — norm1 → ffn, NO residual
    # (FunASR decoder.py: with self_attn=src_attn=None, forward returns the
    # ffn output directly)
    fin = params["decoder"]["final"]
    x = nn.dec_ffn(fin["ffn"], nn.layernorm(fin["norm1"], x))
    x = nn.layernorm(params["decoder"]["after_norm"], x)
    return nn.linear(params["decoder"]["out"], x)


# ------------------------------------------------------------ full forward
def forward(params: nn.Params, feats: jnp.ndarray, feat_lengths: jnp.ndarray,
            k_max: int, cfg: ParaformerConfig = ParaformerConfig()
            ) -> Dict[str, jnp.ndarray]:
    """Batched offline recognition forward pass (jittable, static shapes).

    feats: [B, T, 560] LFR+CMVN features; feat_lengths: [B] valid frames.
    Returns dict with logits [B, K, V], token ids [B, K] (greedy), token_count
    [B], fire_frame [B, K].
    """
    t = feats.shape[1]
    mask = nn.length_mask(feat_lengths, t)
    enc = encode(params, feats, mask, cfg)
    alphas = predictor_alphas(params, enc, mask, cfg)
    embeds, token_count, fire_frame, center, start_frame = cif(
        enc, alphas, k_max, cfg.predictor_tail_threshold)
    token_mask = nn.length_mask(token_count, k_max)
    logits = decode(params, embeds, token_mask, enc, mask, cfg)
    tokens = jnp.argmax(logits, axis=-1) * token_mask.astype(jnp.int32)
    extra = {}
    if "upsample" in params["predictor"]:
        us = upsample_alphas(params, enc, mask, cfg)
        us_start, us_end = upsample_fire_frames(us, token_count, k_max)
        extra = {"us_start": us_start, "us_end": us_end}
    return {
        **extra,
        "logits": logits,
        "tokens": tokens,
        "token_count": token_count,
        "fire_frame": fire_frame,
        "token_center": center,
        "token_start": start_frame,
        "alphas": alphas,
        # device-side intermediates for two-phase rescoring (asr/recognizer):
        # callers that fetch the dict should drop these first
        "enc": enc,
        "embeds": embeds,
    }
