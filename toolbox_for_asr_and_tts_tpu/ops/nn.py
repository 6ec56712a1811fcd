"""Functional neural-net building blocks with explicit parameter pytrees.

Design: every layer is an (init, apply) pair of pure functions. Parameters
are plain nested dicts of `jnp.ndarray` — no module framework — so that

- checkpoint conversion from the reference's PyTorch state dicts is a direct
  name-path mapping (runtime/checkpoints.py),
- models jit/shard trivially (`params` is just a pytree to `jax.device_put`),
- batch-first `[B, T, D]` everywhere, masks explicit, shapes static.

All matmuls request `preferred_element_type=float32` so the MXU accumulates
in fp32 even when params/activations are bf16.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

NEG_INF = -1e9  # additive mask value (finite: avoids NaN through softmax)


# ----------------------------------------------------------------- helpers
def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def length_mask(lengths: jnp.ndarray, t: int) -> jnp.ndarray:
    """[B] valid lengths → [B, T] float mask."""
    return (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)


def dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, w, preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ linear
def linear_init(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    scale = 1.0 / np.sqrt(d_in)
    p = {"w": _uniform(kw, (d_in, d_out), scale)}
    if bias:
        p["b"] = _uniform(kb, (d_out,), scale)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if p["w"].dtype == jnp.int8:
        return _linear_int8(p, x)
    y = dot(x, p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


def quantize_linear_int8(p: Params) -> Params:
    """Symmetric per-output-channel int8 weight quantization of a linear
    param dict: {"w" int8 [in,out], "s" f32 [out], "b"?}. `linear`
    dispatches on the int8 dtype, so call sites don't change."""
    w = jnp.asarray(p["w"], jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0   # [out]
    q = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
    out = {"w": q, "s": s}
    if "b" in p:
        out["b"] = jnp.asarray(p["b"], jnp.float32)
    return out


def _linear_int8(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul on the MXU's s8×s8→s32 path (2× bf16 throughput on
    v5e). Activations quantize dynamically with a per-token symmetric
    scale; the product of activation and per-channel weight scales
    dequantizes the int32 accumulator in f32."""
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8).astype(jnp.float32) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    y = jax.lax.dot_general(xq, p["w"], (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * p["s"])
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


# --------------------------------------------------------------- layernorm
def layernorm_init(d: int) -> Params:
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


# --------------------------------------------------------------- embedding
def embedding_init(key, n_vocab: int, d: int) -> Params:
    return {"table": jax.random.normal(key, (n_vocab, d)) * (d ** -0.5)}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return p["table"][ids]


# ------------------------------------------------------------------ conv1d
def conv1d_init(key, d_in: int, d_out: int, k: int, groups: int = 1,
                bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = (d_in // groups) * k
    scale = 1.0 / np.sqrt(fan_in)
    p = {"w": _uniform(kw, (d_out, d_in // groups, k), scale)}  # torch OIk layout
    if bias:
        p["b"] = _uniform(kb, (d_out,), scale)
    return p


def conv1d(p: Params, x: jnp.ndarray, stride: int = 1,
           padding: Tuple[int, int] = (0, 0), groups: int = 1,
           dilation: int = 1) -> jnp.ndarray:
    """x: [B, T, C_in] → [B, T', C_out]. Weight layout matches torch (O, I/g, K)."""
    w = p["w"]
    ct = jnp.promote_types(x.dtype, w.dtype)
    x, w = x.astype(ct), w.astype(ct)
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)),  # (K, I/g, O)
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def conv_transpose1d(p: Params, x: jnp.ndarray, stride: int,
                     padding: int = 0) -> jnp.ndarray:
    """Torch-semantics ConvTranspose1d. x: [B, T, C_in] → [B, T*stride(ish), C_out].

    Weight layout matches torch ConvTranspose1d: (C_in, C_out, K).
    Output length = (T-1)*stride - 2*padding + K.
    """
    w = p["w"]  # (I, O, K)
    ct = jnp.promote_types(x.dtype, w.dtype)
    x, w = x.astype(ct), w.astype(ct)
    k = w.shape[2]
    # transpose_kernel=True swaps the kernel's I/O axes, so pass (K, O, I)
    y = jax.lax.conv_transpose(
        x, jnp.transpose(w, (2, 1, 0)),
        strides=(stride,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True,
    )
    if "b" in p:
        y = y + p["b"]
    return y


# -------------------------------------------------- sinusoidal position enc
def sinusoidal_posenc(t: int, d: int, offset: int = 1,
                      dtype=jnp.float32) -> jnp.ndarray:
    """FunASR `SinusoidalPositionEncoder` (position starts at 1)."""
    pos = jnp.arange(offset, t + offset, dtype=jnp.float32)[:, None]
    half = d // 2
    inv = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(np.log(10000.0) / (half - 1)))
    ang = pos * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).astype(dtype)


# -------------------------------------------------------------- FSMN block
def fsmn_block_init(key, d: int, lorder: int, rorder: int = 0) -> Params:
    """VAD-style FSMNBlock: kernel covers lorder past frames (incl. current)
    plus rorder future frames. Use with `fsmn_pad_for` to get the static pads.
    """
    return {"w": jax.random.normal(key, (d, 1, lorder + rorder)) * 0.02}


def fsmn_pad(lorder: int, rorder: int = 0) -> Tuple[int, int]:
    """Pads for a VAD-style FSMN conv (kernel = lorder + rorder, lorder
    includes the current frame): output length == T."""
    return lorder - 1, rorder


USE_PALLAS_FSMN = True  # TPU: Pallas shifted-add kernel (~2× XLA's conv)


def _on_tpu() -> bool:
    import jax as _jax
    try:
        return _jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def fsmn_block(p: Params, x: jnp.ndarray, pad: Tuple[int, int],
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FSMN memory: depthwise conv over time with residual.

    Matches FunASR `FSMNBlock` (vad) / the `fsmn_block` inside SAN-M attention:
    y = x + depthwise_conv(pad)(x), where pad = (left, right) is static and
    chosen so output length == T (pad_l + pad_r == kernel - 1).

    On TPU this dispatches to the Pallas VPU kernel
    (ops/pallas/fsmn_conv.py, ~2× faster than the XLA conv lowering and
    true-f32); elsewhere it uses the XLA depthwise conv.
    """
    if mask is not None:
        x = x * mask[..., None]
    if USE_PALLAS_FSMN and _on_tpu():
        from .pallas.fsmn_conv import fsmn_depthwise
        y = fsmn_depthwise(x, p["w"].astype(x.dtype), pad[0], pad[1])
    else:
        d = x.shape[-1]
        y = x + conv1d({"w": p["w"]}, x, padding=pad, groups=d)
    if mask is not None:
        y = y * mask[..., None]
    return y


def fsmn_memory_init(key, d: int, kernel_size: int) -> Params:
    """SAN-M style memory conv weights (kernel_size taps)."""
    return {"w": jax.random.normal(key, (d, 1, kernel_size)) * 0.02}


def sanm_pad(kernel_size: int, sanm_shift: int = 0) -> Tuple[int, int]:
    left = (kernel_size - 1) // 2 + sanm_shift
    return left, kernel_size - 1 - left


# ------------------------------------------------------ attention (SAN-M)
def sanm_attention_init(key, d_in: int, d: int, n_heads: int,
                        kernel_size: int = 11) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "qkv": linear_init(k1, d_in, 3 * d),
        "out": linear_init(k2, d, d),
        "fsmn": fsmn_memory_init(k3, d, kernel_size),
    }


def _split_heads(x: jnp.ndarray, h: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
           mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """q,k,v: [B,H,T,Dk]; mask: [B, Tq, Tk] or [B, 1, Tk] (1 = keep)."""
    dk = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dk)
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[:, None, :]
        scores = scores + (1.0 - mask[:, None, :, :]) * NEG_INF
    att = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v,
                      preferred_element_type=jnp.float32)


def sanm_attention(p: Params, x: jnp.ndarray, n_heads: int,
                   mask: Optional[jnp.ndarray] = None,
                   kernel_size: int = 11, sanm_shift: int = 0,
                   att_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FunASR `MultiHeadedAttentionSANM`: MHA + depthwise FSMN memory on V.

    mask: [B, T] validity (1 = valid). att_mask optionally overrides the
    attention visibility with a full [B, Tq, Tk] pattern (e.g. the
    CT-Transformer's bounded right context). Returns [B, T, d].
    """
    qkv = linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    mem = fsmn_block(p["fsmn"], v, sanm_pad(kernel_size, sanm_shift), mask)
    if att_mask is None:
        att_mask = None if mask is None else mask[:, None, :]  # [B,1,Tk]
    out = attend(_split_heads(q, n_heads), _split_heads(k, n_heads),
                 _split_heads(v, n_heads), att_mask)
    return linear(p["out"], _merge_heads(out)) + mem


def cross_attention_init(key, d_q: int, d_kv: int, d: int, n_heads: int) -> Params:
    del n_heads
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "q": linear_init(k1, d_q, d),
        "kv": linear_init(k2, d_kv, 2 * d),
        "out": linear_init(k3, d, d),
    }


def cross_attention(p: Params, x: jnp.ndarray, memory: jnp.ndarray,
                    n_heads: int,
                    memory_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FunASR `MultiHeadedAttentionCrossAtt`. memory_mask: [B, T_mem]."""
    q = linear(p["q"], x)
    kv = linear(p["kv"], memory)
    k, v = jnp.split(kv, 2, axis=-1)
    m = None if memory_mask is None else memory_mask[:, None, :]
    out = attend(_split_heads(q, n_heads), _split_heads(k, n_heads),
                 _split_heads(v, n_heads), m)
    return linear(p["out"], _merge_heads(out))


def mha_init(key, d: int, n_heads: int) -> Params:
    """Standard transformer self-attention (q/k/v/out)."""
    del n_heads
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": linear_init(k1, d, d),
        "k": linear_init(k2, d, d),
        "v": linear_init(k3, d, d),
        "out": linear_init(k4, d, d),
    }


def mha(p: Params, x: jnp.ndarray, n_heads: int,
        mask: Optional[jnp.ndarray] = None,
        kv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    src = x if kv is None else kv
    q, k, v = linear(p["q"], x), linear(p["k"], src), linear(p["v"], src)
    m = None if mask is None else (mask if mask.ndim == 3 else mask[:, None, :])
    out = attend(_split_heads(q, n_heads), _split_heads(k, n_heads),
                 _split_heads(v, n_heads), m)
    return linear(p["out"], _merge_heads(out))


# --------------------------------------------------------------------- FFN
def ffn_init(key, d: int, d_hidden: int, d_out: Optional[int] = None) -> Params:
    k1, k2 = jax.random.split(key)
    return {"w1": linear_init(k1, d, d_hidden),
            "w2": linear_init(k2, d_hidden, d_out or d)}


def ffn(p: Params, x: jnp.ndarray, activation=jax.nn.relu) -> jnp.ndarray:
    return linear(p["w2"], activation(linear(p["w1"], x)))


def dec_ffn_init(key, d: int, d_hidden: int, d_out: Optional[int] = None) -> Params:
    """FunASR `PositionwiseFeedForwardDecoderSANM`: w_1 (bias) → act →
    LayerNorm over the hidden dim → w_2 (NO bias)."""
    k1, k2 = jax.random.split(key)
    return {"w1": linear_init(k1, d, d_hidden),
            "norm": layernorm_init(d_hidden),
            "w2": linear_init(k2, d_hidden, d_out or d, bias=False)}


def dec_ffn(p: Params, x: jnp.ndarray, activation=jax.nn.relu) -> jnp.ndarray:
    return linear(p["w2"], layernorm(p["norm"], activation(linear(p["w1"], x))))


# ----------------------------------------------------------------- sampling
def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)
