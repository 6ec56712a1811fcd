"""Sequence-parallel SAN-M encoding over the mesh (long-audio one-shot).

The reference scales along time by CHUNKING (diarization `batch_size_s`
60/120/300, voice_interface.py:2040-2053) because a single GPU can't hold a
long utterance. The TPU-native alternative the survey names (§5
"long-context": "standard shard_map sequence sharding over ICI is the
idiomatic TPU answer") is implemented here: the time axis of ONE utterance
shards across the mesh, each device computes its block of encoder rows, and
the only communication is a per-layer all-gather of K/V over ICI.

Design (mirrors models/paraformer.py::encode exactly — equivalence-tested):

- input scaling + positional encoding happen OUTSIDE the shard_map on the
  global array (posenc is a function of absolute position);
- per layer, q/k/v project LOCALLY from the device's block; K and V
  all-gather (tiled) so full-context attention scores [Tb, T] are computed
  for the local rows only — score compute and FFN both scale 1/n;
- the depthwise FSMN memory conv runs on the gathered V (negligible cost)
  and the local block is sliced out — no halo bookkeeping;
- masks travel replicated; invalid rows zero out exactly as offline.

Use `pad_to_blocks` to round T up to a multiple of the mesh axis; the mask
keeps padding inert, so sharded == offline on the valid prefix.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import paraformer
from ..ops import nn


def pad_to_blocks(feats: jnp.ndarray, mask: jnp.ndarray, n: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad [B,T,D] feats + [B,T] mask so T % n == 0 (padding is masked)."""
    t = feats.shape[1]
    pad = (-t) % n
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return feats, mask


def encode_seq_parallel(params: nn.Params, feats: jnp.ndarray,
                        mask: jnp.ndarray, cfg: paraformer.ParaformerConfig,
                        mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """feats [B, T, input_dim] (T divisible by mesh.shape[axis]),
    mask [B, T] → encoder states [B, T, d_model], T sharded over `axis`.

    Equivalent to `paraformer.encode` (tests/test_seq_parallel.py locks
    sharded == single-device to fp tolerance); the caller feeds the result
    straight into the predictor/CIF/decoder — under jit XLA inserts
    whatever resharding those need.
    """
    n = mesh.shape[axis]
    b, t, d_in = feats.shape
    assert t % n == 0, f"T={t} not divisible by mesh axis {axis}={n}"
    x = feats * (cfg.d_model ** 0.5)
    x = x + nn.sinusoidal_posenc(t, d_in)[None]

    enc = params["encoder"]
    pspecs = jax.tree.map(lambda _: P(), enc)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, P(None, axis, None), P(None, None)),
             out_specs=P(None, axis, None), check_vma=False)
    def run(enc_params, xb, mask_full):
        tb = xb.shape[1]
        idx = jax.lax.axis_index(axis)
        att_mask = mask_full[:, None, :]                     # [B, 1, T]
        for i, layer in enumerate(enc_params["layers"]):
            h = nn.layernorm(layer["norm1"], xb)
            qkv = nn.linear(layer["attn"]["qkv"], h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
            mem_full = nn.fsmn_block(
                layer["attn"]["fsmn"], v_full,
                nn.sanm_pad(cfg.kernel_size, cfg.sanm_shift), mask_full)
            mem = jax.lax.dynamic_slice_in_dim(mem_full, idx * tb, tb, 1)
            att = nn.attend(nn._split_heads(q, cfg.n_heads),
                            nn._split_heads(k_full, cfg.n_heads),
                            nn._split_heads(v_full, cfg.n_heads), att_mask)
            hb = nn.linear(layer["attn"]["out"],
                           nn._merge_heads(att)) + mem
            xb = hb if i == 0 else xb + hb   # no residual when d_in≠d_model
            xb = xb + nn.ffn(layer["ffn"], nn.layernorm(layer["norm2"], xb))
        xb = nn.layernorm(enc_params["after_norm"], xb)
        mask_blk = jax.lax.dynamic_slice_in_dim(mask_full, idx * tb, tb, 1)
        return xb * mask_blk[..., None]

    return run(enc, x, mask)


def transcribe_long_forward(params: nn.Params, feats: jnp.ndarray,
                            feat_lens: jnp.ndarray, k_max: int,
                            cfg: paraformer.ParaformerConfig, mesh: Mesh,
                            axis: str = "data"):
    """Full long-form forward: sequence-parallel encode, then the standard
    predictor → CIF → decoder on the (resharded-by-XLA) encoder states.
    Jit this whole function with the mesh's sharding context."""
    t = feats.shape[1]
    mask = nn.length_mask(feat_lens, t)
    feats, mask = pad_to_blocks(feats, mask, mesh.shape[axis])
    enc = encode_seq_parallel(params, feats, mask, cfg, mesh, axis)
    alphas = paraformer.predictor_alphas(params, enc, mask, cfg)
    embeds, token_count, _, _, _ = paraformer.cif(
        enc, alphas, k_max, cfg.predictor_tail_threshold)
    tok_mask = nn.length_mask(token_count, k_max)
    logits = paraformer.decode(params, embeds, tok_mask, enc, mask, cfg)
    tokens = jnp.argmax(logits, axis=-1) * tok_mask.astype(jnp.int32)
    return {"tokens": tokens, "token_count": token_count}
