"""Pipeline-parallel SAN-M encoding (GPipe schedule over the model axis).

Completes the mesh story next to dp (batch rows), tp (parameter shardings)
and sp (time-axis shard_map): when a model's layers do NOT fit one chip,
stack them into S stages across the mesh's "model" axis and stream M
microbatches through with `jax.lax.ppermute` hops — the idiomatic TPU
formulation (no NCCL-style send/recv code; the schedule is a `lax.scan`
and autodiff generates the reverse-direction permutes for the backward
pass, so the same function serves fine-tuning).

Scope: the homogeneous encoder layers 1..N-1 pipeline (layer 0 has
input_dim ≠ d_model and runs replicated before the pipeline, as does
everything after the encoder). Bubble fraction is (S-1)/(M+S-1); pick
M ≥ 4·S in real use. Equivalence (outputs AND gradients) against the
plain sequential encoder is locked in tests/test_pipeline_parallel.py.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import paraformer
from ..ops import nn


def stack_stage_params(enc_layers: list, n_stages: int) -> Any:
    """Encoder layers 1..N-1 → pytree with leading [S, L/S] axes.

    Layer 0 (input projection width) stays out; the remaining N-1 layers
    must divide evenly into `n_stages`."""
    rest = enc_layers[1:]
    if len(rest) % n_stages != 0:
        raise ValueError(f"{len(rest)} pipelined layers do not divide into "
                         f"{n_stages} stages")
    per = len(rest) // n_stages
    stages = [rest[s * per:(s + 1) * per] for s in range(n_stages)]
    # [S][L/S]{leaf} → {leaf [S, L/S, ...]}
    return jax.tree.map(lambda *xs: jnp.stack(
        [jnp.stack(xs[s * per:(s + 1) * per]) for s in range(n_stages)]),
        *rest)


def _apply_stage(stage_params: Any, x: jnp.ndarray, mask: jnp.ndarray,
                 cfg: paraformer.ParaformerConfig) -> jnp.ndarray:
    """Apply this stage's [L/S] stacked layers with a lax.scan."""
    def one(x, layer):
        h = nn.layernorm(layer["norm1"], x)
        h = nn.sanm_attention(layer["attn"], h, cfg.n_heads, mask,
                              cfg.kernel_size, cfg.sanm_shift)
        x = x + h
        x = x + nn.ffn(layer["ffn"], nn.layernorm(layer["norm2"], x))
        return x, None

    out, _ = jax.lax.scan(one, x, stage_params)
    return out


def encode_pipelined(params: nn.Params, stage_params: Any,
                     feats: jnp.ndarray, mask: jnp.ndarray,
                     cfg: paraformer.ParaformerConfig, mesh: Mesh,
                     n_micro: int, axis: str = "model") -> jnp.ndarray:
    """Sequential-equivalent encoder forward with layers 1..N-1 pipelined.

    feats [B, T, input_dim] (B divisible by n_micro), mask [B, T].
    `stage_params` from `stack_stage_params` — its leading axis shards over
    `axis`. Differentiable: jax.grad through this reproduces the plain
    encoder's gradients (reverse ppermutes are autodiff-generated).
    """
    s_stages = mesh.shape[axis]
    b, t, _ = feats.shape
    assert b % n_micro == 0, f"batch {b} not divisible by {n_micro} microbatches"

    # replicated prologue: scaling, posenc, the width-changing first layer
    x = feats * (cfg.d_model ** 0.5)
    x = x + nn.sinusoidal_posenc(t, feats.shape[-1])[None]
    layer0 = params["encoder"]["layers"][0]
    h = nn.layernorm(layer0["norm1"], x)
    h = nn.sanm_attention(layer0["attn"], h, cfg.n_heads, mask,
                          cfg.kernel_size, cfg.sanm_shift)
    x = h  # no residual across the width change
    x = x + nn.ffn(layer0["ffn"], nn.layernorm(layer0["norm2"], x))

    mb = b // n_micro
    xm = x.reshape(n_micro, mb, t, cfg.d_model)
    maskm = mask.reshape(n_micro, mb, t)

    stage_specs = jax.tree.map(lambda _: P(axis), stage_params)
    # dp × pp composition: microbatch ROWS shard over the data axis while
    # stages shard over the model axis — each device runs its stage on its
    # slice of every microbatch
    data_axis = next((a for a in mesh.axis_names if a != axis), None)
    if data_axis and (b // n_micro) % mesh.shape[data_axis] == 0:
        row_spec = P(None, data_axis)
    else:  # microbatch rows don't divide over data → replicate rows
        row_spec = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(stage_specs, row_spec, row_spec), out_specs=row_spec,
             check_vma=False)
    def pipe(stage_p, xm, maskm):
        stage_p = jax.tree.map(lambda a: a[0], stage_p)  # drop sharded lead
        sid = jax.lax.axis_index(axis)
        n_ticks = n_micro + s_stages - 1
        buf0 = jnp.zeros_like(xm[0])

        def tick(buf, ti):
            inject = xm[jnp.clip(ti, 0, n_micro - 1)]
            x_in = jnp.where(sid == 0, inject, buf)
            m_in = maskm[jnp.clip(ti - sid, 0, n_micro - 1)]
            y = _apply_stage(stage_p, x_in, m_in, cfg)
            fwd = [(i, i + 1) for i in range(s_stages - 1)]
            nxt = (jax.lax.ppermute(y, axis, fwd) if fwd else y)
            return nxt, y

        _, ys = jax.lax.scan(tick, buf0, jnp.arange(n_ticks))
        # last stage emitted microbatch m at tick m + S - 1; psum over the
        # (otherwise zero) stage axis replicates the result everywhere
        outs = jnp.where(sid == s_stages - 1,
                         ys[s_stages - 1:], jnp.zeros_like(ys[s_stages - 1:]))
        return jax.lax.psum(outs, axis)

    y = pipe(stage_params, xm, maskm).reshape(b, t, cfg.d_model)
    y = nn.layernorm(params["encoder"]["after_norm"], y)
    return y * mask[..., None]
