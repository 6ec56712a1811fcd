"""Pallas kernel: FSMN depthwise memory convolution (+ residual).

The FSMN memory block — y[t] = x[t] + Σ_k w[k] · x[t+k−pad_l] per channel —
appears in every SAN-M attention layer (50× in the Paraformer encoder, 16×
in its decoder), in FSMN-VAD and in the KWS model. Depthwise time-convs are
VPU work, and XLA lowers them through its general conv path; this kernel
instead computes the taps as K shifted elementwise multiply-adds over a
time-haloed block in VMEM — the natural VPU formulation.

Time blocks overlap by the conv halo, which `BlockSpec` index maps cannot
express (they are block-granular), so the haloed slice is DMA'd from
HBM/ANY into VMEM scratch per grid step (guide: Async DMA + scratch).

Numerically identical to `ops.nn.fsmn_block` (tested interpret-mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 128
TILE_D = 128


def _kernel(halo_hbm, w_ref, x_ref, out_ref, scratch, sem, *, kernel: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    l = pl.program_id(2)
    span = TILE_T + kernel - 1
    dma = pltpu.make_async_copy(
        halo_hbm.at[i, pl.ds(j * TILE_T, span), pl.ds(l * TILE_D, TILE_D)],
        scratch.at[:span, :], sem)
    dma.start()
    dma.wait()
    acc = x_ref[0]  # residual [TILE_T, TILE_D]
    for k in range(kernel):  # static unroll over taps
        acc = acc + scratch[pl.ds(k, TILE_T), :] * w_ref[pl.ds(k, 1), :]
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("pad_l", "pad_r", "interpret"))
def fsmn_depthwise(x: jnp.ndarray, w: jnp.ndarray, pad_l: int, pad_r: int,
                   interpret: bool = False) -> jnp.ndarray:
    """x [B, T, D], w [D, 1, K] (torch depthwise layout) → x + conv(x).

    pad_l + pad_r must equal K − 1 (length-preserving, as all FSMN uses are).
    """
    b, t, d = x.shape
    k = w.shape[2]
    assert pad_l + pad_r == k - 1, "FSMN conv must be length-preserving"
    t_pad = ((t + TILE_T - 1) // TILE_T) * TILE_T
    d_pad = ((d + TILE_D - 1) // TILE_D) * TILE_D
    x_p = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))
    halo = jnp.pad(x_p, ((0, 0), (pad_l, pad_r), (0, 0)))
    wt = jnp.pad(w[:, 0, :].T, ((0, 0), (0, d_pad - d)))  # [K, D_pad]
    grid = (b, t_pad // TILE_T, d_pad // TILE_D)
    span = TILE_T + k - 1
    out = pl.pallas_call(
        functools.partial(_kernel, kernel=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # haloed input (DMA'd)
            pl.BlockSpec((k, TILE_D), lambda i, j, l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, TILE_D), lambda i, j, l: (i, j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, TILE_D), lambda i, j, l: (i, j, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d_pad), x_p.dtype),
        scratch_shapes=[
            pltpu.VMEM((span, TILE_D), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(halo, wt, x_p)
    return out[:, :t, :d]
