"""Pallas kernel: fused frame/DC-remove/preemphasis/window for fbank.

The frontend's first stage turns raw audio [B, T] into framed, windowed
rows [B, T_frames, n_fft]. Frames overlap (400-sample window, 160-sample
shift), which `BlockSpec` can't express (block index maps are
block-granular), so the kernel DMAs each frame-block's audio span from HBM
into VMEM scratch manually (guide: "Async DMA" + scratch patterns) and then
performs DC removal, pre-emphasis and Hamming windowing in one VMEM pass —
the fused alternative to the XLA gather + 3 elementwise ops in
`ops/frontend.fbank`.

The kernel is numerically identical to the jnp path (tested in interpret
mode on CPU); `fbank` uses it when `frontend.USE_PALLAS` is on and the
backend is TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_BLOCK = 8


def _kernel(audio_hbm, win_ref, out_ref, scratch, sem,
            *, frame_len: int, frame_shift: int, n_fft: int,
            preemphasis: float, remove_dc: bool, frames_per_block: int):
    j = pl.program_id(1)
    span = (frames_per_block - 1) * frame_shift + frame_len
    start = j * frames_per_block * frame_shift
    dma = pltpu.make_async_copy(
        audio_hbm.at[0, pl.ds(start, span)], scratch.at[0, :span], sem)
    dma.start()
    dma.wait()
    for f in range(frames_per_block):  # static unroll (8 frames/block)
        fr = scratch[0, pl.ds(f * frame_shift, frame_len)]
        if remove_dc:
            fr = fr - jnp.mean(fr)
        if preemphasis:
            prev = jnp.concatenate([fr[:1], fr[:-1]])
            fr = fr - preemphasis * prev
        fr = fr * win_ref[0, :]
        row = jnp.zeros((n_fft,), jnp.float32).at[:frame_len].set(fr)
        out_ref[0, f, :] = row


@functools.partial(jax.jit, static_argnames=(
    "t_frames", "frame_len", "frame_shift", "n_fft", "preemphasis",
    "remove_dc", "interpret"))
def frame_window(audio: jnp.ndarray, window: jnp.ndarray, t_frames: int,
                 frame_len: int, frame_shift: int, n_fft: int,
                 preemphasis: float = 0.97, remove_dc: bool = True,
                 interpret: bool = False) -> jnp.ndarray:
    """audio [B, T] → framed+windowed [B, t_frames, n_fft] (zero-padded)."""
    b = audio.shape[0]
    fpb = FRAMES_PER_BLOCK
    n_blocks = (t_frames + fpb - 1) // fpb
    span = (fpb - 1) * frame_shift + frame_len
    # pad audio so every block's DMA span is in-bounds
    need = (n_blocks - 1) * fpb * frame_shift + span
    if audio.shape[1] < need:
        audio = jnp.pad(audio, ((0, 0), (0, need - audio.shape[1])))
    out = pl.pallas_call(
        functools.partial(_kernel, frame_len=frame_len,
                          frame_shift=frame_shift, n_fft=n_fft,
                          preemphasis=preemphasis, remove_dc=remove_dc,
                          frames_per_block=fpb),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, audio.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((1, frame_len), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, fpb, n_fft), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * fpb, n_fft),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, span + frame_shift), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio, window[None, :])
    return out[:, :t_frames]
