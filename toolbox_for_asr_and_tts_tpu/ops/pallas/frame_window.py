"""Pallas kernel: fused frame/DC-remove/preemphasis/window for fbank.

The frontend's first stage turns raw audio [B, T] into framed, windowed
rows [B, T_frames, n_fft]. Frames overlap (400-sample window, 160-sample
shift), which `BlockSpec` can't express (block index maps are
block-granular), so the kernel DMAs each frame-block's audio span from HBM
into VMEM scratch manually (guide: "Async DMA" + scratch patterns) and then
performs DC removal, pre-emphasis and Hamming windowing in one VMEM pass —
the fused alternative to the XLA gather + 3 elementwise ops in
`ops/frontend.fbank`.

TPU-lowering constraints honored: the audio stays in HBM (ANY would let the
compiler pull it into VMEM, breaking the manual DMA), DMA spans and slice
starts are 128-lane multiples, and output rows are written as full lanes
(concatenate instead of scatter/partial stores).

STATUS: numerically identical to the jnp path and tested in interpret mode;
manual HBM→VMEM DMA is unsupported on this environment's remote-executed
TPU runtime (kernel-initiated copies fail with a backend Internal error), so
the production frontend uses the XLA gather path and the FSMN Pallas kernel
(ops/pallas/fsmn_conv.py, DMA-free) carries the custom-kernel fast path.
Re-validate on directly-attached TPUs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_BLOCK = 8


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(audio_hbm, win_ref, out_ref, scratch, sem,
            *, frame_len: int, frame_shift: int, n_fft: int,
            preemphasis: float, remove_dc: bool, frames_per_block: int,
            span_pad: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    start = j * frames_per_block * frame_shift  # multiple of 128 for fs=16k
    dma = pltpu.make_async_copy(
        audio_hbm.at[i, pl.ds(start, span_pad)], scratch.at[0, :], sem)
    dma.start()
    dma.wait()
    rows = []
    for f in range(frames_per_block):  # static unroll
        fr = scratch[0, f * frame_shift: f * frame_shift + frame_len]
        if remove_dc:
            fr = fr - jnp.mean(fr)
        if preemphasis:
            prev = jnp.concatenate([fr[:1], fr[:-1]])
            fr = fr - preemphasis * prev
        fr = fr * win_ref[0, :]
        rows.append(jnp.concatenate(
            [fr, jnp.zeros((n_fft - frame_len,), jnp.float32)]))
    out_ref[0] = jnp.stack(rows)


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
    span_pad = _round_up(span, 128)
    # pad audio so every block's (aligned) DMA span is in-bounds
    need = (n_blocks - 1) * fpb * frame_shift + span_pad
    if audio.shape[1] < need:
        audio = jnp.pad(audio, ((0, 0), (0, need - audio.shape[1])))
    out = pl.pallas_call(
        functools.partial(_kernel, frame_len=frame_len,
                          frame_shift=frame_shift, n_fft=n_fft,
                          preemphasis=preemphasis, remove_dc=remove_dc,
                          frames_per_block=fpb, span_pad=span_pad),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # DMA'd manually per block
            pl.BlockSpec((1, frame_len), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, fpb, n_fft), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * fpb, n_fft),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, span_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio, window[None, :])
    return out[:, :t_frames]
