"""Reproducible micro-profiles behind the RESULTS.md round-4 numbers.

    python benchmarks/microprofile.py link     # tunnel floor accounting
    python benchmarks/microprofile.py packed   # packed-tick A/B (slow)
    python benchmarks/microprofile.py int16    # int16-transfer A/B

`link` measures the physics the one-shot ASR path is bound by: the bare
dispatch+fetch round trip and the 10 s audio upload (f32 vs int16).
`packed` rebuilds the chunked ticker at 64-of-128 occupancy vs the
full-width masked step (each config pays its own multi-minute tunnel
compile — budget ~25 min). `int16` A/Bs PARAFORMER_TRANSFER_INT16 on the
single-utterance offline path. All run on the real chip; medians over
warmed iterations; first-call param upload excluded.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _med(f, n=9, warm=2):
    for _ in range(warm):
        f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def profile_link() -> None:
    import jax
    import jax.numpy as jnp
    one = jnp.asarray(1.0)
    tiny = jax.jit(lambda x: x + 1).lower(one).compile()
    print(f"bare dispatch+fetch RT: "
          f"{_med(lambda: np.asarray(tiny(one))) * 1e3:.1f} ms")
    buf = np.random.default_rng(0).standard_normal(160000).astype(np.float32)
    buf16 = (buf * 32767).astype(np.int16)

    def up(a):
        # block_until_ready does not sync under axon (CLAUDE.md): chase the
        # upload with a tiny fetch to force the round trip
        jnp.asarray(a)
        np.asarray(tiny(one))

    print(f"upload 640KB f32 + RT: {_med(lambda: up(buf)) * 1e3:.1f} ms")
    print(f"upload 320KB i16 + RT: {_med(lambda: up(buf16)) * 1e3:.1f} ms")


def profile_int16() -> None:
    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    reco = Recognizer.random(use_mesh=False, param_dtype=jnp.bfloat16)
    t = np.arange(160000) / 16000
    wav = (np.clip(np.round(0.3 * np.sin(2 * np.pi * 220 * t) * 32768),
                   -32768, 32767) / 32768.0).astype(np.float32)
    for flag in (False, True, False, True):   # interleave against drift
        reco._int16_transfer = flag
        ms = _med(lambda: reco.transcribe([wav]), n=9) * 1e3
        print(f"transcribe 10 s, int16={flag}: {ms:.1f} ms "
              f"(RTF {ms / 1e4:.5f})")


def profile_packed() -> None:
    import jax
    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)
    cfg = paraformer.ParaformerConfig()
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    rng = np.random.default_rng(0)

    def run(capacity, occupancy, bucketed):
        t = BatchedChunkedASR(params, cfg,
                              po.OnlineConfig(tokens_per_chunk=4),
                              capacity=capacity, partials=True,
                              pipelined=False, bucketed=bucketed)
        slots = [t.join() for _ in range(occupancy)]
        chunk = {s: (rng.standard_normal(3840) * 0.1).astype(np.float32)
                 for s in slots}
        ms = _med(lambda: t.tick(chunk), n=12, warm=2) * 1e3
        print(f"capacity={capacity} occ={occupancy} "
              f"packed={t.bucketed}: median tick {ms:.1f} ms")

    run(128, 64, True)     # packed prefix @ 64-of-128
    run(128, 64, False)    # full-width masked (the capacity tax)
    run(64, 64, True)      # the round-3 proven full config


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "link"
    {"link": profile_link, "int16": profile_int16,
     "packed": profile_packed}[mode]()
