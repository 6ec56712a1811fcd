"""Serving warmup: pre-compile the bucket set so first requests never wait.

The reference preloads model weights at startup (voice-service/app/
main.py:18-70 lifespan thread pool). On TPU the analogous cold-start cost is
XLA compilation per shape bucket; this tool drives each engine through its
serving buckets with dummy inputs, populating the jit caches (and, via JAX's
persistent compilation cache if configured, surviving restarts).

    python -m toolbox_for_asr_and_tts_tpu.tools.warmup [--seconds 1 2 4 10]
"""
from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

logger = logging.getLogger("toolbox.warmup")


def warmup_asr(engines, seconds, batch_sizes=(1,)) -> dict:
    reco = engines.diarizer.recognizer
    timings = {}
    for s in seconds:
        for b in batch_sizes:
            wavs = [np.zeros(int(16000 * s), np.float32)] * b
            t0 = time.perf_counter()
            reco.transcribe(wavs)
            # the two-phase rescoring program (hotwords / LM fusion) is
            # compiled explicitly: real checkpoints fire ~0 CIF tokens on
            # silence, so a dummy-hotword transcribe would never reach it
            reco.warmup_rescoring(b, int(16000 * s))
            timings[f"asr_{s}s_b{b}"] = round(time.perf_counter() - t0, 2)
    return timings


def warmup_tts(synth, texts=("你好。", "一" * 20 + "。")) -> dict:
    timings = {}
    for i, t in enumerate(texts):
        t0 = time.perf_counter()
        synth.synthesize(t)
        timings[f"tts_{i}"] = round(time.perf_counter() - t0, 2)
    return timings


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", nargs="*", type=float, default=[1, 2, 4, 10])
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--tts", action="store_true")
    args = ap.parse_args()
    from ..service.engines import build_engines
    engines = build_engines(args.model_dir)
    report = warmup_asr(engines, args.seconds)
    if args.tts:
        from ..tts.synthesizer import Synthesizer
        report.update(warmup_tts(Synthesizer.random(tiny=False)))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
