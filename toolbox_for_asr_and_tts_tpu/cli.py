"""Command-line tools.

    python -m toolbox_for_asr_and_tts_tpu.cli transcribe file.wav [...]
    python -m toolbox_for_asr_and_tts_tpu.cli tts "文本" -o out.wav
    python -m toolbox_for_asr_and_tts_tpu.cli serve-voice / serve-tts
    python -m toolbox_for_asr_and_tts_tpu.cli demo recording.wav

The transcribe path is BASELINE config #1 (survey §7 stage 3): one WAV →
fbank → Paraformer → text on the local accelerator.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys


def cmd_transcribe(args) -> None:
    from .service.engines import build_engines
    engines = build_engines(args.model_dir, use_mesh=not args.no_mesh)
    for path in args.wavs:
        sents = engines.diarizer.diarize(_load(path))
        text = "".join(s.text for s in sents)
        if args.itn:
            from .asr.itn import apply_itn
            text = apply_itn(text)
        print(json.dumps({
            "file": path,
            "text": text,
            "sentences": [vars(s) for s in sents],
        }, ensure_ascii=False))


def cmd_tts(args) -> None:
    from .runtime.registry import resolve
    from .tts.synthesizer import Synthesizer
    from .utils.audio import write_wav
    synth = None
    if not args.tiny:
        d = resolve("tts", args.model_dir)
        if d is not None:
            try:
                synth = Synthesizer.from_model_dir(d, voice=args.voice)
            except Exception:
                logging.getLogger("toolbox.cli").exception(
                    "FAILED loading TTS checkpoint at %s — RANDOM weights", d)
    if synth is None:
        synth = Synthesizer.random(tiny=args.tiny)
    if args.stream:
        # streaming path: report time-to-first-audio; the WAV on disk is
        # the same samples the WS endpoint would deliver incrementally
        import time as _t
        import numpy as np
        t0 = _t.perf_counter()
        ttfa = None
        chunks = []
        done = None
        for ev in synth.synthesize_stream(args.text, voice=args.voice):
            if len(ev["audio"]) and ttfa is None:
                ttfa = _t.perf_counter() - t0
            chunks.append(ev["audio"])
            if ev["event"] == "done":
                done = ev
        wav = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        write_wav(args.output, wav, synth.sample_rate)
        print(json.dumps({"output": args.output, "rtf": done["rtf"],
                          "seconds": len(wav) / synth.sample_rate,
                          "time_to_first_audio_s": round(ttfa or 0.0, 4),
                          "segments": done["segments"]}, ensure_ascii=False))
        return
    res = synth.synthesize(args.text, voice=args.voice)
    write_wav(args.output, res.wav, res.sample_rate)
    print(json.dumps({"output": args.output, "rtf": res.rtf,
                      "seconds": len(res.wav) / res.sample_rate,
                      "segments": res.segments}, ensure_ascii=False))


def cmd_serve_voice(args) -> None:
    from .service.voice_app import main as voice_main
    voice_main()


def cmd_serve_tts(args) -> None:
    from .service.tts_app import main as tts_main
    tts_main()


def cmd_demo(args) -> None:
    from .demo.full_voice_demo import main as demo_main
    sys.argv = ["full_voice_demo", args.wav]
    demo_main()


def _load(path: str):
    from .utils.audio import ensure_mono_16k, read_wav
    x, sr = read_wav(path)
    return ensure_mono_16k(x, sr)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(prog="toolbox_for_asr_and_tts_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transcribe", help="offline ASR on WAV files")
    t.add_argument("wavs", nargs="+")
    t.add_argument("--model-dir", default=None)
    t.add_argument("--itn", action="store_true")
    t.add_argument("--no-mesh", action="store_true")
    t.set_defaults(fn=cmd_transcribe)

    s = sub.add_parser("tts", help="synthesize text to WAV")
    s.add_argument("text")
    s.add_argument("-o", "--output", default="tts_out.wav")
    s.add_argument("--voice", default="zhitian_emo")
    s.add_argument("--model-dir", default=None)
    s.add_argument("--tiny", action="store_true")
    s.add_argument("--stream", action="store_true",
                   help="streaming synthesis; prints time-to-first-audio")
    s.set_defaults(fn=cmd_tts)

    sub.add_parser("serve-voice", help="run the voice service") \
        .set_defaults(fn=cmd_serve_voice)
    sub.add_parser("serve-tts", help="run the TTS service") \
        .set_defaults(fn=cmd_serve_tts)

    d = sub.add_parser("demo", help="file-driven full voice demo")
    d.add_argument("wav")
    d.set_defaults(fn=cmd_demo)

    r = sub.add_parser(
        "rehearse",
        help="real-checkpoint mount rehearsal: strict-convert all families,"
             " boot both services, drive golden inputs, emit a report")
    r.add_argument("models_dir")
    r.add_argument("--report", default=None)
    r.add_argument("--reconvert", action="store_true")
    r.add_argument("--no-serve", action="store_true")
    r.add_argument("--golden-wav", default=None)
    r.add_argument("--lenient", action="store_true")

    def cmd_rehearse(args) -> None:
        from .tools.rehearse import main as rehearse_main
        argv = [args.models_dir]
        for flag in ("report", "golden_wav"):
            v = getattr(args, flag)
            if v:
                argv += [f"--{flag.replace('_', '-')}", v]
        for flag in ("reconvert", "no_serve", "lenient"):
            if getattr(args, flag):
                argv.append(f"--{flag.replace('_', '-')}")
        rehearse_main(argv)

    r.set_defaults(fn=cmd_rehearse)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
