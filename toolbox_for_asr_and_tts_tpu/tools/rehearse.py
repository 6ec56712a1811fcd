"""One-command real-checkpoint mount rehearsal.

    python -m toolbox_for_asr_and_tts_tpu.cli rehearse <models_dir>

When a real ModelScope model tree finally mounts (reference layout
`<models_dir>/<damo-package-name>/…`, voice_interface.py:593-618), this
command makes day-one success mechanical:

1. **Convert every family strictly** through the same loaders the services
   use (geometry pinned from each dir's own config files), reporting per
   family: converted/missing/unmapped tensor names (`--reconvert` clears
   npz caches first so coverage is re-measured).
2. **Boot both services in-process** on the converted weights and drive
   golden audio/text through the REAL surfaces: REST `POST /asr`, the WS
   streaming session FSM, and a TTS job.
3. **Emit a JSON report artifact** (`--report`, default
   `<models_dir>/rehearsal_report.json`).

Exit status is non-zero when any present family has missing or unmapped
tensors (strict mode; `--lenient` downgrades to warnings) or a service
drive fails. Families without a mounted dir are reported `absent` and do
not fail the run.
"""
from __future__ import annotations

import argparse
import base64
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger("toolbox.rehearse")


def _clear_caches(d: str) -> None:
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".npz") and ".jax" in f or f == "jax_params.npz":
                try:
                    os.unlink(os.path.join(root, f))
                except OSError:
                    pass
            if f.endswith(".jax.cfg.json"):
                try:
                    os.unlink(os.path.join(root, f))
                except OSError:
                    pass


def _loaders():
    from ..asr.recognizer import Recognizer
    from ..asr.speaker import SpeakerVerifier
    from ..models import fsmn_vad
    from ..models.ct_transformer import Punctuator
    from ..models.kws_ctc import KeywordSpotter
    from ..tts.synthesizer import Synthesizer
    return [
        ("paraformer_offline",
         lambda d: Recognizer.from_model_dir(d, use_mesh=False)),
        ("paraformer_streaming",
         lambda d: Recognizer.from_model_dir(d, use_mesh=False)),
        ("fsmn_vad", fsmn_vad.from_model_dir),
        ("sv", SpeakerVerifier.from_model_dir),
        ("punc", Punctuator.from_model_dir),
        ("kws", KeywordSpotter.from_model_dir),
        ("tts", Synthesizer.from_model_dir),
    ]


def convert_families(models_dir: str, reconvert: bool = False
                     ) -> Dict[str, Any]:
    from ..runtime import checkpoints as ckpt
    from ..runtime.registry import resolve

    out: Dict[str, Any] = {}
    for key, load in _loaders():
        d = resolve(key, models_dir)
        if d is None:
            out[key] = {"status": "absent"}
            continue
        if reconvert:
            _clear_caches(d)
        ckpt.CONVERT_REPORTS.clear()
        entry: Dict[str, Any] = {"dir": d}
        t0 = time.perf_counter()
        try:
            load(d)
            entry["status"] = "converted"
        except Exception as e:
            entry["status"] = "failed"
            entry["error"] = f"{type(e).__name__}: {e}"
            logger.exception("rehearsal: %s conversion FAILED", key)
        entry["seconds"] = round(time.perf_counter() - t0, 2)
        reports = list(ckpt.CONVERT_REPORTS)
        if entry["status"] == "converted" and reports:
            # a strict conversion that SUCCEEDED has missing == []; reports
            # carrying missing names are template probes the loader tried
            # and abandoned (e.g. the offline loader's BiCIF-first attempt)
            good = [r for r in reports if not r["missing"]] or reports[-1:]
            entry["n_rules"] = sum(r["n_rules"] for r in good)
            entry["n_converted"] = sum(r["n_converted"] for r in good)
            entry["missing"] = [m for r in good for m in r["missing"]]
            entry["unmapped"] = [u for r in good for u in r["unmapped"]]
        elif entry["status"] == "converted":
            # loaded from an existing npz cache — coverage not re-measured
            entry["status"] = "cached"
        elif reports:  # failed: surface the last attempt's gap analysis
            entry["missing"] = reports[-1]["missing"]
            entry["unmapped"] = reports[-1]["unmapped"]
        out[key] = entry
    return out


# ------------------------------------------------------------ service drive
def _speech(secs: float = 0.4, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    return (0.3 * np.sin(2 * np.pi * 260 * t)
            + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


def _start_app(app):
    import asyncio
    import threading

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0, ready=asyncio.Event()))
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(200):
        if getattr(app, "port", None):
            return app.port, loop
        time.sleep(0.05)
    raise RuntimeError("service did not start")


def drive_services(models_dir: str, golden_wav: Optional[str] = None,
                   golden_text: str = "你好，小护。今天天气不错。"
                   ) -> Dict[str, Any]:
    """Boot voice + TTS apps on the mounted weights and push golden inputs
    through REST + WS + TTS. Returns the observed outputs (the parity
    artifact a human checks against the reference deployment)."""
    import urllib.request

    from ..service.engines import build_engines
    from ..service.tts_app import create_app as create_tts_app
    from ..service.voice_app import create_app as create_voice_app
    from ..tts.synthesizer import Synthesizer
    from ..utils.audio import encode_wav_bytes, read_wav, ensure_mono_16k

    os.environ.setdefault("VOICE_DISABLE_LLM", "1")
    report: Dict[str, Any] = {}

    if golden_wav and os.path.exists(golden_wav):
        x, sr = read_wav(golden_wav)
        wav = ensure_mono_16k(x, sr)
    else:
        wav = np.concatenate([_speech(seed=i) for i in range(5)])
    wav_b64 = base64.b64encode(encode_wav_bytes(wav, 16000)).decode()

    # the apps and their hubs are torn down in the finally below: a
    # rehearsal must not leak serving threads (and their lazy compiles)
    # into the rest of the process — a leaked finalize-hub compiling while
    # another thread compiled segfaulted XLA:CPU in the round-4 full suite
    engines = build_engines(models_dir, use_mesh=False)
    vapp = create_voice_app(engines=engines)
    vport, vloop = _start_app(vapp)
    tloop = None

    try:
        # REST batch ASR
        req = urllib.request.Request(
            f"http://127.0.0.1:{vport}/api/v1/voice/asr",
            data=json.dumps({"audio_data": wav_b64, "use_wake": False,
                             "use_llm": False}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            rest = json.loads(r.read())
        report["rest_asr"] = {"success": rest.get("success"),
                              "text": rest.get("text")}

        # WS streaming cycle (wake/SV off): speech then silence → result frame
        from websockets.sync.client import connect as ws_connect
        frames = []
        ws = ws_connect(f"ws://127.0.0.1:{vport}/api/v1/voice/asr/ws",
                        open_timeout=60, ping_interval=None)
        try:
            frames.append(json.loads(ws.recv(timeout=60))["type"])  # welcome
            ws.send(json.dumps({"use_wake": False, "use_sv": False,
                                "use_llm": False}))
            chunk = base64.b64encode(
                encode_wav_bytes(_speech(), 16000)).decode()
            sil = base64.b64encode(
                encode_wav_bytes(np.zeros(6400, np.float32), 16000)).decode()
            for b64 in [chunk] * 3 + [sil] * 7:
                ws.send(json.dumps({"audio_data": b64}))
            deadline = time.time() + 600
            ws_result = None
            while time.time() < deadline:
                try:
                    msg = json.loads(ws.recv(timeout=5))
                except TimeoutError:
                    continue
                if isinstance(msg, dict) and msg.get("type"):
                    frames.append(msg["type"])
                    if msg["type"] == "result":
                        ws_result = msg
                        break
        finally:
            ws.close()
        report["ws_asr"] = {"frames": frames,
                            "result": (ws_result or {}).get("text"),
                            "ok": ws_result is not None}

        # TTS job
        try:
            from ..runtime.registry import resolve
            tts_dir = resolve("tts", models_dir)
            synth = (Synthesizer.from_model_dir(tts_dir) if tts_dir
                     else Synthesizer.random(tiny=True))
            tapp = create_tts_app(synthesizer=synth)
            tport, tloop = _start_app(tapp)
            req = urllib.request.Request(
                f"http://127.0.0.1:{tport}/api/v1/tts/start",
                data=json.dumps({"text": golden_text,
                                 "voice": "zhitian_emo"}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                jid = json.loads(r.read())["job_id"]
            status: Dict[str, Any] = {}
            for _ in range(600):
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{tport}/api/v1/tts/result/{jid}",
                        timeout=120) as r:
                    status = json.loads(r.read())
                if status.get("status") in ("completed", "error"):
                    break
                time.sleep(0.5)
            report["tts"] = {"status": status.get("status"),
                             "audio_size": status.get("audio_size"),
                             "random_weights": tts_dir is None}
        except Exception as e:
            logger.exception("rehearsal: TTS drive failed")
            report["tts"] = {"status": "failed",
                             "error": f"{type(e).__name__}: {e}"}
    finally:
        # release the hubs' serving threads and both event loops
        try:
            engines.close()
        except Exception:
            logger.exception("rehearsal: engine teardown failed")
        for lp in (vloop, tloop):
            if lp is not None:
                try:
                    lp.call_soon_threadsafe(lp.stop)
                except Exception:
                    pass
    return report


def rehearse(models_dir: str, reconvert: bool = False, serve: bool = True,
             golden_wav: Optional[str] = None) -> Dict[str, Any]:
    report: Dict[str, Any] = {
        "models_dir": os.path.abspath(models_dir),
        "families": convert_families(models_dir, reconvert=reconvert),
    }
    if serve:
        report["service"] = drive_services(models_dir, golden_wav=golden_wav)
    bad = sorted(
        k for k, v in report["families"].items()
        if v.get("status") == "failed" or v.get("missing")
        or v.get("unmapped"))
    if serve:
        svc = report["service"]
        if not svc.get("rest_asr", {}).get("success"):
            bad.append("service:rest_asr")
        if not svc.get("ws_asr", {}).get("ok"):
            bad.append("service:ws_asr")
        if svc.get("tts", {}).get("status") != "completed":
            bad.append("service:tts")
    report["strict_failures"] = bad
    report["ok"] = not bad
    return report


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="real-checkpoint mount rehearsal (convert all families "
                    "strictly, boot both services, drive golden inputs)")
    ap.add_argument("models_dir")
    ap.add_argument("--report", default=None,
                    help="report path (default <models_dir>/rehearsal_report.json)")
    ap.add_argument("--reconvert", action="store_true",
                    help="clear converted-npz caches first")
    ap.add_argument("--no-serve", action="store_true",
                    help="conversion coverage only, skip the service drive")
    ap.add_argument("--golden-wav", default=None,
                    help="real WAV to drive through REST ASR")
    ap.add_argument("--lenient", action="store_true",
                    help="always exit 0; failures become warnings")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    report = rehearse(args.models_dir, reconvert=args.reconvert,
                      serve=not args.no_serve, golden_wav=args.golden_wav)
    path = args.report or os.path.join(args.models_dir,
                                       "rehearsal_report.json")
    try:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(report, f, ensure_ascii=False, indent=2)
        print(f"report: {path}", file=sys.stderr)
    except OSError:
        logger.warning("could not write report at %s", path)
    print(json.dumps(report, ensure_ascii=False))
    if not report["ok"] and not args.lenient:
        sys.exit(1)


if __name__ == "__main__":
    main()
