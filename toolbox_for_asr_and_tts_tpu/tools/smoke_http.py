"""HTTP smoke test (reference `test_http.py` equivalent, which the snapshot
references but does not ship — survey §0).

Probes both services end-to-end: health, batch ASR with a synthetic tone,
and a full TTS job round-trip.

    python -m toolbox_for_asr_and_tts_tpu.tools.smoke_http \
        [--voice http://localhost:7701] [--tts http://localhost:19001]
"""
from __future__ import annotations

import argparse
import base64
import json
import sys
import time

import numpy as np


def _tone(secs=1.0):
    t = np.arange(int(16000 * secs)) / 16000
    return (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)


def smoke_voice(base: str) -> dict:
    import httpx
    from ..utils.audio import encode_wav_bytes
    out = {}
    r = httpx.get(f"{base}/health", timeout=30)
    out["health"] = r.json()
    b64 = base64.b64encode(encode_wav_bytes(_tone(), 16000)).decode()
    r = httpx.post(f"{base}/api/v1/voice/asr",
                   json={"audio_data": b64, "use_wake": False,
                         "use_llm": False},
                   timeout=300)
    r.raise_for_status()
    out["asr"] = r.json()
    return out


def smoke_tts(base: str) -> dict:
    import httpx
    out = {}
    r = httpx.get(f"{base}/health", timeout=30)
    out["health"] = r.json()
    r = httpx.post(f"{base}/api/v1/tts/start",
                   json={"text": "你好。合成测试。"}, timeout=30)
    r.raise_for_status()
    job_id = r.json()["job_id"]
    for _ in range(600):
        body = httpx.get(f"{base}/api/v1/tts/result/{job_id}",
                         timeout=30).json()
        if body["status"] in ("completed", "error"):
            break
        time.sleep(0.5)
    out["tts"] = {"status": body["status"],
                  "audio_bytes": len(base64.b64decode(
                      body.get("audio_base64") or b""))}
    httpx.request("DELETE", f"{base}/api/v1/tts/jobs/{job_id}", timeout=30)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voice", default="http://localhost:7701")
    ap.add_argument("--tts", default="http://localhost:19001")
    ap.add_argument("--skip-voice", action="store_true")
    ap.add_argument("--skip-tts", action="store_true")
    args = ap.parse_args()
    report = {}
    ok = True
    if not args.skip_voice:
        try:
            report["voice"] = smoke_voice(args.voice)
        except Exception as e:
            report["voice"] = {"error": str(e)}
            ok = False
    if not args.skip_tts:
        try:
            report["tts"] = smoke_tts(args.tts)
            ok = ok and report["tts"]["tts"]["status"] == "completed"
        except Exception as e:
            report["tts"] = {"error": str(e)}
            ok = False
    print(json.dumps(report, ensure_ascii=False))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
