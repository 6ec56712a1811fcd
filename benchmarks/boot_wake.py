"""Wake-enabled boot-to-ready timing, cold vs warm persistent compile cache
(VERDICT-r4 weak #5; reference readiness-wait contract
voice-service/start.py:116-143).

Measures the REAL boot path (`launch.py::launch_voice` in a fresh process,
the deploy/voice-service Dockerfile CMD) at the wake-enabled shipped shape
(VOICE_KWS_AOT=1 → KwsHub pow-2 AOT warm at engine build), twice against the
same JAX_COMPILATION_CACHE_DIR:

- **cold**: empty cache dir — every hub/ticker program compiles;
- **warm**: second process, same dir — programs must load from disk
  (tests/test_compile_cache.py pins key stability on CPU; this measures the
  real-chip wall-clock win).

Per run it reports process-start → /health 200 (`ready_s`: engines built,
AOT done, server accepting) and process-start → first green `wakeup` frame
over a real WS client (`wake_s`). Output: ONE JSON line.

    python benchmarks/boot_wake.py            # real chip (axon default)
    BOOT_WAKE_LADDER=cold,warm,warm python benchmarks/boot_wake.py
"""
from __future__ import annotations

import base64
import json
import os
import shutil
import signal
import socket
import subprocess
import sys
import tempfile
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes  # noqa: E402

CHUNK_S = 0.4
N_WAKE_CHUNKS = 4          # fills the 1600 ms KWS FIFO → fires on chunk 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _speech_b64() -> str:
    rng = np.random.default_rng(0)
    t = np.arange(int(16000 * CHUNK_S)) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 260 * t)
           + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    return base64.b64encode(encode_wav_bytes(wav, 16000)).decode()


def measure(cache_dir: str, label: str, boot_timeout_s: float = 3600.0
            ) -> dict:
    port = _free_port()
    env = dict(
        os.environ,
        VOICE_HOST="127.0.0.1", VOICE_PORT=str(port),
        VOICE_KWS_AOT="1", VOICE_KWS_THRESHOLD="-1e9",
        VOICE_DISABLE_LLM="1", VOICE_VAD_THRESHOLD="2.0",
        FUNASR_WS_ENABLE="0",          # isolate the HTTP/WS wake boot
        LOG_TO_CONSOLE_ONLY="1",
        JAX_COMPILATION_CACHE_DIR=cache_dir,
    )
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "from toolbox_for_asr_and_tts_tpu.launch import launch_voice; "
         "launch_voice()"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        text=True)
    ready_s = None
    try:
        while time.perf_counter() - t0 < boot_timeout_s:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"server exited rc={proc.returncode}: "
                    + (proc.stderr.read() or "")[-2000:])
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/health", timeout=1) as r:
                    if r.status == 200:
                        ready_s = time.perf_counter() - t0
                        break
            except Exception:
                time.sleep(0.25)
        if ready_s is None:
            raise RuntimeError("server never became ready")

        from websockets.sync.client import connect as ws_connect
        b64 = _speech_b64()
        ws = ws_connect(f"ws://127.0.0.1:{port}/api/v1/voice/asr/ws",
                        open_timeout=60, ping_interval=None)
        ws.recv(timeout=60)                                   # welcome
        wake_s = None
        flags = {"use_wake": True, "use_sv": False, "use_llm": False}
        deadline = t0 + boot_timeout_s
        for k in range(N_WAKE_CHUNKS):
            t_send = time.perf_counter()
            ws.send(json.dumps({"audio_data": b64, **(flags if k == 0
                                                      else {})}))
            while time.perf_counter() - t_send < CHUNK_S and wake_s is None:
                try:
                    msg = json.loads(ws.recv(
                        timeout=CHUNK_S - (time.perf_counter() - t_send)))
                except Exception:
                    break
                if msg.get("type") == "wakeup":
                    wake_s = time.perf_counter() - t0
        while wake_s is None and time.perf_counter() < deadline:
            try:
                msg = json.loads(ws.recv(timeout=2.0))
            except TimeoutError:
                continue
            if msg.get("type") == "wakeup":
                wake_s = time.perf_counter() - t0
        ws.close()
        if wake_s is None:
            raise RuntimeError("no wakeup frame before timeout")
        n_cache = len(os.listdir(cache_dir))
        sys.stderr.write(f"boot-wake [{label}]: ready {ready_s:.1f}s, first "
                         f"green wake {wake_s:.1f}s, cache entries "
                         f"{n_cache}\n")
        return {"label": label, "ready_s": round(ready_s, 1),
                "wake_s": round(wake_s, 1), "cache_entries": n_cache}
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def main() -> None:
    cache_dir = tempfile.mkdtemp(prefix="boot_wake_cache_")
    ladder = os.getenv("BOOT_WAKE_LADDER", "cold,warm").split(",")
    runs = []
    try:
        for label in ladder:
            if label == "cold":
                shutil.rmtree(cache_dir, ignore_errors=True)
                os.makedirs(cache_dir, exist_ok=True)
            runs.append(measure(cache_dir, label))
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)
    cold = next((r for r in runs if r["label"] == "cold"), None)
    warm = next((r for r in reversed(runs) if r["label"] == "warm"), None)
    print(json.dumps({
        "metric": "boot_to_first_wake_s",
        "value": (warm or cold)["wake_s"], "unit": "s",
        "runs": runs,
        "speedup_cold_over_warm": (round(cold["wake_s"] / warm["wake_s"], 2)
                                   if cold and warm else None)}))


if __name__ == "__main__":
    main()
