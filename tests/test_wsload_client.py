"""End-to-end test of the native epoll WS load driver
(native/wsload_client.cpp): build it with g++, point it at a real voice
service on test-size engines, and check it sustains streams and reports
latencies — the same path `benchmarks/run.py wsload` uses on the chip."""
import asyncio
import json
import os
import subprocess
import threading
import time

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..",
                          "toolbox_for_asr_and_tts_tpu", "native")


def _build():
    import shutil
    if shutil.which("g++") is None and shutil.which("c++") is None:
        pytest.skip("no C++ toolchain on this host")
    r = subprocess.run(["make", "-C", NATIVE_DIR, "wsload_client"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return os.path.join(NATIVE_DIR, "wsload_client")


def test_build_wsload_client():
    assert os.path.exists(_build())


@pytest.fixture(scope="module")
def voice_server():
    os.environ.setdefault("VOICE_DISABLE_LLM", "1")
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines

    engines = build_test_engines()
    app = create_app(engines=engines)
    loop = asyncio.new_event_loop()

    def _serve():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0, ready=asyncio.Event()))
        loop.run_forever()

    threading.Thread(target=_serve, daemon=True).start()
    for _ in range(200):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)
    yield app
    try:
        asyncio.run_coroutine_threadsafe(app.shutdown(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        engines.close()
    except Exception:
        pass


def test_wsload_client_sustains_streams(voice_server, tmp_path):
    binary = _build()
    rng = np.random.default_rng(0)
    t = np.arange(int(16000 * 0.4)) / 16000
    speech = (0.3 * np.sin(2 * np.pi * 260 * t)
              + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    (np.clip(speech, -1, 1) * 32767).astype("<i2").tofile(
        tmp_path / "speech.pcm")
    np.zeros(len(t), "<i2").tofile(tmp_path / "silence.pcm")

    # generous deadlines: CPU test engines pay first-compiles in-line
    cmd = [binary, "--port", str(voice_server.port), "--n", "2",
           "--cycles", "2", "--deadline", "300", "--hard-timeout", "300",
           "--connect-timeout", "60",
           "--speech", str(tmp_path / "speech.pcm"),
           "--silence", str(tmp_path / "silence.pcm")]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=580)
    assert proc.returncode == 0, proc.stderr
    recs = [json.loads(x) for x in proc.stdout.splitlines()]
    summary = [r for r in recs if "summary" in r][0]["summary"]
    assert summary == {"n": 2, "ok": 2}, (proc.stdout, proc.stderr[-1000:])
    # cycle 1 (non-grace) must have recorded a result latency per stream
    for r in recs:
        if "idx" in r:
            assert r["ok"] and len(r["lat"]) >= 1, r
