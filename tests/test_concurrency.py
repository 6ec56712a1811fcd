"""Concurrency: simultaneous WS sessions and TTS jobs against live servers."""
import base64
import json
import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
httpx = pytest.importorskip("httpx")
ws_client = pytest.importorskip("websockets.sync.client")

from tests.test_service import ServerThread, _silence_b64, _wav_b64  # noqa: E402


@pytest.fixture(scope="module")
def voice_server():
    from toolbox_for_asr_and_tts_tpu.runtime.config import VoiceConfig
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    app = create_app(engines=build_test_engines(),
                     cfg=VoiceConfig(disable_llm=True))
    srv = ServerThread(app).start()
    yield srv
    srv.stop()


def _run_session(port, idx, results):
    try:
        url = f"ws://127.0.0.1:{port}/api/v1/voice/asr/ws"
        with ws_client.connect(url, open_timeout=60) as ws:
            json.loads(ws.recv(timeout=60))  # welcome
            ws.send(json.dumps({"use_wake": False, "use_sv": False,
                                "audio_data": _wav_b64(0.4, seed=idx)}))
            for i in range(3):
                ws.send(json.dumps({"audio_data": _wav_b64(0.4, seed=idx + i),
                                    "use_llm": False}))
            for _ in range(6):
                ws.send(json.dumps({"audio_data": _silence_b64(0.4),
                                    "use_llm": False}))
            for _ in range(20):
                msg = json.loads(ws.recv(timeout=180))
                if msg["type"] == "result":
                    results[idx] = msg
                    return
    except Exception as e:  # surface in assertion
        results[idx] = {"error": str(e)}


def test_concurrent_ws_sessions(voice_server):
    n = 4
    results = {}
    threads = [threading.Thread(target=_run_session,
                                args=(voice_server.app.port, i, results))
               for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == n, results
    for i, msg in results.items():
        assert "error" not in msg, msg
        assert msg["type"] == "result"


def test_tts_multi_voice_distinct():
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    s = Synthesizer.random(tiny=True)
    a = s.synthesize("你好。", voice="zhitian_emo").wav
    b = s.synthesize("你好。", voice="zhiyan_emo").wav
    # different speaker embeddings → different waveforms
    n = min(len(a), len(b))
    assert n > 0
    assert not np.allclose(a[:n], b[:n])


def test_concurrent_tts_jobs():
    from toolbox_for_asr_and_tts_tpu.tts.jobs import TTSJobManager
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    mgr = TTSJobManager(Synthesizer.random(tiny=True), max_workers=2)
    ids = [mgr.start_task(f"测试第{i}句。") for i in range(4)]
    deadline = time.time() + 120
    done = {}
    while time.time() < deadline and len(done) < len(ids):
        for j in ids:
            r = mgr.get_result(j)
            if r["status"] in ("completed", "error"):
                done[j] = r
        time.sleep(0.1)
    assert len(done) == len(ids)
    assert all(r["status"] == "completed" for r in done.values())
