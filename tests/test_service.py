"""API contract tests: replay the documented REST/WS protocols against
in-process servers (survey §4's mandated contract tests)."""
import asyncio
import base64
import json
import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
httpx = pytest.importorskip("httpx")

from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes  # noqa: E402


class ServerThread:
    def __init__(self, app):
        self.app = app
        self.loop = asyncio.new_event_loop()
        self.ready = None
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.ready = asyncio.Event()
        self.loop.create_task(self.app.serve("127.0.0.1", 0, ready=self.ready))
        self.loop.run_forever()

    def start(self):
        self.thread.start()
        for _ in range(200):
            if getattr(self.app, "port", None):
                return self
            time.sleep(0.05)
        raise RuntimeError("server did not start")

    def stop(self):
        """Release the app's serving hubs and the event loop — leaked hub
        threads lazily compiling after their test segfaulted XLA:CPU in
        the round-4 full-suite run."""
        close = getattr(self.app, "close_engines", None)
        if close is not None:
            close()
        self.loop.call_soon_threadsafe(self.loop.stop)

    @property
    def base(self):
        return f"http://127.0.0.1:{self.app.port}"


def _wav_b64(secs=0.5, amp=0.3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    x = (amp * np.sin(2 * np.pi * 300 * t)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    return base64.b64encode(encode_wav_bytes(x, 16000)).decode()


def _silence_b64(secs=0.4):
    x = np.zeros(int(16000 * secs), np.float32)
    return base64.b64encode(encode_wav_bytes(x, 16000)).decode()


# ------------------------------------------------------------------- TTS
@pytest.fixture(scope="module")
def tts_server():
    # (no engines; stop() still releases the event loop)
    from toolbox_for_asr_and_tts_tpu.service.tts_app import create_app
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    app = create_app(synthesizer=Synthesizer.random(tiny=True))
    srv = ServerThread(app).start()
    yield srv
    srv.stop()


def test_tts_full_job_lifecycle(tts_server):
    base = tts_server.base
    r = httpx.post(f"{base}/api/v1/tts/start",
                   json={"text": "你好。血压正常。", "voice": "zhitian_emo"})
    assert r.status_code == 200, r.text
    job_id = r.json()["job_id"]
    for _ in range(300):
        r = httpx.get(f"{base}/api/v1/tts/result/{job_id}")
        assert r.status_code == 200
        body = r.json()
        if body["status"] in ("completed", "error"):
            break
        time.sleep(0.1)
    assert body["status"] == "completed", body
    wav = base64.b64decode(body["audio_base64"])
    assert wav[:4] == b"RIFF"
    assert body["audio_size"] > 1000
    r = httpx.request("DELETE", f"{base}/api/v1/tts/jobs/{job_id}")
    assert r.status_code == 200
    r = httpx.get(f"{base}/api/v1/tts/result/{job_id}")
    assert r.status_code == 404


def test_tts_cancel_and_errors(tts_server):
    base = tts_server.base
    r = httpx.post(f"{base}/api/v1/tts/start", json={"text": ""})
    assert r.status_code == 400
    r = httpx.post(f"{base}/api/v1/tts/start", json={})
    assert r.status_code == 422
    r = httpx.post(f"{base}/api/v1/tts/cancel", json={"job_id": "nope"})
    assert r.status_code == 404
    r = httpx.get(f"{base}/health")
    assert r.status_code == 200
    assert r.json()["status"] == "healthy"
    r = httpx.get(f"{base}/")
    assert "tts-service" in r.text


# ----------------------------------------------------------------- Voice
@pytest.fixture(scope="module")
def voice_server():
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    from toolbox_for_asr_and_tts_tpu.runtime.config import VoiceConfig
    app = create_app(engines=build_test_engines(),
                     cfg=VoiceConfig(disable_llm=True))
    srv = ServerThread(app).start()
    yield srv
    srv.stop()


def test_voice_health_and_root(voice_server):
    r = httpx.get(f"{voice_server.base}/health")
    assert r.json()["status"] == "healthy"
    r = httpx.get(f"{voice_server.base}/")
    assert "voice-service" in r.text


def test_batch_asr_rest(voice_server):
    r = httpx.post(f"{voice_server.base}/api/v1/voice/asr",
                   json={"audio_data": _wav_b64(1.0), "use_wake": False,
                         "use_llm": False}, timeout=120)
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["success"] is True
    assert isinstance(body["text"], str)


def test_batch_asr_validation(voice_server):
    r = httpx.post(f"{voice_server.base}/api/v1/voice/asr", json={})
    assert r.status_code == 422
    r = httpx.get(f"{voice_server.base}/api/v1/voice/asr")
    assert r.status_code == 405
    r = httpx.get(f"{voice_server.base}/nope")
    assert r.status_code == 404


def test_websocket_streaming_session(voice_server):
    ws_mod = pytest.importorskip("websockets.sync.client")
    url = f"ws://127.0.0.1:{voice_server.app.port}/api/v1/voice/asr/ws"
    with ws_mod.connect(url, open_timeout=30) as ws:
        welcome = json.loads(ws.recv(timeout=30))
        assert welcome["type"] == "welcome"
        assert welcome["mode"] == "WAITING_FOR_WAKEUP"
        # disable wake+sv → straight to ASR; send speech then silence
        ws.send(json.dumps({"use_wake": False, "use_sv": False,
                            "audio_data": _wav_b64(0.4, seed=1)}))
        for i in range(2, 6):
            ws.send(json.dumps({"audio_data": _wav_b64(0.4, seed=i),
                                "use_llm": False}))
        for _ in range(6):  # 2.4 s silence → finalize
            ws.send(json.dumps({"audio_data": _silence_b64(0.4),
                                "use_llm": False}))
        got_processing = got_result = False
        for _ in range(40):   # headroom for extra partial frames when the
            # 1-CPU host is starved by neighbouring suites
            msg = json.loads(ws.recv(timeout=120))
            if msg["type"] == "processing":
                got_processing = True
            if msg["type"] == "result":
                got_result = True
                break
        assert got_processing and got_result
        # control: end_conversation
        ws.send(json.dumps({"type": "end_conversation"}))
        msg = json.loads(ws.recv(timeout=30))
        assert msg["status"] == "conversation_ended"


def test_websocket_error_frames(voice_server):
    ws_mod = pytest.importorskip("websockets.sync.client")
    url = f"ws://127.0.0.1:{voice_server.app.port}/api/v1/voice/asr/ws"
    with ws_mod.connect(url, open_timeout=30) as ws:
        json.loads(ws.recv(timeout=30))  # welcome
        ws.send(json.dumps({"no_audio": True}))
        msg = json.loads(ws.recv(timeout=30))
        assert msg["type"] == "error"
        assert msg["code"] == "MISSING_AUDIO_DATA"
        ws.send(json.dumps({"audio_data": "!!!notbase64!!!"}))
        msg = json.loads(ws.recv(timeout=30))
        assert msg["type"] == "error"
        assert msg["code"] == "AUDIO_DECODE_ERROR"
