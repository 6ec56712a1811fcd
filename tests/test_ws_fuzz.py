"""WS protocol fuzz: randomized hostile input must produce error frames (or
be ignored), never crash the connection — and a normal utterance must still
complete afterwards on the SAME connection (reference behavior: error frames
with codes instead of connection drops, voice.py:881-888)."""
import base64
import json
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
httpx = pytest.importorskip("httpx")
ws_mod = pytest.importorskip("websockets.sync.client")

from tests.test_service import ServerThread, _silence_b64, _wav_b64  # noqa: E402


@pytest.fixture(scope="module")
def server():
    from toolbox_for_asr_and_tts_tpu.runtime.config import VoiceConfig
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    app = create_app(engines=build_test_engines(),
                     cfg=VoiceConfig(disable_llm=True))
    return ServerThread(app).start()


def _fuzz_messages(rng):
    junk = []
    for _ in range(40):
        kind = rng.integers(0, 8)
        if kind == 0:
            junk.append("not json at all {{{")
        elif kind == 1:
            junk.append(json.dumps({"type": "".join(
                chr(rng.integers(33, 127)) for _ in range(10))}))
        elif kind == 2:
            junk.append(json.dumps({"audio_data": "!!!not-base64!!!"}))
        elif kind == 3:  # valid b64, invalid WAV
            junk.append(json.dumps({"audio_data": base64.b64encode(
                rng.bytes(64)).decode()}))
        elif kind == 4:  # wrong types for flags
            junk.append(json.dumps({"use_wake": "banana",
                                    "audio_data": _silence_b64(0.1)}))
        elif kind == 5:  # deeply nested junk
            d = {"x": 1}
            for _ in range(30):
                d = {"n": d}
            junk.append(json.dumps(d))
        elif kind == 6:  # huge field name / unicode soup
            junk.append(json.dumps({"漢" * 200: "值" * 200}))
        else:            # empty / whitespace
            junk.append(rng.choice(["", " ", "{}", "[]", "null", "42"]))
    return junk


def test_fuzz_then_normal_session(server):
    url = f"ws://127.0.0.1:{server.app.port}/api/v1/voice/asr/ws"
    rng = np.random.default_rng(1234)
    with ws_mod.connect(url, open_timeout=30) as ws:
        assert json.loads(ws.recv(timeout=30))["type"] == "welcome"
        for m in _fuzz_messages(rng):
            ws.send(m)
        # drain whatever error frames came back (every frame must be valid
        # JSON with a type; none may close the socket)
        deadline = time.time() + 30
        drained = 0
        while time.time() < deadline:
            try:
                msg = json.loads(ws.recv(timeout=1))
            except TimeoutError:
                break
            assert "type" in msg
            assert msg["type"] in ("error", "status", "processing", "result")
            drained += 1
        assert drained > 0  # hostile input was answered, not swallowed
        # the SAME connection still serves a full utterance
        ws.send(json.dumps({"use_wake": False, "use_sv": False,
                            "audio_data": _wav_b64(0.4, seed=1)}))
        for i in range(2, 6):
            ws.send(json.dumps({"audio_data": _wav_b64(0.4, seed=i),
                                "use_llm": False}))
        for _ in range(7):
            ws.send(json.dumps({"audio_data": _silence_b64(0.4),
                                "use_llm": False}))
        got_result = False
        for _ in range(40):
            msg = json.loads(ws.recv(timeout=120))
            if msg["type"] == "result":
                got_result = True
                break
        assert got_result
    # server still healthy after the abuse
    assert httpx.get(f"{server.base}/health").json()["status"] == "healthy"


def test_binary_frame_handling(server):
    """A binary frame mid-session must not kill the server (either an error
    frame or a clean close is acceptable; crash/hang is not)."""
    url = f"ws://127.0.0.1:{server.app.port}/api/v1/voice/asr/ws"
    with ws_mod.connect(url, open_timeout=30) as ws:
        json.loads(ws.recv(timeout=30))
        try:
            ws.send(b"\x00\x01\x02binary")
            ws.recv(timeout=5)
        except Exception:
            pass  # clean close is fine
    assert httpx.get(f"{server.base}/health").json()["status"] == "healthy"
