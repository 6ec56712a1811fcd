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
    srv = ServerThread(app).start()
    yield srv
    srv.stop()


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


def test_invalid_utf8_text_frame():
    """A TEXT frame whose payload is not valid UTF-8 must get the
    INVALID_JSON error frame and keep the connection alive (round-2 review
    finding: UnicodeDecodeError tore the connection down). The websockets
    client refuses to send invalid UTF-8, so speak raw RFC6455.

    Own server (stopped on exit): the module fixture's event loop can stay
    blocked for minutes by the previous test's post-close finalize work on
    the CPU backend."""
    import socket as _socket
    from toolbox_for_asr_and_tts_tpu.runtime.config import VoiceConfig
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    app = create_app(engines=build_test_engines(),
                     cfg=VoiceConfig(disable_llm=True))
    server = ServerThread(app).start()
    try:
        _run_invalid_utf8_drive(server)
    finally:
        server.stop()   # engines + loop (ServerThread.stop)


def _run_invalid_utf8_drive(server):
    import socket as _socket

    def rd(sock, n):
        b = b""
        while len(b) < n:
            c = sock.recv(n - len(b))
            if not c:
                raise ConnectionError("closed")
            b += c
        return b

    def send_frame(sock, opcode, payload: bytes):
        mask = b"\x12\x34\x56\x78"
        hdr = bytes([0x80 | opcode])
        n = len(payload)
        if n < 126:
            hdr += bytes([0x80 | n])
        else:
            hdr += bytes([0x80 | 126]) + n.to_bytes(2, "big")
        sock.sendall(hdr + mask
                     + bytes(b ^ mask[i % 4] for i, b in enumerate(payload)))

    def recv_frame(sock):
        h = rd(sock, 2)
        ln = h[1] & 0x7F
        if ln == 126:
            ln = int.from_bytes(rd(sock, 2), "big")
        elif ln == 127:
            ln = int.from_bytes(rd(sock, 8), "big")
        if h[1] & 0x80:
            rd(sock, 4)
        return h[0] & 0xF, rd(sock, ln)

    # generous timeout: on the CPU test backend the module server may still
    # be draining the previous test's fuzz load when this connects
    s = _socket.create_connection(("127.0.0.1", server.app.port), timeout=180)
    try:
        key = base64.b64encode(b"0123456789abcdef").decode()
        s.sendall((f"GET /api/v1/voice/asr/ws HTTP/1.1\r\n"
                   f"Host: 127.0.0.1\r\nUpgrade: websocket\r\n"
                   f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                   f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(4096)
        assert b"101" in buf.split(b"\r\n", 1)[0]
        op, payload = recv_frame(s)
        assert json.loads(payload)["type"] == "welcome"
        send_frame(s, 0x1, b"\xff\xfe not utf8 \x80")   # invalid UTF-8 TEXT
        op, payload = recv_frame(s)
        msg = json.loads(payload)
        assert msg["type"] == "error" and msg["code"] == "INVALID_JSON"
        # connection still alive: the next frame round-trips too
        send_frame(s, 0x1, b"{{{not json")
        op, payload = recv_frame(s)
        msg = json.loads(payload)
        assert msg["type"] == "error" and msg["code"] == "INVALID_JSON"
    finally:
        s.close()
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
