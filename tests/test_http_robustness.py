"""Server robustness: malformed inputs must produce clean errors, not hangs."""
import asyncio
import socket
import threading
import time

import pytest

httpx = pytest.importorskip("httpx")

from toolbox_for_asr_and_tts_tpu.service.http import App, Request, Response  # noqa: E402


@pytest.fixture(scope="module")
def server():
    app = App("robust")

    @app.post("/echo")
    async def echo(req: Request) -> Response:
        return Response.json(req.json())

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0))
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(100):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)
    return app


def test_invalid_json_is_422(server):
    r = httpx.post(f"http://127.0.0.1:{server.port}/echo",
                   content=b"{invalid", headers={"Content-Type": "application/json"})
    assert r.status_code == 422


def test_keepalive_multiple_requests(server):
    with httpx.Client() as c:
        for i in range(3):
            r = c.post(f"http://127.0.0.1:{server.port}/echo", json={"i": i})
            assert r.json() == {"i": i}


def test_raw_garbage_connection_closes(server):
    s = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    s.sendall(b"NONSENSE\r\n\r\n")
    s.settimeout(5)
    try:
        data = s.recv(1024)  # server closes (empty) or ignores
    except socket.timeout:
        data = b""
    s.close()
    # server must still serve afterwards
    r = httpx.post(f"http://127.0.0.1:{server.port}/echo", json={"ok": 1})
    assert r.status_code == 200


def test_options_preflight(server):
    r = httpx.request("OPTIONS", f"http://127.0.0.1:{server.port}/echo")
    assert r.status_code == 204
    assert "POST" in r.headers["access-control-allow-methods"]


def test_voice_rest_wake_gate():
    """use_wake=True with a never-firing KWS yields the no-wake message."""
    import base64
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.runtime.config import VoiceConfig
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    from toolbox_for_asr_and_tts_tpu.service.schemas import ASRRequest
    from toolbox_for_asr_and_tts_tpu.service.voice_app import VoiceService
    from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes

    svc = VoiceService(build_test_engines(), VoiceConfig())
    try:
        wav = (0.3 * np.sin(np.arange(32000) * 0.1)).astype(np.float32)
        req = ASRRequest(
            audio_data=base64.b64encode(encode_wav_bytes(wav, 16000)
                                        ).decode(),
            use_wake=True, use_llm=False)
        out = svc.recognize_speech(req)
        assert out["success"] is False
        assert "唤醒" in out["message"]
    finally:
        svc.engines.close()


def test_ws_unmask_vectorized_correct():
    """The vector uint32 unmask (serving hot path) must equal the RFC 6455
    per-byte XOR for every size class: below/above the numpy threshold,
    non-multiple-of-4 lengths, empty-ish frames."""
    import os
    from toolbox_for_asr_and_tts_tpu.service.http import _unmask
    for n in (1, 3, 4, 5, 255, 256, 257, 1000, 43003):
        payload = os.urandom(n)
        mask = os.urandom(4)
        want = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        assert _unmask(payload, mask) == want, n


def test_keepalive_skips_backpressured_reader(monkeypatch):
    """A handler busy in a long operation (finalize/compile) backpressures
    the 32-deep reader queue; the keepalive must NOT abort the live client
    it can no longer hear (round-3 review finding: pongs go unread while the
    reader is blocked on queue.put, so a stale _last_rx means 'we stopped
    reading', not 'peer died')."""
    import json as jsonmod
    ws_mod = pytest.importorskip("websockets.sync.client")
    monkeypatch.setenv("WS_PING_INTERVAL_S", "0.5")
    app = App("backpressure")

    @app.websocket("/slow")
    async def slow(ws) -> None:
        await ws.receive_json()          # first frame only
        await asyncio.sleep(4.0)         # busy — queue fills behind us
        await ws.send_json({"type": "done"})

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0))
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(100):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)

    ws = ws_mod.connect(f"ws://127.0.0.1:{app.port}/slow", open_timeout=10)
    # flood past the queue depth so the server's reader loop blocks; the
    # client lib keeps answering pings (it is reading), but the server
    # cannot observe the pongs
    for i in range(40):
        ws.send(jsonmod.dumps({"i": i}))
    # old behavior: aborted at ~2x ping interval (1 s); must survive to done
    msg = jsonmod.loads(ws.recv(timeout=30))
    assert msg == {"type": "done"}
    ws.close()
