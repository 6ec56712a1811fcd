"""Fault injection (survey §5: the reference has NONE — "No fault injection
anywhere"). Inject one-shot failures into the engines under a live WS
service and lock the recovery contract: the client gets an error frame (not
a dropped connection), and the NEXT utterance succeeds."""
import asyncio
import base64
import json
import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")


class _ServerThread:
    def __init__(self, app):
        self.app = app
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.create_task(self.app.serve("127.0.0.1", 0,
                                             ready=asyncio.Event()))
        self.loop.run_forever()

    def start(self):
        self.thread.start()
        for _ in range(200):
            if getattr(self.app, "port", None):
                return self
            time.sleep(0.05)
        raise RuntimeError("server did not start")

    def stop(self):
        close = getattr(self.app, "close_engines", None)
        if close is not None:
            close()
        self.loop.call_soon_threadsafe(self.loop.stop)


@pytest.fixture(scope="module")
def voice():
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    engines = E.build_test_engines()
    srv = _ServerThread(create_app(engines=engines)).start()
    yield srv, engines
    srv.stop()


def _b64(x):
    from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes
    return base64.b64encode(encode_wav_bytes(x, 16000)).decode()


def _speech(seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(6400) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 300 * t)
            + 0.01 * rng.standard_normal(6400)).astype(np.float32)


def _utterance(ws, timeout_s=240.0):
    """Drive one utterance; return the first terminal frame (result/error)."""
    for i in range(3):
        ws.send(json.dumps({"audio_data": _b64(_speech(i))}))
    for _ in range(7):
        ws.send(json.dumps({"audio_data": _b64(np.zeros(6400, np.float32))}))
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            msg = json.loads(ws.recv(timeout=5.0))
        except Exception:
            continue
        if msg.get("type") in ("result", "error"):
            return msg
    raise TimeoutError("no terminal frame")


def _connect(port):
    ws_mod = pytest.importorskip("websockets.sync.client")
    ws = ws_mod.connect(f"ws://127.0.0.1:{port}/api/v1/voice/asr/ws",
                        open_timeout=30, ping_interval=None)
    ws.recv(timeout=30)  # welcome
    ws.send(json.dumps({"use_wake": False, "use_sv": False,
                        "use_llm": False}))
    # a flags-only message draws MISSING_AUDIO_DATA by contract — drain it
    # so _utterance's terminal-frame scan starts clean
    msg = json.loads(ws.recv(timeout=30))
    assert msg.get("code") == "MISSING_AUDIO_DATA", msg
    return ws


def test_finalize_engine_failure_recovers(voice):
    """Diarization (FinalizeHub → Diarizer.diarize_batch) dies once mid-
    finalize → client gets a PROCESSING_ERROR frame on the SAME connection,
    and the next utterance completes normally."""
    srv, engines = voice
    hub = engines.diarizer                     # FinalizeHub
    inner = hub.inner
    real = inner.diarize_batch
    fired = {"n": 0}

    def boom(*a, **k):
        fired["n"] += 1
        raise RuntimeError("injected diarizer failure")

    ws = _connect(srv.app.port)
    try:
        inner.diarize_batch = boom
        msg = _utterance(ws)
        assert msg["type"] == "error", msg
        assert msg["code"] == "PROCESSING_ERROR"
        assert fired["n"] == 1
    finally:
        inner.diarize_batch = real
    # same connection, engines restored: full recovery
    msg = _utterance(ws)
    assert msg["type"] == "result", msg
    ws.close()


def test_chunked_hub_tick_failure_is_transparent(voice):
    """The fused partials tick dies for a few ticks → partials are simply
    absent for those ticks; the stream still endpoints and finalizes."""
    srv, engines = voice
    hub = getattr(engines.streaming_factory, "hub", None)
    if hub is None:
        pytest.skip("batched partials hub not active")
    real = hub.ticker.tick
    state = {"fail": True}

    def flaky(chunks):
        if state["fail"]:
            raise RuntimeError("injected tick failure")
        return real(chunks)

    ws = _connect(srv.app.port)
    try:
        hub.ticker.tick = flaky
        for i in range(2):   # chunks during the outage: no crash, no drop
            ws.send(json.dumps({"audio_data": _b64(_speech(i))}))
            time.sleep(0.1)
    finally:
        state["fail"] = False
        hub.ticker.tick = real
    msg = _utterance(ws)
    assert msg["type"] == "result", msg
    ws.close()


def test_verifier_failure_recovers(voice):
    """Speaker-embedding failure inside finalize (SV path) surfaces as an
    error frame and heals. The diarizer's own embed call is part of
    diarize_batch, so inject at the verifier the session uses for SV."""
    srv, engines = voice
    real = engines.verifier.embed
    ws = _connect(srv.app.port)
    try:
        engines.verifier.embed = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected embed failure"))
        msg = _utterance(ws)
        # SV is off for this connection, so the verifier may not even be
        # touched — either a clean result or an error frame is acceptable;
        # the connection must survive either way
        assert msg["type"] in ("result", "error")
    finally:
        engines.verifier.embed = real
    msg = _utterance(ws)
    assert msg["type"] == "result", msg
    ws.close()


def test_capacity_overflow_degrades_not_refuses(monkeypatch):
    """Hub rows exhausted → overflow sessions degrade to per-session
    engines (unbatched) instead of SESSION_CREATE_ERROR + close."""
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "2")
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    engines = E.build_test_engines()
    srv = _ServerThread(create_app(engines=engines)).start()
    n = 4   # 2 hub rows + 2 overflow
    conns = [_connect(srv.app.port) for _ in range(n)]
    results = []
    for ws in conns:
        results.append(_utterance(ws))
        ws.close()
    assert all(m["type"] == "result" for m in results), results
    engines.close()


def test_ws_disconnect_releases_hub_rows(monkeypatch):
    """Closing a WS connection must free its batched-serving hub rows —
    the round-3 leak: without sess.close() in the handler, ~capacity
    connections exhausted the hub and every later session fell onto the
    slow overflow path."""
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "2")
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    engines = E.build_test_engines()
    hub = engines.streaming_factory.hub
    srv = _ServerThread(create_app(engines=engines)).start()
    # 6 sequential connect/close cycles over a 2-row hub: without row
    # release, cycle 3+ would overflow
    for i in range(6):
        ws = _connect(srv.app.port)
        ws.close()
        for _ in range(100):   # close is async server-side
            with hub.ticker._lock:
                free = len(hub.ticker._free)
            if free == 2:
                break
            time.sleep(0.05)
        assert free == 2, f"cycle {i}: hub rows leaked ({free}/2 free)"
    engines.close()


def test_silent_peer_reaped_by_keepalive(monkeypatch):
    """A peer that vanishes WITHOUT a FIN (dropped network) must be reaped
    by the server's keepalive pings so its hub rows come back."""
    import socket as socketmod
    ws_mod = pytest.importorskip("websockets.sync.client")
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "2")
    monkeypatch.setenv("WS_PING_INTERVAL_S", "1")
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    engines = E.build_test_engines()
    hub = engines.streaming_factory.hub
    srv = _ServerThread(create_app(engines=engines)).start()
    ws = ws_mod.connect(
        f"ws://127.0.0.1:{srv.app.port}/api/v1/voice/asr/ws",
        open_timeout=30, ping_interval=None)
    ws.recv(timeout=30)
    ws.send(json.dumps({"use_wake": False, "use_sv": False,
                        "audio_data": _b64(_speech())}))
    time.sleep(1.0)   # session joined, row claimed
    with hub.ticker._lock:
        assert len(hub.ticker._free) == 1
    # go silent: stop the client lib from answering pings (shut down OUR
    # read side; the socket stays open — no FIN reaches the server reader
    # from the protocol's perspective of a live-but-mute peer)
    ws.protocol = None            # suppress the lib's close handshake
    try:
        ws.socket.shutdown(socketmod.SHUT_RD)
    except OSError:
        pass
    deadline = time.time() + 60   # reap ≈ 2×interval (+ first-tick slack)
    free = 0
    while time.time() < deadline:
        with hub.ticker._lock:
            free = len(hub.ticker._free)
        if free == 2:
            break
        time.sleep(0.2)
    assert free == 2, "silent peer's hub row was not reaped"
    engines.close()


def test_tts_job_error_state_and_recovery():
    """A synthesis crash marks the JOB error (worker survives, reference
    tts_service.py:950-960) and the next job completes."""
    from toolbox_for_asr_and_tts_tpu.tts.jobs import TTSJobManager
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    synth = Synthesizer.random(tiny=True)
    mgr = TTSJobManager(synth, max_workers=1)
    real = synth.synthesize_stream

    def boom(*a, **k):
        raise RuntimeError("injected synth failure")
        yield  # pragma: no cover

    synth.synthesize_stream = boom
    try:
        jid = mgr.start_task("你好。")
        for _ in range(100):
            r = mgr.get_result(jid)
            if r["status"] in ("completed", "error"):
                break
            time.sleep(0.05)
        assert r["status"] == "error"
        assert "injected" in r["error"]
    finally:
        synth.synthesize_stream = real
    jid2 = mgr.start_task("你好。")
    for _ in range(1200):
        r2 = mgr.get_result(jid2)
        if r2["status"] in ("completed", "error"):
            break
        time.sleep(0.1)
    assert r2["status"] == "completed", r2


def test_binary_pcm_utterance(voice):
    """BINARY WS frames carry raw 16 kHz s16le PCM chunks (the FunASR
    runtime protocol's chunk format) — a full utterance of binary chunks
    must finalize exactly like the base64-JSON path."""
    srv, _engines = voice
    ws = _connect(srv.app.port)

    def pcm(x):
        return (np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()

    for i in range(3):
        ws.send(pcm(_speech(i)))
    for _ in range(7):
        ws.send(pcm(np.zeros(6400, np.float32)))
    deadline = time.time() + 240
    msg = None
    while time.time() < deadline:
        try:
            m = json.loads(ws.recv(timeout=5.0))
        except Exception:
            continue
        if m.get("type") in ("result", "error"):
            msg = m
            break
    assert msg is not None and msg["type"] == "result", msg
    # malformed (odd-length) binary frame → error frame, connection lives
    ws.send(b"\x01\x02\x03")
    deadline = time.time() + 30
    err = None
    while time.time() < deadline:
        m = json.loads(ws.recv(timeout=5.0))
        if m.get("code") == "INVALID_PCM_FRAME":
            err = m
            break
    assert err is not None
    ws.close()
