"""Native server streaming modes (online / 2pass) — separate module so the
single-process C++ server global is free after test_native_ws teardown."""
import json

import numpy as np
import pytest

websockets_sync = pytest.importorskip("websockets.sync.client")

class _FakeStreaming:
    """Stands in for StreamingRecognizer: accumulates sample counts."""

    def __init__(self):
        self.total = 0

    def push_audio(self, arr):
        self.total += len(arr)
        return f"partial:{self.total}"

    def finalize(self):
        return f"final:{self.total}"

    def reset(self):
        self.total = 0


@pytest.fixture(scope="module")
def server2():
    from toolbox_for_asr_and_tts_tpu.native.bridge import NativeWSServer
    srv = NativeWSServer(lambda a, h: f"offline:{len(a)}", port=0,
                         streaming_factory=_FakeStreaming)
    srv.start()
    yield srv
    srv.stop()


def test_online_mode_partials(server2):
    url = f"ws://127.0.0.1:{server2.port}"
    with websockets_sync.connect(url, open_timeout=20) as ws:
        ws.send(json.dumps({"mode": "online", "wav_name": "s",
                            "is_speaking": True}))
        ws.send(np.zeros(4000, "<i2").tobytes())
        m1 = json.loads(ws.recv(timeout=30))
        assert m1["is_final"] is False and m1["text"] == "partial:4000"
        ws.send(np.zeros(2000, "<i2").tobytes())
        m2 = json.loads(ws.recv(timeout=30))
        assert m2["text"] == "partial:6000"
        ws.send(json.dumps({"is_speaking": False}))
        m3 = json.loads(ws.recv(timeout=30))
        assert m3["is_final"] is True and m3["text"] == "final:6000"


def test_2pass_mode(server2):
    url = f"ws://127.0.0.1:{server2.port}"
    with websockets_sync.connect(url, open_timeout=20) as ws:
        ws.send(json.dumps({"mode": "2pass", "wav_name": "t",
                            "is_speaking": True}))
        ws.send(np.zeros(4000, "<i2").tobytes())
        m1 = json.loads(ws.recv(timeout=30))
        assert m1["mode"] == "2pass-online" and m1["is_final"] is False
        ws.send(json.dumps({"is_speaking": False}))
        m2 = json.loads(ws.recv(timeout=30))
        assert m2["mode"] == "2pass-offline" and m2["is_final"] is True
        assert m2["text"] == "offline:4000"


def test_offline_mode_unaffected_by_streaming_factory(server2):
    url = f"ws://127.0.0.1:{server2.port}"
    with websockets_sync.connect(url, open_timeout=20) as ws:
        ws.send(json.dumps({"mode": "offline", "wav_name": "u",
                            "is_speaking": True}))
        ws.send(np.zeros(4000, "<i2").tobytes())
        ws.send(json.dumps({"is_speaking": False}))
        m = json.loads(ws.recv(timeout=30))
        assert m["mode"] == "offline" and m["text"] == "offline:4000"
