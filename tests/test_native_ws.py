"""End-to-end test of the native C++ WebSocket server: build it with g++,
speak the FunASR wire protocol at it from the `websockets` client."""
import json

import numpy as np
import pytest

websockets_sync = pytest.importorskip("websockets.sync.client")

from toolbox_for_asr_and_tts_tpu.native.bridge import (  # noqa: E402
    NativeWSServer,
    build_library,
)


def test_build_library():
    lib = build_library()
    import os
    assert os.path.exists(lib)


@pytest.fixture(scope="module")
def server():
    calls = []

    def recognize(audio, hotwords):
        calls.append((len(audio), hotwords))
        return f"识别了{len(audio)}个采样点"

    srv = NativeWSServer(recognize, port=0)
    srv.start()
    srv.calls = calls
    yield srv
    srv.stop()


def test_funasr_protocol_roundtrip(server):
    url = f"ws://127.0.0.1:{server.port}"
    with websockets_sync.connect(url, open_timeout=20) as ws:
        ws.send(json.dumps({
            "mode": "offline", "wav_name": "test1", "is_speaking": True,
            "hotwords": "{\"心衰\": 20}", "chunk_size": [5, 10, 5],
            "wav_format": "pcm", "audio_fs": 16000,
        }))
        pcm = (np.sin(np.arange(16000) * 0.05) * 10000).astype("<i2")
        raw = pcm.tobytes()
        for i in range(0, len(raw), 8192):  # 8 KB chunks like the reference
            ws.send(raw[i:i + 8192])
        ws.send(json.dumps({"is_speaking": False}))
        msg = json.loads(ws.recv(timeout=30))
    assert msg["is_final"] is True
    assert msg["wav_name"] == "test1"
    assert msg["mode"] == "offline"
    assert "16000" in msg["text"]
    n, hw = server.calls[-1]
    assert n == 16000
    assert "心衰" in json.loads(hw)  # \uXXXX escapes preserved → valid JSON


def test_end_without_audio_still_answers(server):
    """{"is_speaking": false} with no buffered PCM must still produce the
    is_final frame — offline FunASR clients block forever otherwise
    (round-2 review finding)."""
    url = f"ws://127.0.0.1:{server.port}"
    with websockets_sync.connect(url, open_timeout=20) as ws:
        ws.send(json.dumps({"mode": "offline", "wav_name": "empty",
                            "is_speaking": True}))
        ws.send(json.dumps({"is_speaking": False}))
        msg = json.loads(ws.recv(timeout=10))
    assert msg["is_final"] is True
    assert msg["text"] == ""
    assert msg["wav_name"] == "empty"


def test_two_utterances_per_connection(server):
    url = f"ws://127.0.0.1:{server.port}"
    with websockets_sync.connect(url, open_timeout=20) as ws:
        for name in ("a", "b"):
            ws.send(json.dumps({"mode": "offline", "wav_name": name,
                                "is_speaking": True}))
            ws.send(np.zeros(8000, "<i2").tobytes())
            ws.send(json.dumps({"is_speaking": False}))
            msg = json.loads(ws.recv(timeout=30))
            assert msg["wav_name"] == name


def test_concurrent_connections(server):
    import threading
    results = []

    def run(idx):
        url = f"ws://127.0.0.1:{server.port}"
        with websockets_sync.connect(url, open_timeout=20) as ws:
            ws.send(json.dumps({"wav_name": f"c{idx}", "is_speaking": True}))
            ws.send(np.zeros(4000 + idx * 2, "<i2").tobytes())
            ws.send(json.dumps({"is_speaking": False}))
            results.append(json.loads(ws.recv(timeout=30))["wav_name"])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == ["c0", "c1", "c2", "c3"]

