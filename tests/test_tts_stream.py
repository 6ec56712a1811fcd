"""Streaming TTS (beyond the reference's poll-only job API).

Locks three layers:
- `StreamingConcat` == offline `concat_segments`, sample-exact, across
  pause/crossfade/short-segment edge cases;
- `Synthesizer.synthesize_stream` chunks concatenate to `synthesize()`'s
  waveform (bit-exact under per-segment grouping);
- the job manager's progressive results (`get_result(partial=True)`) and the
  /api/v1/tts/ws endpoint deliver prefixes of the final audio.
"""
import asyncio
import base64
import json
import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")


# ------------------------------------------------------- StreamingConcat
def _rand_segments(rng, lens):
    return [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]


@pytest.mark.parametrize("lens,pauses", [
    ([8000, 6000, 7000], [120, 200]),          # normal segments
    ([500, 400, 300], [120, 200]),             # shorter than the 60 ms fade
    ([8000], []),                              # single segment
    ([8000, 0, 6000], [120, 200]),             # empty segment mid-stream
    ([0, 0], [120]),                           # all empty
    ([3000, 2500, 9000, 100, 5000], [0, 120, 200, 120]),  # zero pause
])
def test_streaming_concat_equals_offline(lens, pauses):
    from toolbox_for_asr_and_tts_tpu.tts.concat import (StreamingConcat,
                                                        concat_segments)
    rng = np.random.default_rng(0)
    wavs = _rand_segments(rng, lens)
    ref = concat_segments(wavs, pauses, 16000, 60)
    st = StreamingConcat(16000, 60)
    # offline indexes pauses by position in the FILTERED (non-empty) list
    chunks = []
    for w in wavs:
        fed = st.segments_fed
        chunks.append(st.feed(w, pauses[fed - 1]
                              if fed >= 1 and fed - 1 < len(pauses) else 0))
    chunks.append(st.flush())
    got = (np.concatenate(chunks) if chunks
           else np.zeros(0, np.float32))
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_streaming_concat_zero_fade():
    from toolbox_for_asr_and_tts_tpu.tts.concat import (StreamingConcat,
                                                        concat_segments)
    rng = np.random.default_rng(1)
    wavs = _rand_segments(rng, [1000, 2000])
    ref = concat_segments(wavs, [120], 16000, 0)
    st = StreamingConcat(16000, 0)
    got = np.concatenate([st.feed(wavs[0], 0), st.feed(wavs[1], 120),
                          st.flush()])
    assert np.array_equal(got, ref)


# ------------------------------------------------- synthesize_stream
@pytest.fixture(scope="module")
def synth(request):
    import os
    # pin per-segment grouping: the bit-exactness contract of the stream
    # (each segment always runs its own (1, bucket) program regardless of
    # how the job batches it)
    os.environ["TTS_GROUP_BY_LENGTH"] = "1"
    os.environ["TTS_MEL_GROUP"] = "1"
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    request.addfinalizer(lambda: (os.environ.pop("TTS_GROUP_BY_LENGTH", None),
                                  os.environ.pop("TTS_MEL_GROUP", None)))
    return Synthesizer.random(tiny=True)


TEXT = "今天天气很好。病人血压一百二，心率正常,没有出血。请多休息，按时吃药。谢谢。"


def test_stream_matches_one_shot(synth):
    ref = synth.synthesize(TEXT)
    events = list(synth.synthesize_stream(TEXT))
    assert events[-1]["event"] == "done"
    assert [e["event"] for e in events[:-1]] == ["chunk"] * (len(events) - 1)
    got = np.concatenate([e["audio"] for e in events])
    assert np.array_equal(got, ref.wav)
    done = events[-1]
    assert done["segments"] == ref.segments
    # chunk indices cover every segment in order
    idxs = [e["segment_index"] for e in events[:-1]]
    assert idxs == sorted(idxs)
    assert events[0]["n_segments"] == len(ref.segments)


def test_stream_cancel_stops_early(synth):
    calls = {"n": 0}

    def cancelled():
        calls["n"] += 1
        return calls["n"] > 1   # allow the first batch only

    events = list(synth.synthesize_stream(TEXT, cancelled=cancelled))
    assert all(e["event"] == "chunk" for e in events)  # no "done"
    assert len(events) < len(synth.synthesize(TEXT).segments)


def test_stream_empty_text(synth):
    events = list(synth.synthesize_stream("   "))
    assert len(events) == 1 and events[0]["event"] == "done"
    assert len(events[0]["audio"]) == 0


# ------------------------------------------------------- job manager
class _StubSynth:
    """Deterministic synthesize_stream with a test-controlled gate between
    segments, for exercising the manager's progressive state."""

    sample_rate = 16000

    def __init__(self):
        self.gate = threading.Event()
        self.chunk = np.ones(1600, np.float32) * 0.1

    def synthesize_stream(self, text, voice="zhitian_emo",
                          cancelled=lambda: False):
        yield {"event": "chunk", "audio": self.chunk, "segment_index": 0,
               "n_segments": 2, "text": "a"}
        self.gate.wait(timeout=10)
        if cancelled():
            return
        yield {"event": "chunk", "audio": self.chunk * 2, "segment_index": 1,
               "n_segments": 2, "text": "b"}
        yield {"event": "done", "audio": np.zeros(0, np.float32), "rtf": 0.01,
               "duration_s": 0.2, "segments": ["a", "b"],
               "seg_times_ms": [1.0, 1.0], "seg_durations_s": [0.1, 0.1]}


def _decode_wav(b64):
    from toolbox_for_asr_and_tts_tpu.utils.audio import decode_wav_bytes
    wav, sr = decode_wav_bytes(base64.b64decode(b64))
    return wav[:, 0]   # decode returns [T, C]


def test_job_partial_results():
    from toolbox_for_asr_and_tts_tpu.tts.jobs import TTSJobManager
    stub = _StubSynth()
    mgr = TTSJobManager(stub, max_workers=1)
    assert mgr.stream_jobs
    job_id = mgr.start_task("ab")
    for _ in range(100):   # first chunk published
        r = mgr.get_result(job_id, partial=True)
        if r["segments_done"] >= 1:
            break
        time.sleep(0.02)
    assert r["status"] == "processing"
    assert r["n_segments"] == 2
    partial = _decode_wav(r["audio_base64"])
    assert np.allclose(partial, stub.chunk, atol=2e-4)  # int16 round trip
    # plain poll (no partial): no audio while processing, gauges visible
    r2 = mgr.get_result(job_id)
    assert r2["audio_base64"] is None and r2["segments_done"] >= 1
    stub.gate.set()
    for _ in range(100):
        r = mgr.get_result(job_id)
        if r["status"] in ("completed", "error"):
            break
        time.sleep(0.02)
    assert r["status"] == "completed", r
    final = _decode_wav(r["audio_base64"])
    assert np.allclose(final[:1600], partial, atol=2e-4)
    assert len(final) == 3200
    assert r["segments_done"] == r["n_segments"] == 2
    assert r["detailed_timing"]["rtf"] == 0.01


def test_job_partial_poll_reuses_encoded_prefix():
    """Repeated ?partial polls with NO new chunks must not re-encode the
    whole prefix (round-3 review finding: O(total audio) per poll)."""
    from toolbox_for_asr_and_tts_tpu.tts.jobs import TTSJobManager
    stub = _StubSynth()
    mgr = TTSJobManager(stub, max_workers=1)
    job_id = mgr.start_task("ab")
    for _ in range(100):
        r1 = mgr.get_result(job_id, partial=True)
        if r1["segments_done"] >= 1:
            break
        time.sleep(0.02)
    r2 = mgr.get_result(job_id, partial=True)
    # identity: the SAME cached string object, not a re-encode
    assert r2["audio_base64"] is r1["audio_base64"]
    stub.gate.set()
    for _ in range(100):
        if mgr.get_result(job_id)["status"] == "completed":
            break
        time.sleep(0.02)


def test_job_cancel_mid_stream():
    from toolbox_for_asr_and_tts_tpu.tts.jobs import TTSJobManager
    stub = _StubSynth()
    mgr = TTSJobManager(stub, max_workers=1)
    job_id = mgr.start_task("ab")
    for _ in range(100):
        if mgr.get_result(job_id)["segments_done"] >= 1:
            break
        time.sleep(0.02)
    assert mgr.cancel_task(job_id)
    stub.gate.set()
    time.sleep(0.2)
    r = mgr.get_result(job_id)
    assert r["status"] == "cancelled"
    assert r["audio_base64"] is None


# ------------------------------------------------------------- service
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


@pytest.fixture(scope="module")
def tts_server(synth):
    from toolbox_for_asr_and_tts_tpu.service.tts_app import create_app
    return _ServerThread(create_app(synthesizer=synth)).start()


def test_ws_stream_matches_job_api(tts_server, synth):
    ws_mod = pytest.importorskip("websockets.sync.client")
    httpx = pytest.importorskip("httpx")
    base = f"http://127.0.0.1:{tts_server.app.port}"

    ws = ws_mod.connect(
        f"ws://127.0.0.1:{tts_server.app.port}/api/v1/tts/ws",
        open_timeout=30)
    ws.send(json.dumps({"text": TEXT}))
    pcm, done = [], None
    for _ in range(200):
        msg = json.loads(ws.recv(timeout=60))
        assert msg["type"] != "error", msg
        if msg["type"] == "chunk":
            assert msg["sample_rate"] == synth.sample_rate
            pcm.append(np.frombuffer(
                base64.b64decode(msg["pcm16_base64"]), "<i2"))
        else:
            done = msg
            break
    ws.close()
    assert done is not None and done["n_segments"] >= 2
    streamed = np.concatenate(pcm)

    r = httpx.post(f"{base}/api/v1/tts/start", json={"text": TEXT})
    job_id = r.json()["job_id"]
    for _ in range(600):
        r = httpx.get(f"{base}/api/v1/tts/result/{job_id}?partial=1")
        body = r.json()
        if body["status"] in ("completed", "error"):
            break
        # while processing, any partial audio must be a prefix of the final
        if body["audio_base64"]:
            part = _decode_wav(body["audio_base64"])
            assert len(part) <= len(streamed) + synth.sample_rate
        time.sleep(0.05)
    assert body["status"] == "completed", body
    final = _decode_wav(body["audio_base64"])
    # decode_wav_bytes divides by 32768 (exact in float32), so ×32768
    # recovers the stored int16 values exactly
    final_i16 = np.round(final * 32768.0).astype(np.int64)
    assert np.array_equal(streamed.astype(np.int64), final_i16)


def test_ws_stream_bad_request(tts_server):
    ws_mod = pytest.importorskip("websockets.sync.client")
    ws = ws_mod.connect(
        f"ws://127.0.0.1:{tts_server.app.port}/api/v1/tts/ws",
        open_timeout=30)
    ws.send(json.dumps({"text": "   "}))
    msg = json.loads(ws.recv(timeout=30))
    assert msg["type"] == "error"
    ws.close()
