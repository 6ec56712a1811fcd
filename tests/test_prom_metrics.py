"""Prometheus metrics layer (beyond the reference — survey §5 records the
reference has no Prometheus/OTel): registry semantics + /metrics exposition
on both services, with counters that actually move under traffic."""
import asyncio
import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.runtime import prom  # noqa: E402


# ------------------------------------------------------------- registry
def test_counter_gauge_histogram_render():
    reg = prom.Registry()
    c = reg._register(prom.Counter, "t_requests_total", "reqs",
                      ("method",))
    c.inc(method="GET")
    c.inc(2, method="POST")
    g = reg._register(prom.Gauge, "t_conns", "conns", ())
    g.set(3)
    g.dec()
    h = reg._register(prom.Histogram, "t_lat_seconds", "lat", (),
                      buckets=(0.1, 1.0))
    h.observe(0.05)
    h.observe(0.5)
    h.observe(5.0)
    text = reg.render()
    assert '# TYPE t_requests_total counter' in text
    assert 't_requests_total{method="GET"} 1' in text
    assert 't_requests_total{method="POST"} 2' in text
    assert "t_conns 2" in text
    assert 't_lat_seconds_bucket{le="0.1"} 1' in text
    assert 't_lat_seconds_bucket{le="1"} 2' in text
    assert 't_lat_seconds_bucket{le="+Inf"} 3' in text
    assert "t_lat_seconds_count 3" in text
    assert "t_lat_seconds_sum 5.55" in text


def test_callback_gauge_and_reregistration():
    reg = prom.Registry()
    state = {"v": 7}
    g = reg._register(prom.Gauge, "t_active", "active", (),
                      fn=lambda: state["v"])
    assert g is reg._register(prom.Gauge, "t_active", "active", ())
    assert "t_active 7" in reg.render()
    state["v"] = 9
    assert "t_active 9" in reg.render()
    with pytest.raises(ValueError):
        reg._register(prom.Counter, "t_active", "clash", ())


def test_label_mismatch_rejected():
    reg = prom.Registry()
    c = reg._register(prom.Counter, "t_x_total", "x", ("a",))
    with pytest.raises(ValueError):
        c.inc(b="nope")
    with pytest.raises(ValueError):
        c.inc()


def test_escaping():
    reg = prom.Registry()
    c = reg._register(prom.Counter, "t_esc_total", "x", ("p",))
    c.inc(p='say "hi"\nthere\\')
    line = [ln for ln in reg.render().splitlines() if "t_esc" in ln
            and not ln.startswith("#")][0]
    assert '\\"hi\\"' in line and "\\n" in line and "\\\\" in line


# ------------------------------------------------------------- services
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


def _scrape(port):
    httpx = pytest.importorskip("httpx")
    r = httpx.get(f"http://127.0.0.1:{port}/metrics")
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("text/plain")
    return r.text


def test_tts_service_metrics_move():
    httpx = pytest.importorskip("httpx")
    from toolbox_for_asr_and_tts_tpu.service.tts_app import create_app
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    srv = _ServerThread(create_app(
        synthesizer=Synthesizer.random(tiny=True))).start()
    base = f"http://127.0.0.1:{srv.app.port}"

    def jobs_completed(text):
        for ln in text.splitlines():
            if ln.startswith("toolbox_tts_jobs_total") and 'completed' in ln:
                return float(ln.rsplit(" ", 1)[1])
        return 0.0

    before = jobs_completed(_scrape(srv.app.port))
    r = httpx.post(f"{base}/api/v1/tts/start", json={"text": "你好。"})
    jid = r.json()["job_id"]
    for _ in range(600):
        if httpx.get(f"{base}/api/v1/tts/result/{jid}").json()["status"] \
                == "completed":
            break
        time.sleep(0.1)
    text = _scrape(srv.app.port)
    assert jobs_completed(text) == before + 1
    # http request counter carries the route TEMPLATE, not the raw path
    assert 'route="/api/v1/tts/result/{job_id}"' in text
    assert "toolbox_tts_active_jobs 0" in text
    assert "toolbox_tts_job_rtf_count" in text
    assert "toolbox_http_request_seconds_bucket" in text
    srv.stop()


def test_voice_service_metrics_ws_and_finalize():
    ws_mod = pytest.importorskip("websockets.sync.client")
    import base64
    import json as js
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes
    srv = _ServerThread(create_app(engines=E.build_test_engines())).start()

    def metric(text, prefix):
        return [ln for ln in text.splitlines()
                if ln.startswith(prefix) and not ln.startswith("#")]

    def value(text, prefix, default=0.0):
        rows = metric(text, prefix)
        return float(rows[0].rsplit(" ", 1)[1]) if rows else default

    rng = np.random.default_rng(0)
    t = np.arange(6400) / 16000.0
    speech = base64.b64encode(encode_wav_bytes(
        (0.3 * np.sin(2 * np.pi * 300 * t)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32),
        16000)).decode()
    silence = base64.b64encode(encode_wav_bytes(
        np.zeros(6400, np.float32), 16000)).decode()

    # the registry is process-global: other tests may already have finalized
    # utterances — assert DELTAS
    base_text = _scrape(srv.app.port)
    utt0 = value(base_text, "toolbox_asr_utterances_total")
    fin0 = value(base_text, "toolbox_asr_finalize_seconds_count")

    ws = ws_mod.connect(
        f"ws://127.0.0.1:{srv.app.port}/api/v1/voice/asr/ws",
        open_timeout=30)
    ws.recv(timeout=30)  # welcome
    ws.send(js.dumps({"use_wake": False, "use_sv": False, "use_llm": False}))
    mid = _scrape(srv.app.port)
    conns = metric(mid, "toolbox_ws_connections")
    assert any(ln.rsplit(" ", 1)[1] == "1" for ln in conns), conns
    for _ in range(3):
        ws.send(js.dumps({"audio_data": speech}))
    for _ in range(7):   # ≥2 s of silence triggers finalize
        ws.send(js.dumps({"audio_data": silence}))
    got_result = False
    deadline = time.time() + 240   # first finalize compiles on CPU
    while time.time() < deadline:
        try:
            msg = js.loads(ws.recv(timeout=5.0))
        except Exception:
            continue
        if msg.get("type") == "result":
            got_result = True
            break
    ws.close()
    assert got_result
    text = _scrape(srv.app.port)
    assert value(text, "toolbox_asr_utterances_total") == utt0 + 1
    assert value(text, "toolbox_asr_finalize_seconds_count") == fin0 + 1
    # batched serving is default-on → the hubs ticked
    assert any(float(ln.rsplit(" ", 1)[1]) > 0
               for ln in metric(text, "toolbox_hub_ticks_total"))
    srv.stop()
