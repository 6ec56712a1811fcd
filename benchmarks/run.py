"""Benchmark harnesses for the five BASELINE.json configs.

Each subcommand prints one JSON line like bench.py. Usage:

    python benchmarks/run.py offline      # config 1: one 10 s WAV, RTF
    python benchmarks/run.py batch        # config 2: batched ASR + punc
    python benchmarks/run.py streaming    # config 3: chunked VAD+ASR latency
    python benchmarks/run.py tts          # config 4: full-size TTS RTF
    python benchmarks/run.py ttfa         # streaming TTS time-to-first-audio
    python benchmarks/run.py voiceloop    # config 5: concurrent sessions
    python benchmarks/run.py all

Targets (driver north star, per TPU v5e chip): offline ASR RTF ≤ 0.05,
TTS RTF ≤ 0.1. Synchronization is host-fetch based (see bench.py note on the
axon runtime).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _wav(secs: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    return (0.25 * np.sin(2 * np.pi * 280 * t)
            + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


def _emit(metric: str, value: float, unit: str, baseline: float) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 6),
                      "unit": unit,
                      "vs_baseline": round(baseline / max(value, 1e-12), 3)}))


def bench_offline() -> None:
    """Config 1: single 10 s utterance through the full offline path."""
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    import jax.numpy as jnp
    reco = Recognizer.random(use_mesh=False, param_dtype=jnp.bfloat16)
    wav = _wav(10.0)
    reco.transcribe([wav])   # compile + upload
    reco.transcribe([wav])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        reco.transcribe([wav])
    rtf = (time.perf_counter() - t0) / iters / 10.0
    _emit("offline_asr_rtf_b1", rtf, "rtf", 0.05)


def bench_longform() -> None:
    """Round-2c: 10 MINUTES of audio through transcribe_long (silence-aware
    split into ≤120 s bucket pieces, batch recognition, timestamp-offset
    merge) — the path diarization/finalize uses for arbitrary-length
    buffers."""
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    import jax.numpy as jnp
    reco = Recognizer.random(use_mesh=False, param_dtype=jnp.bfloat16)
    secs = 600.0
    rng = np.random.default_rng(0)
    wav = (0.25 * np.sin(2 * np.pi * 280 * np.arange(int(16000 * secs))
                         / 16000)
           + 0.02 * rng.standard_normal(int(16000 * secs))).astype(np.float32)
    # plant silences every ~50 s so the splitter cuts at real pauses
    for c in range(1, 12):
        i = int(c * 50 * 16000)
        wav[i - 4800:i + 4800] = 0.0
    res = reco.transcribe_long(wav)      # compile (several buckets) + upload
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        res = reco.transcribe_long(wav)
    rtf = (time.perf_counter() - t0) / iters / secs
    assert res.timestamps_ms == sorted(res.timestamps_ms)
    _emit("longform_asr_rtf_10min", rtf, "rtf", 0.05)


def bench_batch() -> None:
    """Config 2: batched recognition + punctuation (REST-path compute)."""
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    from toolbox_for_asr_and_tts_tpu.models.ct_transformer import Punctuator
    import jax.numpy as jnp
    reco = Recognizer.random(use_mesh=False, param_dtype=jnp.bfloat16)
    punc = Punctuator.random()
    wavs = [_wav(10.0, seed=i) for i in range(8)]
    reco.transcribe(wavs)
    reco.transcribe(wavs)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        results = reco.transcribe(wavs)
        for r in results:
            punc.punctuate(r.text or "你好")
    rtf = (time.perf_counter() - t0) / iters / 80.0
    _emit("batch_asr_punc_rtf", rtf, "rtf", 0.05)


def bench_streaming() -> None:
    """Config 3: per-chunk latency of the streaming session (400 ms chunks,
    energy VAD + endpointing + finalize)."""
    from toolbox_for_asr_and_tts_tpu.asr import session as S
    from toolbox_for_asr_and_tts_tpu.service.engines import build_engines
    engines = build_engines(None, use_mesh=False)
    sess = S.StreamingASRSession(engines, use_wake=False, use_sv=False)
    chunk = _wav(0.4)
    silence = np.zeros(6400, np.float32)
    # warm the finalize path
    for i in range(3):
        sess.process_chunk(_wav(0.4, seed=i))
    for _ in range(6):
        sess.process_chunk(silence)
    sess.finalize()
    sess.reset_asr_state()
    lat = []
    for i in range(50):
        t0 = time.perf_counter()
        sess.process_chunk(chunk if i % 3 else silence)
        lat.append(time.perf_counter() - t0)
    p95 = float(np.percentile(lat, 95))
    # budget: a 400 ms chunk must process far faster than real time
    _emit("streaming_chunk_p95_s", p95, "s", 0.4)


def bench_tts() -> None:
    """Config 4: full-size Sambert+HiFi-GAN synthesis RTF."""
    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    synth = Synthesizer.random(tiny=False, param_dtype=jnp.bfloat16)
    text = ("患者目前诊断为高血压和糖尿病。建议低盐低脂饮食，适量运动，"
            "定期监测血压和血糖。如有头晕头痛及时就诊。注意休息，避免劳累。")
    synth.synthesize(text)  # compile
    synth.synthesize(text)
    t0 = time.perf_counter()
    iters = 3
    total_audio = 0.0
    for _ in range(iters):
        res = synth.synthesize(text)
        total_audio += len(res.wav) / res.sample_rate
    rtf = (time.perf_counter() - t0) / max(total_audio, 1e-9)
    _emit("tts_rtf", rtf, "rtf", 0.1)


def bench_ttfa() -> None:
    """Time-to-first-audio of the STREAMING TTS path (synthesize_stream: the
    first segment runs alone as one small program and is emitted before the
    rest of the job synthesizes). The reference's poll-only job API cannot
    return audio before the whole job ends (tts_service.py:507-936), so its
    TTFA equals whole-job latency — measured here as the comparison row."""
    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    synth = Synthesizer.random(tiny=False, param_dtype=jnp.bfloat16)
    text = ("患者目前诊断为高血压和糖尿病。建议低盐低脂饮食，适量运动，"
            "定期监测血压和血糖。如有头晕头痛及时就诊。注意休息，避免劳累。")
    for _ in range(2):                      # compile both paths + upload
        for _ in synth.synthesize_stream(text):
            break                           # first chunk is enough
        synth.synthesize(text)
    iters = 5
    first, whole = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        gen = synth.synthesize_stream(text)
        ev = next(gen)
        first.append(time.perf_counter() - t0)
        for _ in gen:                       # finish the job cleanly
            pass
        assert ev["event"] == "chunk" and len(ev["audio"])
        t0 = time.perf_counter()
        synth.synthesize(text)
        whole.append(time.perf_counter() - t0)
    ttfa = float(np.median(first))
    job = float(np.median(whole))
    sys.stderr.write(f"ttfa: streaming first audio {ttfa * 1e3:.1f} ms vs "
                     f"whole-job {job * 1e3:.1f} ms ({job / ttfa:.1f}×)\n")
    print(json.dumps({"metric": "tts_time_to_first_audio_s",
                      "value": round(ttfa, 4), "unit": "s",
                      "whole_job_s": round(job, 4),
                      "vs_baseline": round(job / max(ttfa, 1e-9), 3)}))


def bench_voiceloop() -> None:
    """Config 5: N concurrent streaming sessions sharing one engine
    (data-parallel batch serving is the TPU answer to concurrency)."""
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    import jax.numpy as jnp
    reco = Recognizer.random(use_mesh=False, param_dtype=jnp.bfloat16)
    n_streams = 16
    wavs = [_wav(6.0, seed=i) for i in range(n_streams)]
    reco.transcribe(wavs)
    reco.transcribe(wavs)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        reco.transcribe(wavs)
    dt = (time.perf_counter() - t0) / iters
    per_stream_rtf = dt / (n_streams * 6.0)
    streams = 1.0 / per_stream_rtf  # sustainable real-time streams per chip
    print(json.dumps({"metric": "concurrent_streams_per_chip",
                      "value": round(streams, 1), "unit": "streams",
                      "vs_baseline": round(streams / (1.0 / 0.05), 3)}))


def bench_chunked_streams() -> None:
    """Round 2: concurrent CHUNKED-encoder streaming sessions — S full-size
    online Paraformer sessions (k/v caches, FunASR chunk geometry) advanced
    by one 240 ms step in ONE jitted device call."""
    import jax
    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig()
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    import os
    # batch width amortizes the fixed per-tick dispatch cost. The
    # 2026-08-18 sweep (RESULTS.md): 64→~200, 128→267-347, 160→392,
    # 192→334-432 (paired A/B vs 64: +65-75%), 224→415, 256→285 — the
    # knee was ~192 rows in round 3; the round-4 packed/donated in-place
    # ticks + int16 uploads moved it to ~384 (2026-08-19 sweep: 192→p50 484,
    # 256→555, 384→669, 448→429, 512→359 — past 384 the tick wall blows the
    # 240 ms budget), so 384 is the default
    capacity = int(os.getenv("CHUNKED_CAPACITY", "384"))
    pipelined = os.getenv("CHUNKED_PIPELINE", "1") in ("1", "true")
    ticker = BatchedChunkedASR(params, cfg,
                               po.OnlineConfig(tokens_per_chunk=4),
                               capacity=capacity,
                               partials=os.getenv("CHUNKED_PARTIALS", "1")
                               in ("1", "true"),
                               pipelined=pipelined)
    slots = [ticker.join() for _ in range(capacity)]
    rng = np.random.default_rng(0)
    chunk_s = 0.24  # c1=4 LFR frames
    chunk = {s: (rng.standard_normal(int(16000 * chunk_s)) * 0.1
                 ).astype(np.float32) for s in slots}
    ticker.tick(chunk)  # compile + upload
    ticker.tick(chunk)
    # N independent runs → p5/p50/p95 (VERDICT round-2 #4: a single mean
    # hid 1.4× tunnel variance); CHUNKED_PIPELINE=1 (default) overlaps the
    # fetch of tick t-1 with tick t's compute
    runs = int(os.getenv("CHUNKED_RUNS", "7"))
    iters = 10
    per_run = []
    for _ in range(runs):
        t0 = time.perf_counter()
        for _ in range(iters):
            ticker.tick(chunk)
        dt = (time.perf_counter() - t0) / iters
        per_run.append(capacity * chunk_s / dt)
    p5, p50, p95 = (float(np.percentile(per_run, q)) for q in (5, 50, 95))
    sys.stderr.write(
        f"chunked: {runs} runs, pipelined={pipelined}, "
        f"p5={p5:.1f} p50={p50:.1f} p95={p95:.1f} streams/chip\n")
    print(json.dumps({"metric": "chunked_streams_per_chip",
                      "value": round(p50, 1), "unit": "streams",
                      "p5": round(p5, 1), "p95": round(p95, 1),
                      "pipelined": pipelined,
                      "vs_baseline": round(p50 / 20.0, 3)}))


def _quiesce(engines, timeout_s: float = 240.0) -> None:
    """Wait until ALL serving hubs are idle (no pending work, activity
    counters still for 5 s) — a failed rung's stragglers keep draining
    queued chunks and late finalizes for up to a minute, and that backlog
    would otherwise poison the NEXT rung's latencies. Watching only the
    finalize hub is not enough: the backlog usually sits UPSTREAM, as
    queued speech chunks in the chunked/VAD hubs."""
    hubs = [lane for h in (
        engines.diarizer, engines.kws,
        getattr(engines.streaming_factory, "hub", None),
        getattr(engines.vad_factory, "hub", None))
        if h is not None
        # a LanedHub (VOICE_TICK_LANES>1) is a facade — watch its lanes
        for lane in getattr(h, "lanes", [h])
        if hasattr(lane, "_pending")]
    deadline = time.time() + timeout_s
    t_quiet = None
    last = None
    while time.time() < deadline:
        pending = 0
        for h in hubs:
            if hasattr(h, "_pending"):
                with h._lock:
                    pending += len(h._pending)
        activity = tuple(getattr(h, "requests", 0)
                         + getattr(h, "submissions", 0) for h in hubs)
        if pending == 0 and activity == last:
            if t_quiet is None:
                t_quiet = time.time()
            elif time.time() - t_quiet >= 5.0:
                return
        else:
            t_quiet = None
        last = activity
        time.sleep(1.0)
    sys.stderr.write("wsload: quiesce timed out (serving backlog)\n")


def bench_wsload() -> None:
    """Config 5 measured AT THE SERVICE LAYER (VERDICT round-2 #3): N real
    WebSocket clients push base64-JSON 0.4 s chunks through service/http.py
    → session FSM → the batched VAD/ASR hubs, paced at real time. A stream
    counts as sustained when its finalize `result` frame lands within 2 s of
    the last chunk. Reports the largest all-green rung of an 8→64 ladder
    plus p95 result latency there.

    Reference counterpart: the per-connection FunASR WS loop
    (voice-service/app/api/voice.py:92-926) — one GPU call per connection
    per chunk; here every connection's chunk joins one fused device tick.
    """
    import asyncio
    import base64
    import logging as _logging
    import os
    import threading

    # timestamped warnings (slow-tick diagnostics from service/hub.py)
    _logging.basicConfig(
        level=_logging.WARNING, force=True,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    os.environ.setdefault("VOICE_DISABLE_LLM", "1")
    # Load driver: the native epoll client (native/wsload_client, ONE
    # process/thread for all streams) when built, else Python threads.
    # Default ladder tops at 128 — green on this 1-CPU tunnel host since
    # the round-5 profiled rerun (2026-08-20, twice: 128/128 at p95 2.77 s
    # and 2.60 s; RESULTS.md). The round-3 walls are both gone: the native
    # driver removed the CLIENT wall (96 Python threads + server on one
    # core never finished the connect rendezvous) and packed prefix ticks
    # removed the 64-of-128 gather+scatter HBM wall (was 46/64, p95
    # 4.07 s). The WSLOAD_PROFILE=1 per-rung breakdown settles what limits
    # n=128: hub-tick busy spans the whole rung wall while server+client
    # CPU total ~3.5 s of 15.6 s — tick occupancy (device dispatch +
    # tunnel RTT wait), not host CPU; r4's one-off 102/128 "host-bound"
    # reading was a tunnel-phase artifact predating int16 tick uploads.
    import subprocess
    import tempfile
    native_bin = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "toolbox_for_asr_and_tts_tpu", "native", "wsload_client")
    use_native = (os.getenv("WSLOAD_NATIVE", "1") in ("1", "true")
                  and os.path.exists(native_bin))
    ladder = tuple(int(x) for x in os.getenv(
        "WSLOAD_LADDER", "8,16,32,64,96,128").split(","))
    os.environ.setdefault("VOICE_BATCH_CAPACITY", str(max(ladder)))
    os.environ.setdefault("VOICE_HUB_TIMEOUT_S", "600")
    from websockets.sync.client import connect as ws_connect

    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    from toolbox_for_asr_and_tts_tpu.service.engines import build_engines
    from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes

    engines = build_engines(None, use_mesh=False)
    app = create_app(engines=engines)
    loop = asyncio.new_event_loop()

    def _serve():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0, ready=asyncio.Event()))
        loop.run_forever()

    threading.Thread(target=_serve, daemon=True).start()
    for _ in range(200):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)

    chunk_s = 0.4
    rng = np.random.default_rng(0)
    t = np.arange(int(16000 * chunk_s)) / 16000
    speech = (0.3 * np.sin(2 * np.pi * 260 * t)
              + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    silence = np.zeros_like(speech)
    b64 = {True: base64.b64encode(encode_wav_bytes(speech, 16000)).decode(),
           False: base64.b64encode(encode_wav_bytes(silence, 16000)).decode()}
    # 3 speech + 7 silence chunks = one 2 s-endpoint utterance cycle
    pattern = [True] * 3 + [False] * 7

    pcm_dir = None
    if use_native:
        import atexit
        import shutil
        pcm_dir = tempfile.mkdtemp(prefix="wsload_pcm_")
        atexit.register(shutil.rmtree, pcm_dir, ignore_errors=True)
        for name, arr in (("speech", speech), ("silence", silence)):
            (np.clip(arr, -1.0, 1.0) * 32767).astype("<i2").tofile(
                os.path.join(pcm_dir, name + ".pcm"))
        sys.stderr.write(f"wsload: native epoll driver ({native_bin})\n")

    def _native_rung(n, cycles, deadline, hard=None):
        """One rung via the C++ epoll driver: all n streams from one
        process/thread, binary PCM chunks, zero-key masking. Returns the
        same out[] rows the Python client fills."""
        cmd = [native_bin, "--port", str(app.port), "--n", str(n),
               "--cycles", str(cycles), "--deadline", str(deadline),
               "--chunk-ms", str(int(chunk_s * 1000)),
               # rendezvous scales with n: N upgrades + hub joins (device
               # round trips) serialize on one event loop, and the tunnel's
               # idle-wake stall can add ~11 s — the driver's flat 30 s
               # default would zero the 96/128 rungs at the handshake
               "--connect-timeout", str(max(60, 3 * n)),
               "--speech", os.path.join(pcm_dir, "speech.pcm"),
               "--silence", os.path.join(pcm_dir, "silence.pcm")]
        if hard is not None:
            cmd += ["--hard-timeout", str(hard)]
        out = [None] * n
        budget = max(600.0, float(deadline) * cycles + 300.0)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=budget)
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"wsload native rung n={n}: driver timeout\n")
            return out
        if proc.stderr:
            sys.stderr.write(proc.stderr[-2000:])
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "idx" in rec:
                err = rec.get("err")
                out[rec["idx"]] = ((rec["ok"], rec["lat"]) if err is None
                                   else (rec["ok"], rec["lat"], err))
        return out

    def client(n_cycles, out, idx, barrier, deadline=4.0):
        ws = None
        try:
            # keepalive off: during multi-minute first compiles the server
            # process is GIL-bound tracing XLA programs and pong latency is
            # not the quantity under test
            ws = ws_connect(f"ws://127.0.0.1:{app.port}/api/v1/voice/asr/ws",
                            open_timeout=30, ping_interval=None)
            ws.recv(timeout=30)                          # welcome
            ws.send(json.dumps({"use_wake": False, "use_sv": False,
                                "use_llm": False}))
            # scale the rendezvous with the party: N sequential connects on
            # a 1-CPU host can near-exceed a flat 60 s, and ONE timeout
            # breaks the barrier for every thread (seen at n=96:
            # BrokenBarrierError ×96)
            barrier.wait(timeout=max(60, 3 * barrier.parties))
            # de-synchronize: real streams don't endpoint in lockstep, and
            # a synchronized finalize storm measures the worst phase only
            time.sleep((idx % 8) * 0.05)
            lat = []
            for cycle in range(n_cycles):
                # cycle 0 is a GRACE cycle: any program shape the warmup
                # missed (sentence-length punc buckets etc.) compiles here,
                # off the books — the rung measures steady state, like
                # every other bench in this file excludes first compiles
                grace = cycle == 0 and n_cycles > 1
                got_result = False
                t_send = time.perf_counter()
                for is_speech in pattern:
                    t_send = time.perf_counter()
                    ws.send(json.dumps({"audio_data": b64[is_speech]}))
                    # drain frames without blocking the real-time pace;
                    # result latency counts from the most recent chunk send
                    # (≈ server tick + finalize delay)
                    while True:
                        try:
                            msg = json.loads(ws.recv(timeout=0.001))
                        except Exception:
                            break
                        if msg.get("type") == "result":
                            got_result = True
                            if not grace:
                                lat.append(time.perf_counter() - t_send)
                    time.sleep(max(0.0, chunk_s - (time.perf_counter() - t_send)))
                # latency and the deadline both count from the LAST CHUNK
                # SEND (t_send), matching the in-loop measurement above —
                # counting from here would hide up to chunk_s of wait in
                # exactly the slow cases
                missed = False
                warned = False
                while not got_result:
                    waited = time.perf_counter() - t_send
                    if waited > deadline:
                        # keep waiting (up to 60 s) so the TRUE latency is
                        # recorded; the stream still counts as not sustained
                        missed = True
                        if not warned and waited > 15.0:
                            warned = True
                            sys.stderr.write(
                                f"{time.strftime('%H:%M:%S')} client {idx} "
                                f"cycle {cycle}: result >15s late\n")
                    if waited > max(60.0, deadline):
                        # hard abandon — but never below the caller's
                        # deadline: warm-ladder rungs pass deadline=600 so
                        # leftover multi-minute compiles can finish off the
                        # books (a fixed 60 s bail made that parameter dead
                        # code and failed warm rungs mid-compile)
                        out[idx] = (False, lat)
                        return
                    try:
                        msg = json.loads(ws.recv(timeout=0.2))
                    except Exception:
                        continue
                    if msg.get("type") == "result":
                        got_result = True
                        if not grace:
                            lat.append(time.perf_counter() - t_send)
                if missed and not grace:
                    out[idx] = (False, lat)
                    return
            out[idx] = (True, lat)
        except Exception as e:
            out[idx] = (False, [], f"{type(e).__name__}: {e}"[:120])
        finally:
            # ALWAYS close: a failed stream that leaves its socket open
            # keeps its server session alive, and its queued chunks/finalize
            # poison the next rung (round-3 finding: 48 leaked sessions made
            # the post-64 rung measure their backlog, not its own load)
            try:
                if ws is not None:
                    ws.close()
            except Exception:
                pass

    # warmup server-side FIRST: compile the hub tick/finalize + diarization
    # programs directly (multi-minute XLA compiles over the tunnel must not
    # burn client deadlines or keepalives), then one uncounted WS cycle
    t_w = time.perf_counter()
    if engines.vad_factory is not None:
        stepper = engines.vad_factory()
        for _ in range(3):
            stepper(speech)
        if hasattr(stepper, "close"):
            stepper.close()
    if engines.streaming_factory is not None:
        sr = engines.streaming_factory()
        for _ in range(3):
            sr.push_audio(speech)
        sr.finalize()
        if hasattr(sr, "close"):
            sr.close()
    # finalize path at the ladder's batch buckets: concurrent finalizes
    # meet in FinalizeHub → diarize_batch, whose batch axis is
    # power-of-two-padded. The 0.05 s client desync means finalizes arrive
    # in ANY pow-2 group size, not just the full rung — warm every size ≤16
    # (an unwarmed size compiles for minutes over the tunnel mid-rung and
    # sinks the whole rung; seen as 34 s p95 before this covered 2/4)
    diar = getattr(engines.diarizer, "inner", engines.diarizer)
    # session buffers land at 2.0–2.4 s (pre-speech FIFO adds up to one
    # chunk) — warm BOTH audio buckets or rung finalizes recompile
    # sizes up to the finalize hub's 64-batch cap, at BOTH audio buckets,
    # in the need_spk=False variant the SV-off bench sessions take (its
    # programs are a strict subset of the spk path's)
    for n_chunks in (5, 6):
        fin_wav = np.concatenate([speech] * n_chunks)
        for nb in (1, 2, 4, 8, 16, 32, 64):
            diar.diarize_batch([fin_wav] * nb, need_spk=False)
        for nb in (1, 4, 16):   # spk-path extras (embed/cluster) at spot sizes
            diar.diarize_batch([fin_wav] * nb)
    # segment embeddings: the shape space is CLOSED — pow-2 batch sizes
    # (diarize_batch pads counts) × the 1/2/4 s audio buckets any span of a
    # ≤2.4 s session buffer can land in (bucketing.DEFAULT_AUDIO_BUCKETS_S).
    # Warm ALL of it: one leftover shape compiles for minutes over the
    # tunnel mid-rung and wedges every finalize queued behind it (the
    # 0/8-after-a-passing-warm-ladder failure mode)
    for nb in (1, 2, 4, 8, 16, 32, 64):
        for dur in (14400, 30000, 38400):   # → 1 s / 2 s / 4 s buckets
            engines.verifier.embed([np.zeros(dur, np.float32)] * nb)
    punc = getattr(diar, "punctuator", None)
    if punc is not None:
        for nb in (1, 2, 4, 8, 16, 32, 64):
            for txt in ("热", "热" * 28):    # both token-length buckets
                punc.punctuate_many([txt] * nb)
    sys.stderr.write(
        f"wsload server warmup {time.perf_counter() - t_w:.0f}s\n")
    if use_native:
        wout = _native_rung(1, 1, 300.0, hard=300.0)
    else:
        wout = [None]
        wbar = threading.Barrier(1)
        wth = threading.Thread(target=client, args=(1, wout, 0, wbar, 300.0),
                               daemon=True)
        wth.start()
        wth.join(timeout=300)
    sys.stderr.write(f"wsload warmup: {wout[0] and wout[0][0]}\n")

    # UNCOUNTED full-ladder pass: direct warmup can't anticipate every
    # (batch, bucket) shape concurrent finalizes produce (buffer lengths
    # shift with VAD phase; FinalizeHub groups arrivals arbitrarily) — one
    # throwaway pass at each rung compiles whatever is left, so the
    # measured pass below is steady-state (every other bench in this file
    # likewise excludes first-call compiles)
    for n in ladder:
        t0 = time.perf_counter()
        if use_native:
            out = _native_rung(n, 1, 600.0, hard=600.0)
        else:
            out = [None] * n
            barrier = threading.Barrier(n)
            threads = [threading.Thread(target=client,
                                        args=(1, out, i, barrier, 600.0),
                                        daemon=True) for i in range(n)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=600)
        n_ok = sum(1 for o in out if o and o[0])
        excs = [o[2] for o in out if o and not o[0] and len(o) > 2]
        sys.stderr.write(
            f"wsload warm-ladder n={n}: {n_ok}/{n} in "
            f"{time.perf_counter() - t0:.1f}s"
            + (f" (exc sample: {excs[0]} ×{len(excs)})" if excs else "")
            + "\n")
        _quiesce(engines)
        if n_ok < n:
            # a failed warm rung means the measured ladder stops below this
            # n anyway; warming higher rungs only builds more backlog
            break

    def _hub_tick_sum():
        """Aggregate busy seconds of every hub's tick loop (device dispatch
        + result wait), from the tick-latency histogram sums."""
        from toolbox_for_asr_and_tts_tpu.runtime.prom import REGISTRY
        return sum(float(ln.split()[-1])
                   for ln in REGISTRY.render().splitlines()
                   if ln.startswith("toolbox_hub_tick_seconds_sum"))

    profile = os.getenv("WSLOAD_PROFILE", "0") in ("1", "true")

    def _measure_rung(n):
        t0 = time.perf_counter()
        if profile:
            import resource
            cpu0 = os.times()
            ch0 = resource.getrusage(resource.RUSAGE_CHILDREN)
            hub0 = _hub_tick_sum()
        if use_native:
            out = _native_rung(n, 2, 4.0)
        else:
            out = [None] * n
            barrier = threading.Barrier(n)
            threads = [threading.Thread(target=client,
                                        args=(2, out, i, barrier),
                                        daemon=True) for i in range(n)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=60)
        ok = [o for o in out if o and o[0]]
        lats = [x for o in out if o for x in o[1]]
        p95 = float(np.percentile(lats, 95)) if lats else float("nan")
        excs = [o[2] for o in out if o and not o[0] and len(o) > 2]
        wall = time.perf_counter() - t0
        sys.stderr.write(f"wsload n={n}: {len(ok)}/{n} sustained, "
                         f"result-latency p95={p95 * 1e3:.0f} ms, wall "
                         f"{wall:.1f}s"
                         + (f" (exc sample: {excs[0]} ×{len(excs)})"
                            if excs else "") + "\n")
        if profile:
            # where did the rung's time go? (VERDICT-r4 weak #4: "host-bound"
            # must be a measurement, not an inference). server = THIS
            # process (HTTP/WS shell + session FSMs + hub threads); client =
            # reaped children (the native epoll driver — subprocess.run has
            # returned, so RUSAGE_CHILDREN includes it); hub-busy = tick-loop
            # seconds (mostly device dispatch + tunnel RTT wait, NOT cpu).
            cpu1 = os.times()
            ch1 = resource.getrusage(resource.RUSAGE_CHILDREN)
            sys.stderr.write(
                f"wsload profile n={n}: wall {wall:.1f}s | server-cpu "
                f"{(cpu1[0] - cpu0[0]) + (cpu1[1] - cpu0[1]):.1f}s | "
                f"client-cpu {(ch1.ru_utime - ch0.ru_utime) + (ch1.ru_stime - ch0.ru_stime):.1f}s | "
                f"hub-tick busy {_hub_tick_sum() - hub0:.1f}s\n")
        return len(ok), p95

    def _poke():
        # absorb the tunnel's idle-wake stall: the FIRST device call after
        # a few seconds of quiet intermittently takes ~11 s even on warmed
        # shapes (observed twice at the same point — the first measured
        # finalize after the quiesced warm ladder). One throwaway finalize
        # pays it off the books.
        diar.diarize_batch([np.concatenate([speech] * 5)], need_spk=False)

    best, best_p95 = 0, float("nan")
    for n in ladder:
        _poke()
        n_ok, p95 = _measure_rung(n)
        if n_ok < n and n_ok <= n // 2:
            # anomaly guard: a mostly-failed rung right after a green warm
            # ladder is a device/tunnel transient (observed: one 11 s
            # batch-1 finalize stall zeroed an n=8 rung and with it the
            # whole benchmark), not the capacity verdict — retry ONCE after
            # a quiesce. A near-miss (more than half sustained) is treated
            # as the honest capacity edge and NOT retried.
            sys.stderr.write(f"wsload n={n}: {n_ok}/{n} after a green warm "
                             "ladder — transient suspected, one retry\n")
            _quiesce(engines)
            _poke()   # quiesce idles the device again — re-absorb the stall
            n_ok, p95 = _measure_rung(n)
        if n_ok == n:
            best, best_p95 = n, p95
        else:
            break
        _quiesce(engines)   # drain leftover finalizes before the next rung
    # hub telemetry for post-mortems (tick latencies, batch sizes)
    from toolbox_for_asr_and_tts_tpu.runtime.prom import REGISTRY
    sys.stderr.write("\n".join(
        ln for ln in REGISTRY.render().splitlines()
        if ln.startswith(("toolbox_hub_", "toolbox_asr_"))) + "\n")
    print(json.dumps({"metric": "ws_service_streams_sustained",
                      "value": best, "unit": "streams",
                      "p95_result_latency_s": round(best_p95, 3),
                      "vs_baseline": round(best / 20.0, 3)}))
    # graceful teardown: close the server (cancelling live connections so
    # their finally blocks release hub rows), stop the loop and hub threads
    # BEFORE the interpreter's atexit shuts executors down
    try:
        asyncio.run_coroutine_threadsafe(app.shutdown(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        time.sleep(0.5)
        engines.close()
    except Exception:
        pass


# deterministic wake-FSM pacing (all chunks 0.4 s):
#   wake: 4 speech chunks fill the 1600 ms KWS FIFO → fires on chunk 4
#   enroll: wake seeds 1.6 s; 8 speech + 5 silence satisfy the ≥5 s-speech
#           ∧ ≥2 s-silence AND-rule (voice.py:527-548); buffer = 6.8 s
#   asr: 3 speech + silence until the 2 s endpoint → SV-gated finalize
WAKE_N_WAKE, WAKE_N_ENROLL_SP, WAKE_N_ENROLL_SIL = 4, 8, 8
WAKE_ASR_PATTERN = [True] * 3 + [False] * 7


def wake_client(port, b64, n_cycles, out, idx, barrier,
                deadline=4.0, chunk_s=0.4):
    """One wake-mode WS stream: wake → enrollment → start_asr → SV-gated
    ASR cycles (the reference's full 4-mode FSM, voice.py:375-663).
    Module-level so tests/test_wsload_wake.py drives it against test-size
    engines; bench_wsload_wake fans N of these out as threads."""
    from websockets.sync.client import connect as ws_connect
    ws = None
    phase = "connect"
    lats = {"wake": [], "enroll": [], "result": []}
    try:
        ws = ws_connect(f"ws://127.0.0.1:{port}/api/v1/voice/asr/ws",
                        open_timeout=60, ping_interval=None)
        ws.recv(timeout=60)                          # welcome
        barrier.wait(timeout=max(60, 3 * barrier.parties))
        time.sleep((idx % 8) * 0.05)                 # de-synchronize
        flags = {"use_wake": True, "use_sv": True, "use_llm": False}
        seen = {"wakeup": False, "enrolled": False}
        t_send = time.perf_counter()

        def paced_send(is_speech, extra=None):
            """Send one chunk, then drain frames for the REST of the pace
            window (latency = arrival − send, bench_wsload's
            from-the-most-recent-chunk-send convention).
            Returns [(msg, latency_s), …]."""
            nonlocal t_send
            t_send = time.perf_counter()
            body = {"audio_data": b64[is_speech]}
            if extra:
                body.update(extra)
                extra.clear()
            ws.send(json.dumps(body))
            frames = []
            while True:
                left = chunk_s - (time.perf_counter() - t_send)
                if left <= 0:
                    return frames
                try:
                    msg = json.loads(ws.recv(timeout=left))
                except TimeoutError:
                    continue
                except Exception:
                    time.sleep(max(0.0, chunk_s
                                   - (time.perf_counter() - t_send)))
                    return frames
                frames.append((msg, time.perf_counter() - t_send))

        def await_frame(pred, phase_deadline):
            """Block (paced sends stopped) until pred(msg); latency counts
            from the most recent chunk send. None ⇒ abandoned."""
            while True:
                if time.perf_counter() - t_send > max(60.0, phase_deadline):
                    return None
                try:
                    msg = json.loads(ws.recv(timeout=0.2))
                except Exception:
                    continue
                if pred(msg):
                    return time.perf_counter() - t_send

        for cycle in range(n_cycles):
            grace = cycle == 0 and n_cycles > 1
            dl = 600.0 if grace else deadline
            # ---- phase 1: wake (first cycle only — stays activated) ----
            if not seen["wakeup"]:
                phase = "wake"
                for k in range(WAKE_N_WAKE):
                    for m, lat in paced_send(True, extra=dict(flags)):
                        if m.get("type") == "wakeup":
                            seen["wakeup"] = True
                            lats["wake"].append(lat)
                if not seen["wakeup"]:
                    lat = await_frame(lambda m: m.get("type") == "wakeup", dl)
                    if lat is None:
                        out[idx] = (False, lats, f"no wakeup (cycle {cycle})")
                        return
                    seen["wakeup"] = True
                    lats["wake"].append(lat)
                if lats["wake"][-1] > dl:
                    out[idx] = (False, lats, "wake late")
                    return
            # ---- phase 2: enrollment (first cycle only — persists) -----
            if not seen["enrolled"]:
                phase = "enroll"
                for k in range(WAKE_N_ENROLL_SP):
                    paced_send(True)
                for k in range(WAKE_N_ENROLL_SIL):
                    for m, lat in paced_send(False):
                        if m.get("type") == "enrollment_completed":
                            seen["enrolled"] = True
                            lats["enroll"].append(lat)
                    if seen["enrolled"]:
                        break
                if not seen["enrolled"]:
                    lat = await_frame(
                        lambda m: m.get("type") == "enrollment_completed", dl)
                    if lat is None:
                        out[idx] = (False, lats, "no enrollment_completed")
                        return
                    seen["enrolled"] = True
                    lats["enroll"].append(lat)
                # ---- phase 3: confirm ----------------------------------
                phase = "confirm"
                t_send = time.perf_counter()
                ws.send(json.dumps({"type": "start_asr"}))
                if await_frame(
                        lambda m: m.get("status") == "asr_started", dl) is None:
                    out[idx] = (False, lats, "no asr_started")
                    return
            # ---- phase 4: SV-gated ASR ---------------------------------
            phase = "asr"
            got_result = False
            for is_speech in WAKE_ASR_PATTERN:
                for m, lat in paced_send(is_speech):
                    if m.get("type") == "result":
                        got_result = True
                        if not grace:
                            lats["result"].append(lat)
            if not got_result:
                lat = await_frame(lambda m: m.get("type") == "result", dl)
                if lat is None:
                    out[idx] = (False, lats, "no result")
                    return
                if not grace:
                    lats["result"].append(lat)
                    if lat > deadline:
                        out[idx] = (False, lats, "result late")
                        return
        out[idx] = (True, lats)
    except Exception as e:
        out[idx] = (False, lats, f"{phase}: {type(e).__name__}: {e}"[:160])
    finally:
        try:
            if ws is not None:
                ws.close()
        except Exception:
            pass


def bench_wsload_wake() -> None:
    """Wake-gated service load (VERDICT round-3 #1): N real WS clients each
    drive the FULL 4-mode FSM — wake (1600 ms KWS FIFO → KwsHub batch) →
    enrollment (≥5 s speech + 2 s silence AND-rule; model VAD through
    VadHub) → start_asr → SV-gated ASR with finalize through FinalizeHub's
    need_spk path + per-speaker verify. This is the reference's default
    medical deployment shape (VOICE_REQUIRE_WAKE,
    voice_interface.py:1277-1486) which round-3 load tests always disabled
    (use_wake=False, use_sv=False).

    Random weights are neutralized, not bypassed — the DEVICE WORK is real:
    VOICE_KWS_THRESHOLD=-1e9 (every full window scores; the first fires),
    VOICE_VAD_THRESHOLD=2.0 (VAD ticks every enrollment chunk; the decision
    stays energy-based so the FSM paces deterministically). Load driver: the
    native epoll client speaks the full wake→enroll→start_asr handshake
    (wsload_client.cpp --wake, round 5) so the measurement is not walled by
    N Python client threads on a 1-CPU host; WSLOAD_NATIVE=0 falls back to
    Python-thread clients (wake_client above)."""
    import asyncio
    import base64
    import logging as _logging
    import os
    import subprocess
    import tempfile
    import threading

    _logging.basicConfig(
        level=_logging.WARNING, force=True,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    os.environ.setdefault("VOICE_DISABLE_LLM", "1")
    os.environ.setdefault("VOICE_KWS_THRESHOLD", "-1e9")
    os.environ.setdefault("VOICE_KWS_AOT", "1")
    os.environ.setdefault("VOICE_VAD_THRESHOLD", "2.0")
    ladder = tuple(int(x) for x in os.getenv(
        "WSLOAD_LADDER", "8,16,32,64").split(","))
    os.environ.setdefault("VOICE_BATCH_CAPACITY", str(max(ladder)))
    os.environ.setdefault("VOICE_HUB_TIMEOUT_S", "600")

    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app
    from toolbox_for_asr_and_tts_tpu.service.engines import build_engines
    from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes

    engines = build_engines(None, use_mesh=False)
    app = create_app(engines=engines)
    loop = asyncio.new_event_loop()

    def _serve():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0, ready=asyncio.Event()))
        loop.run_forever()

    threading.Thread(target=_serve, daemon=True).start()
    for _ in range(200):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)

    chunk_s = 0.4
    rng = np.random.default_rng(0)
    t = np.arange(int(16000 * chunk_s)) / 16000
    speech = (0.3 * np.sin(2 * np.pi * 260 * t)
              + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    silence = np.zeros_like(speech)
    b64 = {True: base64.b64encode(encode_wav_bytes(speech, 16000)).decode(),
           False: base64.b64encode(encode_wav_bytes(silence, 16000)).decode()}

    # ---- server-side warmup (same rationale as bench_wsload) ----------
    t_w = time.perf_counter()
    if engines.vad_factory is not None:
        stepper = engines.vad_factory()
        for _ in range(3):
            stepper(speech)
        if hasattr(stepper, "close"):
            stepper.close()
    if engines.streaming_factory is not None:
        sr = engines.streaming_factory()
        for _ in range(3):
            sr.push_audio(speech)
        sr.finalize()
        if hasattr(sr, "close"):
            sr.close()
    # KWS batch programs were AOT-compiled at boot (VOICE_KWS_AOT=1)
    diar = getattr(engines.diarizer, "inner", engines.diarizer)
    # SV finalize path: need_spk diarize at both session-buffer buckets and
    # every pow-2 batch the FinalizeHub can form, plus the enrollment-
    # embedding (6.8 s → 8 s bucket) and segment-verify embeds
    for n_chunks in (5, 6):
        fin_wav = np.concatenate([speech] * n_chunks)
        for nb in (1, 2, 4, 8, 16, 32, 64):
            diar.diarize_batch([fin_wav] * nb)
    for nb in (1, 2, 4, 8, 16, 32, 64):
        for dur in (14400, 30000, 38400):   # → 1 s / 2 s / 4 s buckets
            engines.verifier.embed([np.zeros(dur, np.float32)] * nb)
    engines.verifier.embed([np.zeros(16000 * 7, np.float32)])  # 8 s bucket
    punc = getattr(diar, "punctuator", None)
    if punc is not None:
        for nb in (1, 2, 4, 8, 16, 32, 64):
            for txt in ("热", "热" * 28):
                punc.punctuate_many([txt] * nb)
    sys.stderr.write(
        f"wsload-wake server warmup {time.perf_counter() - t_w:.0f}s\n")

    native_bin = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "toolbox_for_asr_and_tts_tpu", "native", "wsload_client")
    use_native = (os.getenv("WSLOAD_NATIVE", "1") in ("1", "true")
                  and os.path.exists(native_bin))
    pcm_dir = None
    if use_native:
        import atexit
        import shutil
        pcm_dir = tempfile.mkdtemp(prefix="wsload_wake_pcm_")
        atexit.register(shutil.rmtree, pcm_dir, ignore_errors=True)
        for name, arr in (("speech", speech), ("silence", silence)):
            (np.clip(arr, -1.0, 1.0) * 32767).astype("<i2").tofile(
                os.path.join(pcm_dir, name + ".pcm"))
        sys.stderr.write(f"wsload-wake: native epoll driver ({native_bin})\n")

    def _native_rung(n, cycles, deadline):
        """One wake rung via the C++ epoll driver (--wake): all n streams
        from one process/thread through the full 4-mode FSM. Returns the
        same (ok, lats-dict[, err]) rows wake_client fills."""
        cmd = [native_bin, "--port", str(app.port), "--n", str(n),
               "--cycles", str(cycles), "--deadline", str(deadline),
               "--chunk-ms", str(int(chunk_s * 1000)), "--wake",
               "--wake-chunks", str(WAKE_N_WAKE),
               "--enroll-speech", str(WAKE_N_ENROLL_SP),
               "--enroll-silence", str(WAKE_N_ENROLL_SIL),
               "--connect-timeout", str(max(60, 3 * n)),
               "--speech", os.path.join(pcm_dir, "speech.pcm"),
               "--silence", os.path.join(pcm_dir, "silence.pcm")]
        out = [None] * n
        budget = max(900.0, float(deadline) * cycles + 600.0)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=budget)
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"wsload-wake native rung n={n}: driver "
                             "timeout\n")
            return out
        if proc.stderr:
            sys.stderr.write(proc.stderr[-2000:])
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "idx" in rec:
                lats = {"wake": rec.get("wake", []),
                        "enroll": rec.get("enroll", []),
                        "result": rec.get("lat", [])}
                err = rec.get("err")
                out[rec["idx"]] = ((rec["ok"], lats) if err is None
                                   else (rec["ok"], lats, err))
        return out

    def _run_rung(n, cycles, deadline):
        if use_native:
            return _native_rung(n, cycles, deadline)
        out = [None] * n
        barrier = threading.Barrier(n)
        threads = [threading.Thread(
            target=wake_client,
            args=(app.port, b64, cycles, out, i, barrier, deadline),
            daemon=True) for i in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=1200 if deadline > 10 else 240)
        return out

    # uncounted warm-ladder pass (compiles whatever direct warmup missed)
    for n in ladder:
        t0 = time.perf_counter()
        out = _run_rung(n, 1, 600.0)
        n_ok = sum(1 for o in out if o and o[0])
        excs = [o[2] for o in out if o and not o[0] and len(o) > 2]
        sys.stderr.write(
            f"wsload-wake warm-ladder n={n}: {n_ok}/{n} in "
            f"{time.perf_counter() - t0:.1f}s"
            + (f" (exc sample: {excs[0]} ×{len(excs)})" if excs else "")
            + "\n")
        _quiesce(engines)
        if n_ok < n:
            break

    def _poke():
        diar.diarize_batch([np.concatenate([speech] * 5)])

    def _measure(n):
        t0 = time.perf_counter()
        out = _run_rung(n, 2, 4.0)
        ok = [o for o in out if o and o[0]]
        res = [x for o in out if o for x in o[1]["result"]]
        wake = [x for o in out if o for x in o[1]["wake"]]
        p95 = float(np.percentile(res, 95)) if res else float("nan")
        p95w = float(np.percentile(wake, 95)) if wake else float("nan")
        excs = [o[2] for o in out if o and not o[0] and len(o) > 2]
        sys.stderr.write(
            f"wsload-wake n={n}: {len(ok)}/{n} sustained, result "
            f"p95={p95 * 1e3:.0f} ms, wake p95={p95w * 1e3:.0f} ms, wall "
            f"{time.perf_counter() - t0:.1f}s"
            + (f" (exc sample: {excs[0]} ×{len(excs)})" if excs else "")
            + "\n")
        return len(ok), p95, p95w

    best, best_p95, best_p95w = 0, float("nan"), float("nan")
    for n in ladder:
        _poke()
        n_ok, p95, p95w = _measure(n)
        if n_ok < n and n_ok <= n // 2:
            sys.stderr.write(f"wsload-wake n={n}: {n_ok}/{n} after a green "
                             "warm ladder — transient suspected, one retry\n")
            _quiesce(engines)
            _poke()
            n_ok, p95, p95w = _measure(n)
        if n_ok == n:
            best, best_p95, best_p95w = n, p95, p95w
        else:
            break
        _quiesce(engines)
    from toolbox_for_asr_and_tts_tpu.runtime.prom import REGISTRY
    sys.stderr.write("\n".join(
        ln for ln in REGISTRY.render().splitlines()
        if ln.startswith(("toolbox_hub_", "toolbox_asr_"))) + "\n")
    print(json.dumps({"metric": "ws_wake_sv_streams_sustained",
                      "value": best, "unit": "streams",
                      "p95_result_latency_s": round(best_p95, 3),
                      "p95_wake_latency_s": round(best_p95w, 3),
                      "vs_baseline": round(best / 20.0, 3)}))
    try:
        asyncio.run_coroutine_threadsafe(app.shutdown(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        time.sleep(0.5)
        engines.close()
    except Exception:
        pass


ALL = {"offline": bench_offline, "batch": bench_batch,
       "streaming": bench_streaming, "tts": bench_tts,
       "voiceloop": bench_voiceloop, "chunked": bench_chunked_streams,
       "wsload": bench_wsload, "wsload-wake": bench_wsload_wake,
       "longform": bench_longform, "ttfa": bench_ttfa}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "all":
        for name, fn in ALL.items():
            if name.startswith("wsload"):
                continue   # ~30 min (service boot + ladder) — run explicitly
            fn()
    else:
        ALL[which]()


if __name__ == "__main__":
    main()
