"""Batched multi-session streaming: many connections, one device program.

The reference runs per-connection model calls (each WS session invokes
FunASR's VAD per chunk, voice.py:449-484). The TPU-native upgrade batches
every live session's 400 ms chunk into ONE jitted FSMN-VAD step per serving
tick: session caches are stacked pytrees ([S, ...] arrays), sessions are
padded up to fixed capacity buckets (no retraces as connections come and
go), and joining/leaving sessions just claim/release a row.

This is the concurrency model the serving mesh assumes (README: "batch =
concurrency"): 77 real-time streams/chip measured for the ASR encoder; the
VAD tick here costs one small kernel for all sessions instead of S kernels.
"""
from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger("toolbox.stream_batcher")

CAPACITY_BUCKETS = (8, 16, 32, 64, 128)

# ONE process-wide lock for first-time tick-program compiles: jax tracing
# is not robust under concurrency (an UnexpectedTracerError from two
# subsystems tracing at once killed 49/64 live WS connections in the
# round-3 wsload rung), and hubs for VAD/chunked/finalize can all hit a
# new shape in different serving threads at the same moment. Round 4
# moved the lock to runtime/compile_lock.py and widened it to the
# recognizer's lazy bucket compiles after an XLA:CPU segfault from a
# hub-thread compile racing a main-thread compile.
from ..runtime.compile_lock import COMPILE_LOCK as _COMPILE_LOCK  # noqa: E402


def _pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class AtCapacity(RuntimeError):
    """All ticker rows are claimed. A DEDICATED type so the serving layer's
    degrade-to-per-session-overflow path cannot be triggered by an unrelated
    RuntimeError (jaxlib's XlaRuntimeError — e.g. a transient tunnel
    FAILED_PRECONDITION during the join's reset call — subclasses
    RuntimeError; catching that as "at capacity" leaked the popped row)."""


class BatchedChunkedASR:
    """Fixed-capacity batched chunked-Paraformer encoder over live sessions.

    The online state pytree (models/paraformer_online.py) is [S, …]-batched
    by construction, so S sessions' 240 ms chunks run as ONE jitted
    encode+CIF step per tick. Rows without a full c1-frame chunk this tick
    are masked: they compute (on zero feats) but a masked merge reverts
    every state leaf, so joining/leaving/starved sessions never pollute
    their caches. Per-session NAR re-decode of fired embeddings stays
    host-driven (it is per-utterance and rare next to the 2.5 Hz tick).
    """

    def __init__(self, params, cfg=None, ocfg=None, capacity: int = 16,
                 cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 fused: bool = True, partials: bool = False, mesh=None,
                 pipelined: bool = False, bucketed: Optional[bool] = None,
                 exec_cache: Optional[dict] = None):
        """fused=True (default): ONE device program per tick — the audio
        ring lives on device and fbank/LFR/CMVN fuse with the encoder+CIF
        (models/paraformer_online.fused_step). fused=False keeps the
        host-frontend path (one batched fbank call + one encoder call).
        partials=True (fused only) also decodes fired tokens INSIDE the same
        program (fsmn-cached incremental decoder); tick() then returns
        per-slot token-id lists instead of embeddings.
        mesh: optional jax.sharding.Mesh with a "data" axis — session rows
        shard across chips (params replicated), so one hub scales streaming
        over ICI; capacity must divide by the data-axis size.
        pipelined (fused only): double-buffered tick dispatch — results lag
        one tick, the fetch of tick t-1 overlaps tick t's compute. The env
        knob (CHUNKED_PIPELINE) is parsed ONCE at the serving layer
        (service/hub.py, benchmarks/run.py), not here.
        exec_cache: optional dict SHARED between tickers built with
        identical geometry/flags (the LanedHub contract, service/hub.py):
        compiled tick/reset/move/tail executables are stored there, so
        lane 2..N reuse lane 1's programs instead of recompiling the whole
        bucket family per lane (minutes per program over the dev tunnel).
        A compiled executable is stateless w.r.t. the caller — donation is
        per-call — so cross-instance sharing is sound as long as avals
        match, which a signature check enforces.
        bucketed (fused, single-device — the default there): PACKED-STATE
        occupancy bucketing (round 4, ROADMAP #7). Live sessions occupy
        the contiguous device-row prefix [0, n_live) — leave() relocates
        the last live row into the vacated one — so each tick SLICES a
        pow-2-sized prefix (static offset 0), steps it mask-merged, and
        writes it back in place (the state buffer is donated). Tick HBM
        traffic is exactly the stepped rows: capacity can be provisioned
        high (128+) without low-occupancy ticks paying the padded batch
        OR the full-state scatter copy the round-3 gather design paid
        (`full.at[idx].set(ns)` copies all capacity rows per tick — the
        wall that broke the n=64 wsload rung at capacity 128)."""
        import jax
        from ..models import paraformer as pf
        from ..models import paraformer_online as po
        self._po = po
        self.cfg = cfg or pf.ParaformerConfig()
        self.ocfg = ocfg or po.OnlineConfig()
        self.capacity = capacity
        self.cmvn = cmvn
        self.mesh = mesh
        self._row_shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_data = mesh.shape["data"]
            if capacity % n_data:
                raise ValueError(f"capacity {capacity} not divisible by "
                                 f"data axis {n_data}")

            def row_shard(a):
                spec = P("data", *([None] * (a.ndim - 1)))
                return jax.device_put(a, NamedSharding(mesh, spec))

            self._row_shard = row_shard
            params = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P())), params)
        self.params = params
        self.fused = fused
        self.partials = partials and fused
        # occupancy bucketing: default ON for the single-device fused path;
        # the mesh path keeps full-capacity ticks (rows are sharded by
        # position over the data axis — a dynamic gather would cross shards)
        self.bucketed = (fused and mesh is None) if bucketed is None \
            else (bucketed and fused and mesh is None)
        # int16 audio transfer (same knob/rationale as Recognizer): at 96
        # live streams a 240 ms tick uploads ~1.5 MB of f32 audio (~34 ms
        # on the dev tunnel at its measured ~45 MB/s) — int16 halves it,
        # losslessly for PCM-sourced service audio. The in-program rescale
        # fuses into the fbank framing.
        from ..runtime.autotune import env_or_profile
        self._int16_transfer = env_or_profile("PARAFORMER_TRANSFER_INT16",
                                              "asr_int16_transfer")
        if fused:
            fcfg = self.cfg.frontend
            self.chunk_samples = self.ocfg.c1 * fcfg.lfr_n * fcfg.frame_shift
            n_rows = capacity
            self.state = po.init_fused_state(self.cfg, self.ocfg, b=n_rows,
                                             decode_partials=self.partials)
            if self._row_shard is not None:
                self.state = jax.tree.map(self._row_shard, self.state)
            c, o = self.cfg, self.ocfg
            dp = self.partials
            cm = None
            if cmvn is not None:
                import jax.numpy as jnp
                cm = (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1]))

            def fstep_prefix(p, state, audio, row_active):
                # PACKED-STATE tick (round 4, ROADMAP #7): live sessions
                # occupy the contiguous row prefix [0, n_live), so a
                # sub-capacity tick SLICES its pow-2 sub-batch (static
                # offset 0) instead of gathering arbitrary rows, and
                # writes it back with a static update-slice. With the
                # state buffer DONATED, XLA performs the write-back in
                # place: HBM traffic is exactly the stepped rows, where
                # the former gather design's `full.at[idx].set(ns)`
                # scatter copied the ENTIRE capacity-row state every tick
                # (the half-state HBM wall that broke the n=64 wsload
                # rung at capacity 128, benchmarks/RESULTS.md ceiling
                # probes). Rows inside the prefix with no chunk this tick
                # are masked out of the merge like the full step's.
                if audio.dtype == jax.numpy.int16:
                    audio = audio.astype(jax.numpy.float32) * (1.0 / 32768.0)
                b = audio.shape[0]
                sub = jax.tree.map(lambda a: a[:b], state)
                res = po.fused_step(p, sub, audio, c, o, cmvn=cm,
                                    k_cap=o.tokens_per_chunk,
                                    decode_partials=dp)

                def merge(new, old):
                    m = row_active.reshape((-1,) + (1,) * (new.ndim - 1))
                    return jax.numpy.where(m.astype(bool), new, old)
                merged = jax.tree.map(merge, res[0], sub)
                out = jax.tree.map(
                    lambda full, ns: jax.lax.dynamic_update_slice_in_dim(
                        full, ns, 0, 0), state, merged)
                n = res[2] * row_active.astype(res[2].dtype)
                if dp:
                    return out, res[1], n, res[3]
                return out, res[1], n

            def fstep_full(p, state, audio, row_active):
                if audio.dtype == jax.numpy.int16:
                    audio = audio.astype(jax.numpy.float32) * (1.0 / 32768.0)
                res = po.fused_step(p, state, audio, c, o, cmvn=cm,
                                    k_cap=o.tokens_per_chunk,
                                    decode_partials=dp)
                new_state, embeds, n = res[0], res[1], res[2]

                def merge(new, old):
                    m = row_active.reshape((-1,) + (1,) * (new.ndim - 1))
                    return jax.numpy.where(m.astype(bool), new, old)
                merged = jax.tree.map(merge, new_state, state)
                n = n * row_active.astype(n.dtype)
                if dp:
                    return merged, embeds, n, res[3]
                return merged, embeds, n

            # bucketed mode runs ONE program family — the packed-prefix
            # step at every pow-2 size up to capacity (bucket == capacity
            # degenerates to the full-width step). All tick programs are
            # AOT-compiled executables cached by bucket size and built
            # under _COMPILE_LOCK: a serving thread can never trace, and
            # an aval drift is a loud error instead of a silent retrace.
            self._fstep_prefix = fstep_prefix
            self._fstep_full = fstep_full
            self._step_execs: Dict[object, object] = {}
        else:
            self.state = po.init_state(self.cfg, self.ocfg, b=capacity)
        # shared executable cache (see docstring): replace the per-instance
        # caches with the shared dicts AFTER the geometry they key on is
        # fixed, and refuse a mismatched share loudly
        self._exec_cache = exec_cache
        if exec_cache is not None:
            sig = ("chunked", capacity, self.fused, self.partials,
                   self.bucketed, self._int16_transfer, self.cfg, self.ocfg,
                   mesh is None)
            if exec_cache.setdefault("signature", sig) != sig:
                raise ValueError(
                    "exec_cache shared across differently-configured "
                    f"tickers: {exec_cache['signature']} vs {sig}")
            if self.fused:
                self._step_execs = exec_cache.setdefault("step_execs", {})
        self._frontends: Dict[int, object] = {}
        self._queues: Dict[int, np.ndarray] = {}
        self._free = list(range(capacity))
        self._lock = threading.Lock()
        # packed-state row map (bucketed only): external slot ids are
        # stable for callers; the DEVICE row a slot owns moves so live
        # rows always form the contiguous prefix [0, n_live). leave()
        # relocates the last live row into the vacated one.
        self._slot_row: Dict[int, int] = {}
        self._row_slot: Dict[int, int] = {}
        self._n_live = 0
        c, o, k_cap = self.cfg, self.ocfg, self.ocfg.tokens_per_chunk

        def step(p, state, feats, row_active, active_win):
            new_state, enc = po.encode_chunk(p, state, feats, c, o)
            active = active_win[None, :] * row_active[:, None]
            new_state, embeds, n = po.predictor_chunk(p, enc, active,
                                                      new_state, c, k_cap)
            # revert every state leaf for inactive rows
            def merge(new, old):
                m = row_active.reshape((-1,) + (1,) * (new.ndim - 1))
                return jax.numpy.where(m.astype(bool), new, old)
            merged = jax.tree.map(merge, new_state, state)
            return merged, embeds, n

        self._step = jax.jit(step)
        w = self.ocfg.window
        self._active_win = np.zeros((w,), np.float32)
        self._active_win[self.ocfg.c0: self.ocfg.c0 + self.ocfg.c1] = 1.0
        self._audio: Dict[int, np.ndarray] = {}
        self._fbank_fns: Dict[Tuple[int, int], object] = {}
        if exec_cache is not None:
            self._fbank_fns = exec_cache.setdefault("fbank_fns", {})
        # double-buffered tick dispatch (fused only): tick t dispatches its
        # device step CHAINED on tick t-1's on-device state (no host sync)
        # and fetches tick t-1's outputs, so the host↔device round trip
        # overlaps the next tick's compute instead of serializing with it.
        # Results lag one tick; finalize drains exactly.
        self._pipelined = self.fused and pipelined
        self._inflight: Optional[Tuple[List[int], tuple]] = None
        self._carry: Dict[int, list] = {}
        # compile the small per-slot programs NOW, while construction is
        # single-threaded. Lazily tracing them inside serving threads raced
        # OTHER subsystems' concurrent compiles (e.g. the finalize hub
        # compiling diarization) and jax tracing is not robust under
        # concurrency — an UnexpectedTracerError from the lazy reset killed
        # 49/64 live WS connections in the wsload rung. The warm call is a
        # semantic no-op (zeroing row 0 of an all-zero state).
        import jax.numpy as jnp
        # AOT-compiled executable (not a re-traceable jit): a compiled
        # callable can NEVER trace at serving time — an input-aval drift
        # becomes a loud error instead of a silent (and thread-unsafe)
        # retrace
        # state is threaded (self.state = fn(self.state, ...)) so the input
        # buffer is donated: row resets/moves update in place instead of
        # copying every leaf of a capacity-row state through HBM
        if exec_cache is not None and "reset" in exec_cache:
            self._reset_fn = exec_cache["reset"]
        else:
            self._reset_fn = jax.jit(lambda st, s: jax.tree.map(
                lambda a: a.at[s].set(jnp.zeros_like(a[s])), st),
                donate_argnums=(0,)).lower(
                    self.state, jnp.asarray(0)).compile()
            if exec_cache is not None:
                exec_cache["reset"] = self._reset_fn
        self.state = self._reset_fn(self.state, jnp.asarray(0))

        def move_row(st, src, dst):
            # copy row src → dst, then zero src (the vacated tail row must
            # not leak a finished session's caches into a masked prefix
            # step)
            def per(a):
                a = a.at[dst].set(a[src])
                return a.at[src].set(jnp.zeros_like(a[src]))
            return jax.tree.map(per, st)

        self._move_fn = None
        if self.bucketed:
            if exec_cache is not None and "move" in exec_cache:
                self._move_fn = exec_cache["move"]
            else:
                self._move_fn = jax.jit(move_row, donate_argnums=(0,)).lower(
                    self.state, jnp.asarray(0), jnp.asarray(0)).compile()
                if exec_cache is not None:
                    exec_cache["move"] = self._move_fn
        if self.partials and (exec_cache is None
                              or "tail" not in self._fbank_fns):
            ccfg = self.cfg

            def tail_fn(p, state, s, embed):
                # slice the slot row INSIDE jit — eager per-leaf slicing
                # costs one device round trip per cache leaf
                dstate = {k: jax.tree.map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, s, 1),
                    state[k])
                    for k in ("fsmn", "hist_len", "mem", "mem_len")}
                return self._po.decode_chunk(
                    p, dstate, embed, jnp.ones((1,), jnp.int32), ccfg)[1]

            d = int(self.state["cif_acc"].shape[-1])
            self._fbank_fns["tail"] = jax.jit(tail_fn).lower(
                self.params, self.state, jnp.asarray(0),
                jnp.zeros((1, 1, d), jnp.float32)).compile()
            self._fbank_fns["tail"](self.params, self.state, jnp.asarray(0),
                                    jnp.zeros((1, 1, d), jnp.float32))

    # ------------------------------------------------- tick executables
    def _prefix_exec(self, bucket: int):
        """Compiled packed-prefix tick program for a pow-2 sub-batch.
        The state argument is donated — the prefix write-back happens in
        place, so a tick's HBM traffic is its stepped rows only."""
        ex = self._step_execs.get(bucket)
        if ex is None:
            import jax
            import jax.numpy as jnp
            with _COMPILE_LOCK:
                ex = self._step_execs.get(bucket)
                if ex is None:
                    dt = jnp.int16 if self._int16_transfer else jnp.float32
                    audio = jnp.zeros((bucket, self.chunk_samples), dt)
                    active = jnp.zeros((bucket,), jnp.float32)
                    ex = jax.jit(self._fstep_prefix,
                                 donate_argnums=(1,)).lower(
                        self.params, self.state, audio, active).compile()
                    self._step_execs[bucket] = ex
        return ex

    def _full_exec(self):
        """Compiled full-width mask-merged tick program."""
        ex = self._step_execs.get("full")
        if ex is None:
            import jax
            import jax.numpy as jnp
            with _COMPILE_LOCK:
                ex = self._step_execs.get("full")
                if ex is None:
                    n_rows = int(self.state["cif_mass"].shape[0])
                    dt = jnp.int16 if self._int16_transfer else jnp.float32
                    batch = jnp.zeros((n_rows, self.chunk_samples), dt)
                    active = jnp.zeros((n_rows,), jnp.float32)
                    if self._row_shard is not None:
                        batch = self._row_shard(batch)
                        active = self._row_shard(active)
                    ex = jax.jit(self._fstep_full).lower(
                        self.params, self.state, batch, active).compile()
                    self._step_execs["full"] = ex
        return ex

    def warm(self) -> None:
        """Compile every tick program this ticker can dispatch (all pow-2
        prefix buckets up to capacity, or the full-width step), so load
        growth at serving time never waits on an XLA compile mid-tick —
        the first tick at each new occupancy otherwise pays a multi-second
        (tunnel: multi-minute) compile exactly when sessions are live.
        Call from startup preload (service/hub.py) or a bench warmup."""
        if not self.fused:
            return
        if self.bucketed:
            b = 1
            while b < self.capacity:
                self._prefix_exec(b)
                b *= 2
            self._prefix_exec(self.capacity)   # covers non-pow-2 capacity
        else:
            self._full_exec()

    def _harvest(self) -> None:
        """Fetch the in-flight dispatch's outputs into the carry buffer.
        The in-flight tuple holds OUTPUTS ONLY (embeds, n[, ids]) — never
        the returned state: that buffer is donated to the next dispatch
        and a held reference would be a use-after-donate."""
        if self._inflight is None:
            return
        pos, outs = self._inflight
        self._inflight = None
        n = np.asarray(outs[1])
        rows = list(pos)
        if self.partials:
            ids = np.asarray(outs[2])
            for s in rows:
                if int(n[pos[s]]) > 0:
                    self._carry.setdefault(s, []).extend(
                        ids[pos[s], : int(n[pos[s]])].tolist())
        else:
            embeds = np.asarray(outs[0]).astype(np.float32)
            for s in rows:
                if int(n[pos[s]]) > 0:
                    self._carry.setdefault(s, []).extend(
                        embeds[pos[s], : int(n[pos[s]])])

    FBANK_QUANTA = 24  # frames per fbank call — FIXED shape, so the program
                       # cache is bounded by group size (CLAUDE.md bucketing
                       # rule; round-2 review finding: raw buffered lengths
                       # compiled one program per distinct byte count)

    def _batched_fbank(self, rows: List[int]) -> None:
        """ONE device fbank call per quantum for all ready rows; per-session
        frontends only do the (host numpy) LFR drain."""
        import jax
        import jax.numpy as jnp
        from ..ops import frontend as fe
        fcfg = self.cfg.frontend
        q = self.FBANK_QUANTA
        span = (q - 1) * fcfg.frame_shift + fcfg.frame_length
        consume = q * fcfg.frame_shift
        while True:
            ready = [s for s in rows if len(self._audio[s]) >= span]
            if not ready:
                return
            key = len(ready)
            if key not in self._fbank_fns:
                self._fbank_fns[key] = jax.jit(
                    lambda a: fe.fbank(a, fcfg, t_frames=q))
            batch = np.stack([self._audio[s][:span] for s in ready])
            fb = np.asarray(self._fbank_fns[key](jnp.asarray(batch)))
            for i, s in enumerate(ready):
                self._audio[s] = self._audio[s][consume:]
                feats = self._frontends[s].push_fbank(fb[i])
                if len(feats):
                    self._queues[s] = np.concatenate(
                        [self._queues[s], feats])

    # ------------------------------------------------------------ rows
    def join(self) -> int:
        from ..models.paraformer_streaming import StreamingFrontend
        with self._lock:
            if not self._free:
                raise AtCapacity("chunked-ASR ticker at capacity")
            slot = self._free.pop()
            if self.bucketed:
                # packed invariant: a new session takes the first row past
                # the live prefix
                row = self._n_live
                self._slot_row[slot] = row
                self._row_slot[row] = slot
                self._n_live += 1
        try:
            if not self.fused:
                self._frontends[slot] = StreamingFrontend(self.cfg.frontend,
                                                          self.cmvn)
                self._queues[slot] = np.zeros((0, self.cfg.input_dim),
                                              np.float32)
            self._audio[slot] = np.zeros(0, np.float32)
            self._reset_slot(slot)
        except BaseException:
            # setup failed (e.g. a transient device error in the reset
            # call): the row is still clean state-wise — return it instead
            # of leaking it for the process lifetime
            with self._lock:
                self._frontends.pop(slot, None)
                self._queues.pop(slot, None)
                self._audio.pop(slot, None)
                if self.bucketed:
                    try:
                        self._release_row_locked(slot)
                    except BaseException:
                        logger.exception("row release after failed join")
                self._free.append(slot)
            raise
        return slot

    def _release_row_locked(self, slot: int) -> None:
        """Return slot's device row to the pool keeping the packed
        invariant: the LAST live row relocates into the vacated one (one
        in-place donated device program: copy + zero the tail row), so
        live rows stay the contiguous prefix [0, n_live). Caller holds
        self._lock."""
        import jax.numpy as jnp
        if not self.bucketed:
            self._reset_slot(slot)
            return
        row = self._slot_row.pop(slot)
        self._row_slot.pop(row)
        last = self._n_live - 1
        if row != last:
            moved = self._row_slot.pop(last)
            self.state = self._move_fn(self.state, jnp.asarray(last),
                                       jnp.asarray(row))
            self._slot_row[moved] = row
            self._row_slot[row] = moved
        else:
            self.state = self._reset_fn(self.state, jnp.asarray(row))
        self._n_live = last

    def leave(self, slot: int) -> None:
        if self.fused and (self._inflight is not None or self._carry):
            self._harvest()
            self._carry.pop(slot, None)
        with self._lock:
            self._frontends.pop(slot, None)
            self._queues.pop(slot, None)
            self._audio.pop(slot, None)
            self._release_row_locked(slot)
            self._free.append(slot)

    def _reset_slot(self, slot: int) -> None:
        # ONE jitted program zeroing row `slot` of every state leaf. The
        # naive eager `tree.map(a.at[slot].set(0))` dispatched one device op
        # PER LEAF (hundreds for a 50-layer k/v cache) — ~7 s of round trips
        # per session join/finalize over the tunnel, serialized under the
        # ticker lock (round-3 wsload finding: 8 concurrent finalizes took
        # 40+ s at the service layer with 0.5 s of actual compute).
        import jax.numpy as jnp
        self.state = self._reset_fn(self.state, jnp.asarray(self._row(slot)))

    def _row(self, slot: int) -> int:
        """Device row a slot currently owns (== slot unless packed)."""
        return self._slot_row.get(slot, slot) if self.bucketed else slot

    def _to_transfer(self, batch: np.ndarray) -> np.ndarray:
        """Host-side int16 quantization for the tick upload (exactly
        lossless for PCM-sourced service audio)."""
        if not self._int16_transfer:
            return batch
        return np.clip(np.round(batch * 32768.0), -32768.0,
                       32767.0).astype(np.int16)

    def reset_slot(self, slot: int) -> None:
        """Session reset (reference reset_asr_state clears streaming caches,
        voice_interface.py:1257-1275): device state row, host audio
        remainder, and the host frontend/feature queue in unfused mode."""
        if self.fused and (self._inflight is not None or self._carry):
            # fetch any in-flight tick, drop THIS slot's stale results (the
            # other rows' carried results flow out with the next tick)
            self._harvest()
            self._carry.pop(slot, None)
        self._reset_slot(slot)
        self._audio[slot] = np.zeros(0, np.float32)
        if not self.fused:
            fe = self._frontends.get(slot)
            if fe is not None:
                fe.reset()
            self._queues[slot] = np.zeros((0, self.cfg.input_dim), np.float32)

    # ------------------------------------------------------------ finalize
    def finalize_slot(self, slot: int) -> Dict[int, list]:
        """Drain a fused slot for its FINAL result (FunASR is_final
        semantics): pad the slot's audio remainder to whole chunks plus two
        trailing silence chunks (2·c1 ≥ c2, so every real frame passes
        through the encoder lookahead into the CIF active region), run the
        ticks, then apply the host-side tail-threshold fire
        (models/paraformer_online.flush_tail). Returns slot → new ids (or
        embeddings when partials=False) for EVERY row the drain advanced —
        the caller must route the other rows' results too. The slot's state
        is NOT reset here; callers follow up with reset_slot/leave."""
        import jax
        import jax.numpy as jnp
        assert self.fused, "finalize_slot requires the fused ticker"
        a_len = self.chunk_samples
        rem = len(self._audio.get(slot, ()))
        pad = (-rem) % a_len + 2 * a_len
        # pipelined mode: the drain must return EVERYTHING now — fetch the
        # in-flight tick first, then run the drain unpipelined (tick()
        # merges the carried results in)
        self._harvest()
        pipelined, self._pipelined = self._pipelined, False
        try:
            fired = self.tick({slot: np.zeros(pad, np.float32)})
        finally:
            self._pipelined = pipelined
        row = self._row(slot)
        mass = float(np.asarray(self.state["cif_mass"][row]))
        frac = mass - np.floor(mass)
        if frac > 0 and frac + self.cfg.predictor_tail_threshold >= 1.0:
            acc = np.asarray(self.state["cif_acc"][row])
            if self.partials:
                # "tail" is pre-compiled at construction (see __init__) so
                # no serving thread ever traces it
                ids = self._fbank_fns["tail"](self.params, self.state,
                                              jnp.asarray(row),
                                              jnp.asarray(acc)[None, None, :])
                fired.setdefault(slot, []).append(int(np.asarray(ids)[0, 0]))
            else:
                fired.setdefault(slot, []).append(acc.astype(np.float32))
        return fired

    # ------------------------------------------------------------ tick
    def tick(self, chunks: Dict[int, np.ndarray]
             ) -> Dict[int, List[np.ndarray]]:
        """chunks: slot → new audio. Returns slot → list of CIF-fired token
        embeddings produced this tick (possibly several steps per tick)."""
        import jax.numpy as jnp
        c1 = self.ocfg.c1
        for slot, audio in chunks.items():
            self._audio[slot] = np.concatenate(
                [self._audio.get(slot, np.zeros(0, np.float32)),
                 np.asarray(audio, np.float32)])
        fired: Dict[int, List[np.ndarray]] = {s: [] for s in chunks}
        if self.fused:
            a_len = self.chunk_samples
            while True:
                rows = [s for s, a in self._audio.items() if len(a) >= a_len]
                if not rows:
                    break
                if self.bucketed:
                    # packed-prefix sub-batch: live rows are contiguous, so
                    # the bucket is the pow-2 cover of the highest READY
                    # row (≤ n_live ≤ capacity). Rows inside the bucket
                    # with no chunk this tick ride along masked.
                    need = 1 + max(self._slot_row[s] for s in rows)
                    bucket = 1
                    while bucket < need:
                        bucket *= 2
                    bucket = min(bucket, self.capacity)
                    batch = np.zeros((bucket, a_len), np.float32)
                    row_active = np.zeros((bucket,), np.float32)
                    pos = {}
                    for s in rows:
                        r = self._slot_row[s]
                        batch[r] = self._audio[s][:a_len]
                        self._audio[s] = self._audio[s][a_len:]
                        row_active[r] = 1.0
                        pos[s] = r
                    res = self._prefix_exec(bucket)(
                        self.params, self.state,
                        jnp.asarray(self._to_transfer(batch)),
                        jnp.asarray(row_active))
                else:
                    # full-width masked step (unfused-capacity layout, or
                    # the mesh path where rows are sharded by position)
                    n_rows = int(self.state["cif_mass"].shape[0])
                    batch = np.zeros((n_rows, a_len), np.float32)
                    row_active = np.zeros((n_rows,), np.float32)
                    pos = {}
                    for s in rows:
                        batch[s] = self._audio[s][:a_len]
                        self._audio[s] = self._audio[s][a_len:]
                        row_active[s] = 1.0
                        pos[s] = s
                    batch_dev = jnp.asarray(self._to_transfer(batch))
                    active_dev = jnp.asarray(row_active)
                    if self._row_shard is not None:
                        batch_dev = self._row_shard(batch_dev)
                        active_dev = self._row_shard(active_dev)
                    res = self._full_exec()(self.params, self.state,
                                            batch_dev, active_dev)
                self.state = res[0]   # device-side chain — no host sync
                self._harvest()                 # previous dispatch's fetch
                # keep OUTPUTS only: res[0] is donated to the next dispatch
                self._inflight = (pos, res[1:])
                if not self._pipelined:
                    self._harvest()             # fetch this tick now
            if self._carry:
                for s, v in self._carry.items():
                    # carried results are OLDER than this tick's — prepend
                    fired[s] = v + fired.get(s, [])
                self._carry.clear()
            return fired
        self._batched_fbank(list(chunks))
        while True:
            rows = [s for s, q in self._queues.items() if len(q) >= c1]
            if not rows:
                break
            batch = np.zeros((self.capacity, c1, self.cfg.input_dim),
                             np.float32)
            row_active = np.zeros((self.capacity,), np.float32)
            for s in rows:
                batch[s] = self._queues[s][:c1]
                self._queues[s] = self._queues[s][c1:]
                row_active[s] = 1.0
            self.state, embeds, n = self._step(
                self.params, self.state, jnp.asarray(batch),
                jnp.asarray(row_active), jnp.asarray(self._active_win))
            n = np.asarray(n)
            embeds = np.asarray(embeds)
            for s in rows:
                if int(n[s]) > 0:
                    fired.setdefault(s, []).extend(embeds[s, : int(n[s])])
        return fired


class BatchedVadTicker:
    """Fixed-capacity batched FSMN-VAD stepper over live sessions.

    Sessions submit equal-length chunks each tick; `tick()` runs one batched
    `apply_streaming` over all active rows and returns per-session speech
    booleans. Feature extraction stays per-session host-side (cheap numpy —
    the device win is the 4-layer FSMN over S rows at once).
    """

    def __init__(self, params, cfg=None, capacity: int = 16,
                 threshold: float = 0.5, cmvn=None,
                 exec_cache: Optional[dict] = None):
        # exec_cache: shared compiled-program dict for identically-
        # configured lane tickers (see BatchedChunkedASR docstring)
        import jax
        from ..models import fsmn_vad
        self._fsmn_vad = fsmn_vad
        self.cfg = cfg or fsmn_vad.FsmnVadConfig()
        self.params = params
        self.threshold = threshold
        self.cmvn = cmvn
        self.capacity = capacity
        # PACKED cache rows (round 4, mirroring BatchedChunkedASR): live
        # sessions occupy the contiguous prefix [0, n_live), ticks slice a
        # pow-2 prefix of the DONATED cache in place — no scratch row, no
        # gather, no full-cache scatter copy (the round-3 design's
        # `at[idx].set` copied every capacity row per tick)
        self.cache = fsmn_vad.init_cache(capacity, self.cfg)
        self._frontends: Dict[int, object] = {}
        self._audio: Dict[int, np.ndarray] = {}   # per-slot raw-sample tails
        self._fbank_fns: Dict[Tuple, object] = {}
        self._free = list(range(capacity))
        self._lock = threading.Lock()
        self._slot_row: Dict[int, int] = {}
        self._row_slot: Dict[int, int] = {}
        self._n_live = 0
        # int16 transfer for the batched fbank upload (same knob/rationale
        # as BatchedChunkedASR; lossless for PCM-sourced service audio)
        from ..runtime.autotune import env_or_profile
        self._int16_transfer = env_or_profile("PARAFORMER_TRANSFER_INT16",
                                              "asr_int16_transfer")
        cfg_ = self.cfg

        def step_prefix(p, feats, cache, mask):
            b = feats.shape[0]
            sub = [c[:b] for c in cache]
            post, new = fsmn_vad.apply_streaming(p, feats, sub, cfg_)
            m = mask[:, None, None]
            merged = [jnp.where(m, nc, oc) for nc, oc in zip(new, sub)]
            out = [jax.lax.dynamic_update_slice_in_dim(full, ns, 0, 0)
                   for full, ns in zip(cache, merged)]
            return post, out

        self._step_prefix_fn = step_prefix
        self._step_execs: Dict[Tuple, object] = {}
        if exec_cache is not None:
            sig = ("vad", capacity, self._int16_transfer, self.cfg)
            if exec_cache.setdefault("signature", sig) != sig:
                raise ValueError(
                    "exec_cache shared across differently-configured VAD "
                    f"tickers: {exec_cache['signature']} vs {sig}")
            self._step_execs = exec_cache.setdefault("step_execs", {})
            self._fbank_fns = exec_cache.setdefault("fbank_fns", {})
        # pre-compile the per-slot reset while construction is single-
        # threaded (same concurrent-trace hazard as BatchedChunkedASR);
        # reset/move donate the cache — in-place row updates
        import jax.numpy as jnp
        if exec_cache is not None and "reset" in exec_cache:
            self._reset_fn = exec_cache["reset"]
            self._move_fn = exec_cache["move"]
        else:
            self._reset_fn = jax.jit(lambda cs, s: [
                c.at[s].set(jnp.zeros_like(c[s])) for c in cs],
                donate_argnums=(0,)).lower(
                    self.cache, jnp.asarray(0)).compile()
            self._move_fn = jax.jit(lambda cs, src, dst: [
                c.at[dst].set(c[src]).at[src].set(jnp.zeros_like(c[src]))
                for c in cs], donate_argnums=(0,)).lower(
                    self.cache, jnp.asarray(0), jnp.asarray(0)).compile()
            if exec_cache is not None:
                exec_cache["reset"] = self._reset_fn
                exec_cache["move"] = self._move_fn
        self.cache = self._reset_fn(self.cache, jnp.asarray(0))

    # ------------------------------------------------------------ rows
    def join(self) -> int:
        """Claim a session row; returns the slot id."""
        from ..models.paraformer_streaming import StreamingFrontend
        with self._lock:
            if not self._free:
                raise AtCapacity("VAD ticker at capacity")
            slot = self._free.pop()
            row = self._n_live          # packed: first row past the prefix
            self._slot_row[slot] = row
            self._row_slot[row] = slot
            self._n_live += 1
        try:
            self._frontends[slot] = StreamingFrontend(self.cfg.frontend,
                                                      self.cmvn)
            self._audio[slot] = np.zeros(0, np.float32)
            self._reset_slot(slot)
        except BaseException:
            with self._lock:   # transient setup error: return the row
                self._frontends.pop(slot, None)
                self._audio.pop(slot, None)
                try:
                    self._release_row_locked(slot)
                except BaseException:
                    logger.exception("row release after failed VAD join")
                self._free.append(slot)
            raise
        return slot

    def _release_row_locked(self, slot: int) -> None:
        """Packed-invariant row release (caller holds self._lock): the last
        live row relocates into the vacated one; the tail row is zeroed."""
        import jax.numpy as jnp
        row = self._slot_row.pop(slot)
        self._row_slot.pop(row)
        last = self._n_live - 1
        if row != last:
            moved = self._row_slot.pop(last)
            self.cache = self._move_fn(self.cache, jnp.asarray(last),
                                       jnp.asarray(row))
            self._slot_row[moved] = row
            self._row_slot[row] = moved
        else:
            self.cache = self._reset_fn(self.cache, jnp.asarray(row))
        self._n_live = last

    def leave(self, slot: int) -> None:
        with self._lock:
            self._frontends.pop(slot, None)
            self._audio.pop(slot, None)
            self._release_row_locked(slot)
            self._free.append(slot)

    def _reset_slot(self, slot: int) -> None:
        # one jitted call for all conv caches, pre-compiled in __init__
        import jax.numpy as jnp
        self.cache = self._reset_fn(self.cache,
                                    jnp.asarray(self._slot_row[slot]))

    def reset_slot(self, slot: int) -> None:
        """Session reset (reference clears vad_cache, voice_interface.py:
        1257-1275): conv caches AND the incremental frontend."""
        self._reset_slot(slot)
        self._audio[slot] = np.zeros(0, np.float32)
        fe = self._frontends.get(slot)
        if fe is not None:
            fe.reset()

    def _exec(self, key: Tuple, build):
        """Compiled-executable cache: build() runs under _COMPILE_LOCK so
        serving threads never trace concurrently, and the cached object is
        a compiled callable that can never silently retrace."""
        ex = self._step_execs.get(key)
        if ex is None:
            with _COMPILE_LOCK:
                ex = self._step_execs.get(key)
                if ex is None:
                    ex = build()
                    self._step_execs[key] = ex
        return ex

    LEN_QUANTUM = 1600       # 0.1 s compile-key bucket for buffered length
    MAX_PASS = 1600 * 64     # 6.4 s per device pass; longer buffers loop

    def _batched_feats(self, slots) -> Dict[int, np.ndarray]:
        """ONE device fbank call per LENGTH BUCKET (uniform chunk cadence ⇒
        exactly one in steady state) instead of one dispatch — and one jit
        entry — per session (round-2d review finding). Buffered lengths are
        padded up to LEN_QUANTUM buckets so the program cache is bounded
        (≤ MAX_PASS/LEN_QUANTUM programs) even against clients that vary
        their chunk sizes; each row's output is host-truncated to the
        frames its REAL samples cover, so numerics match the per-session
        StreamingVadStepper path exactly (zero padding only extends past
        the last complete frame)."""
        import jax
        import jax.numpy as jnp
        from ..ops import frontend as fe
        fcfg = self.cfg.frontend
        q, max_pass = self.LEN_QUANTUM, self.MAX_PASS
        parts: Dict[int, list] = {s: [] for s in slots}
        pending = list(slots)
        while True:
            todo = []
            for s in pending:
                length = min(len(self._audio[s]), max_pass)
                if fe.num_fbank_frames(length, fcfg) > 0:
                    todo.append((s, length))
            if not todo:
                break
            by_bucket: Dict[int, list] = {}
            for s, length in todo:
                lb = min(-(-length // q) * q, max_pass)
                by_bucket.setdefault(lb, []).append((s, length))
            for lb, rows in by_bucket.items():
                t_max = fe.num_fbank_frames(lb, fcfg)
                # rows are packed positionally into a pow-2-sized batch, so
                # fbank cost tracks occupancy, not capacity (and the
                # program-cache key space stays bounded)
                nb = min(_pow2(len(rows)), self.capacity)
                key = ("fb", nb, lb)
                int16_in = self._int16_transfer

                def build(_t=t_max, _nb=nb, _lb=lb):
                    def f(a):
                        if a.dtype == jnp.int16:
                            a = a.astype(jnp.float32) * (1.0 / 32768.0)
                        return fe.fbank(a, fcfg, t_frames=_t)
                    dt = jnp.int16 if int16_in else jnp.float32
                    return jax.jit(f).lower(
                        jnp.zeros((_nb, _lb), dt)).compile()

                batch = np.zeros((nb, lb), np.float32)
                for i, (s, length) in enumerate(rows):
                    batch[i, :length] = self._audio[s][:length]
                if int16_in:
                    batch = np.clip(np.round(batch * 32768.0), -32768.0,
                                    32767.0).astype(np.int16)
                fb = np.asarray(self._exec(key, build)(jnp.asarray(batch)))
                for i, (s, length) in enumerate(rows):
                    n = fe.num_fbank_frames(length, fcfg)
                    self._audio[s] = self._audio[s][n * fcfg.frame_shift:]
                    parts[s].append(fb[i, :n])
        empty = np.zeros((0, fcfg.n_mels), np.float32)
        return {s: self._frontends[s].push_fbank(
                    np.concatenate(p) if p else empty)
                for s, p in parts.items()}

    # ------------------------------------------------------------ tick
    def tick(self, chunks: Dict[int, np.ndarray]) -> Dict[int, bool]:
        """chunks: slot → audio chunk. One batched fbank + one batched FSMN
        step per distinct size (steady state with uniform chunk sizes:
        exactly one of each)."""
        if not chunks:
            return {}
        import jax.numpy as jnp
        for slot, audio in chunks.items():
            self._audio[slot] = np.concatenate(
                [self._audio.get(slot, np.zeros(0, np.float32)),
                 np.asarray(audio, np.float32)])
        feats = self._batched_feats(list(chunks))
        out = {slot: False for slot in chunks}
        # group rows by emitted frame count; rows outside a group keep
        # their cache (zero inputs must not pollute it). Each group runs
        # the packed-prefix program sized to the pow-2 cover of its
        # highest PACKED row — cache rows ride the donated prefix slice,
        # masked where the row is not in this group.
        import jax
        D = self.cfg.input_dim
        lengths = sorted({len(f) for f in feats.values() if len(f) > 0})
        for n in lengths:
            rows = [s for s, f in feats.items() if len(f) == n]
            need = 1 + max(self._slot_row[s] for s in rows)
            nb = min(_pow2(need), self.capacity)
            batch = np.zeros((nb, n, D), np.float32)
            in_group = np.zeros((nb,), bool)
            pos = {}
            for s in rows:
                r = self._slot_row[s]
                batch[r] = feats[s]
                in_group[r] = True
                pos[s] = r
            key = ("p", nb, n)

            def build(_nb=nb, _n=n):
                return jax.jit(self._step_prefix_fn,
                               donate_argnums=(2,)).lower(
                    self.params, jnp.zeros((_nb, _n, D), jnp.float32),
                    self.cache, jnp.zeros((_nb,), bool)).compile()

            post, self.cache = self._exec(key, build)(
                self.params, jnp.asarray(batch), self.cache,
                jnp.asarray(in_group))
            probs = np.asarray(self._fsmn_vad.speech_prob(post, self.cfg))
            for s in rows:
                out[s] = bool((probs[pos[s]] > self.threshold).any())
        return out
