import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.models import fsmn_vad  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (  # noqa: E402
    BatchedVadTicker,
)
from toolbox_for_asr_and_tts_tpu.asr.vad import StreamingVadStepper  # noqa: E402

CFG = fsmn_vad.FsmnVadConfig()


@pytest.fixture(scope="module")
def params():
    return fsmn_vad.init_params(jax.random.PRNGKey(0), CFG)


def _chunk(seed):
    rng = np.random.default_rng(seed)
    return (0.2 * rng.standard_normal(6400)).astype(np.float32)


def test_batched_matches_individual(params):
    """One batched tick over S sessions == S individual steppers."""
    ticker = BatchedVadTicker(params, CFG, capacity=8)
    slots = [ticker.join() for _ in range(3)]
    individual = [StreamingVadStepper(params, CFG) for _ in range(3)]
    for step in range(4):
        chunks = {slot: _chunk(100 * i + step)
                  for i, slot in enumerate(slots)}
        batched = ticker.tick(chunks)
        for i, slot in enumerate(slots):
            want = individual[i](chunks[slot])
            assert batched[slot] == want, f"step {step} session {i}"


def test_join_leave_reuses_slots(params):
    ticker = BatchedVadTicker(params, CFG, capacity=2)
    a = ticker.join()
    b = ticker.join()
    with pytest.raises(RuntimeError):
        ticker.join()
    ticker.leave(a)
    c = ticker.join()
    assert c == a  # slot reused with reset state
    ticker.tick({b: _chunk(1), c: _chunk(2)})


def test_empty_tick(params):
    ticker = BatchedVadTicker(params, CFG, capacity=4)
    assert ticker.tick({}) == {}
    s = ticker.join()
    # tiny chunk yields no frames yet → False
    out = ticker.tick({s: np.zeros(100, np.float32)})
    assert out[s] is False


def test_uneven_lengths_keep_caches_exact(params):
    """Sessions that joined at different times (different frontend phases)
    still match their individual steppers exactly."""
    ticker = BatchedVadTicker(params, CFG, capacity=8)
    a = ticker.join()
    ia = StreamingVadStepper(params, CFG)
    # session a runs two ticks alone
    for step in range(2):
        got = ticker.tick({a: _chunk(step)})
        assert got[a] == ia(_chunk(step))
    # session b joins mid-stream: its first push emits fewer frames than a's
    b = ticker.join()
    ib = StreamingVadStepper(params, CFG)
    for step in range(3):
        ca, cb = _chunk(10 + step), _chunk(20 + step)
        got = ticker.tick({a: ca, b: cb})
        assert got[a] == ia(ca), f"a diverged at step {step}"
        assert got[b] == ib(cb), f"b diverged at step {step}"


import pytest as _pytest


@_pytest.mark.parametrize("fused", [False, True], ids=["batched", "fused"])
def test_batched_chunked_asr_matches_single_sessions(fused):
    """S sessions through one BatchedChunkedASR tick == S independent
    OnlineRecognizers, fired-embedding-for-fired-embedding — including a
    session joining late and one leaving mid-stream. fused mode runs the
    whole tick (audio→fbank→LFR→encoder→CIF) as ONE device program and
    returns bf16 embeddings (looser tolerance)."""
    import jax
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.asr.tokenizer import CharTokenizer
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    audios = [(rng.standard_normal(16000) * 0.1).astype(np.float32)
              for _ in range(3)]

    ticker = BatchedChunkedASR(params, cfg, ocfg, capacity=4, fused=fused)
    slots = [ticker.join(), ticker.join()]
    got = {0: [], 1: [], 2: []}
    step = 3200
    for i in range(0, 16000, step):
        if i == step * 2:           # third session joins late
            slots.append(ticker.join())
        if i == step * 3 and slots[1] is not None:
            ticker.leave(slots[1])  # second session leaves mid-stream
            slots[1] = None
        chunks = {slots[j]: audios[j][i:i + step]
                  for j in range(len(slots)) if slots[j] is not None}
        fired = ticker.tick(chunks)
        for j, s in enumerate(slots):
            if s is not None and s in fired:
                got[j].extend(fired[s])

    # independent single-session references
    tok = CharTokenizer.dummy(cfg.vocab_size)
    for j, start in ((0, 0), (2, step * 2)):
        reco = po.OnlineRecognizer(params, cfg, tok, ocfg)
        for i in range(start, 16000, step):
            reco.push_audio(audios[j][i:i + step])
        want = reco._embeds
        assert len(got[j]) == len(want), (j, len(got[j]), len(want))
        rtol, atol = (3e-2, 5e-3) if fused else (1e-5, 1e-6)
        for a, b in zip(got[j], want):
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                       err_msg=f"session {j}")


def test_fused_partials_match_incremental_recognizer():
    """partials=True: token ids decoded INSIDE the fused tick == an
    OnlineRecognizer in incremental partial mode on the same audio."""
    import jax
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.asr.tokenizer import CharTokenizer
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(20)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    ticker = BatchedChunkedASR(params, cfg, ocfg, capacity=2, partials=True)
    slot = ticker.join()
    got = []
    for s in range(0, 16000, 3200):
        fired = ticker.tick({slot: audio[s:s+3200]})
        got.extend(fired.get(slot, []))

    reco = po.OnlineRecognizer(params, cfg, CharTokenizer.dummy(64), ocfg,
                               partial_mode="incremental")
    for s in range(0, 16000, 3200):
        reco.push_audio(audio[s:s+3200])
    assert got == reco._inc_ids, (got, reco._inc_ids)
    assert len(got) > 0


def test_fused_ticker_on_mesh_matches_single_device():
    """Session rows shard over the mesh data axis (params replicated):
    8-device dp serving must produce exactly the single-device token ids."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rng = np.random.default_rng(30)
    audios = [(rng.standard_normal(9600) * 0.1).astype(np.float32)
              for _ in range(8)]

    def run(ticker):
        slots = [ticker.join() for _ in range(8)]
        got = {i: [] for i in range(8)}
        for s in range(0, 9600, 3200):
            fired = ticker.tick({slots[i]: audios[i][s:s+3200]
                                 for i in range(8)})
            for i in range(8):
                got[i].extend(fired.get(slots[i], []))
        return got

    got_mesh = run(BatchedChunkedASR(params, cfg, ocfg, capacity=8,
                                     partials=True, mesh=mesh))
    got_one = run(BatchedChunkedASR(params, cfg, ocfg, capacity=8,
                                    partials=True))
    assert got_mesh == got_one
    assert any(len(v) for v in got_one.values())


def test_pipelined_tick_matches_unpipelined():
    """CHUNKED_PIPELINE=1 (double-buffered dispatch): results lag one tick
    but the stream's total fired ids — including the finalize drain — are
    IDENTICAL to the unpipelined ticker."""
    import jax
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(21)
    audio = {0: (rng.standard_normal(19200) * 0.1).astype(np.float32),
             1: (rng.standard_normal(19200) * 0.1).astype(np.float32)}

    def run(pipelined):
        t = BatchedChunkedASR(params, cfg, ocfg, capacity=2, partials=True)
        t._pipelined = pipelined
        slots = {k: t.join() for k in audio}
        got = {k: [] for k in audio}
        per_tick = {k: [] for k in audio}
        def route(fired):
            for k in audio:
                got[k].extend(fired.get(slots[k], []))
        for s in range(0, 19200, 3840):
            fired = t.tick({slots[k]: a[s:s + 3840]
                            for k, a in audio.items()})
            for k in audio:
                per_tick[k].append(len(fired.get(slots[k], [])))
            route(fired)
        for k in audio:
            # finalize returns results for EVERY row the drain advanced —
            # route them all, like service/hub.py does
            route(t.finalize_slot(slots[k]))
        return got, per_tick

    plain, _ = run(False)
    piped, piped_ticks = run(True)
    assert piped == plain
    # the lag is real: the pipelined first tick returns nothing
    assert piped_ticks[0][0] == 0


def test_bucketed_occupancy_ramp_matches_unbucketed():
    """Occupancy-bucketed ticks (gather/scatter sub-batch below capacity/2,
    full masked program above) produce EXACTLY the unbucketed ticker's ids
    as sessions ramp 1→6 across the hybrid boundary at capacity 8."""
    import jax
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(23)
    audios = [(rng.standard_normal(12800) * 0.1).astype(np.float32)
              for _ in range(6)]

    def run(bucketed):
        t = BatchedChunkedASR(params, cfg, ocfg, capacity=8, partials=True,
                              bucketed=bucketed)
        slots = []
        got = {}
        for s in range(0, 12800, 3200):
            k = s // 3200
            # sessions 1/2/4/6 live on ticks 0/1/2/3: buckets 1,2,4 take
            # the gather path (bucket*2 ≤ 8), 6 → bucket 8 takes the full
            # masked path
            while len(slots) < (1, 2, 4, 6)[k]:
                slots.append(t.join())
                got[len(slots) - 1] = []
            fired = t.tick({slots[i]: audios[i][s:s + 3200]
                            for i in range(len(slots))})
            for i, sl in enumerate(slots):
                got[i].extend(fired.get(sl, []))
        for i, sl in enumerate(slots):
            for sl2, ids in t.finalize_slot(sl).items():
                got[slots.index(sl2)].extend(ids)
        return got

    plain = run(False)
    bucketed = run(True)
    assert bucketed == plain
    assert any(len(v) for v in plain.values())


def test_pipelined_reset_drops_only_that_slot():
    import jax
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(22)
    t = BatchedChunkedASR(params, cfg, ocfg, capacity=2, partials=True)
    t._pipelined = True
    s0, s1 = t.join(), t.join()
    a = (rng.standard_normal(7680) * 0.1).astype(np.float32)
    b = (rng.standard_normal(7680) * 0.1).astype(np.float32)
    t.tick({s0: a[:3840], s1: b[:3840]})     # in flight
    t.reset_slot(s0)                          # drops s0's in-flight ids only
    fired = t.tick({s1: b[3840:]})
    assert s0 not in {k for k, v in fired.items() if v}


def test_at_capacity_is_dedicated_type(params):
    """Capacity exhaustion raises AtCapacity specifically — the serving
    layer's degrade path must not trigger on unrelated RuntimeErrors
    (jaxlib transients subclass RuntimeError)."""
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import AtCapacity
    ticker = BatchedVadTicker(params, CFG, capacity=1)
    ticker.join()
    with pytest.raises(AtCapacity):
        ticker.join()


def test_join_setup_failure_returns_row(params, monkeypatch):
    """A transient device error during join's reset must NOT leak the
    popped row (round-3 review finding: the leak class commit 5c2e5c5
    fixed, reintroduced via the overflow path's broad except)."""
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import AtCapacity
    ticker = BatchedVadTicker(params, CFG, capacity=2)

    def boom(slot):
        raise RuntimeError("injected transient device error")

    monkeypatch.setattr(ticker, "_reset_slot", boom)
    with pytest.raises(RuntimeError) as ei:
        ticker.join()
    assert not isinstance(ei.value, AtCapacity)
    monkeypatch.undo()
    # both rows still available: the failed join returned its slot
    a, b = ticker.join(), ticker.join()
    ticker.tick({a: _chunk(1), b: _chunk(2)})


def test_packed_compaction_leave_midstream_matches_unbucketed():
    """Round-4 packed-state compaction: leave() relocates the last live
    row into the vacated one. Sessions that leave mid-stream must not
    disturb the SURVIVORS' results — their ids must match an unbucketed
    run of the same join/leave schedule — and the packed invariant (live
    rows form [0, n_live)) must hold after every transition."""
    import jax
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(31)
    audios = [(rng.standard_normal(12800) * 0.1).astype(np.float32)
              for _ in range(5)]

    def check_invariant(t):
        if not t.bucketed:
            return
        rows = sorted(t._slot_row.values())
        assert rows == list(range(t._n_live)), (rows, t._n_live)
        assert {t._row_slot[r] for r in rows} == set(t._slot_row)

    def run(bucketed):
        t = BatchedChunkedASR(params, cfg, ocfg, capacity=8, partials=True,
                              bucketed=bucketed)
        slots = [t.join() for _ in range(5)]
        check_invariant(t)
        got = {i: [] for i in range(5)}
        live = set(range(5))
        for k, s in enumerate(range(0, 12800, 3200)):
            if k == 2:
                # drop sessions 0 and 3 mid-stream: slot 0's row receives
                # the relocated tail row; slot 3's vacates again after
                for i in (0, 3):
                    t.leave(slots[i])
                    live.discard(i)
                check_invariant(t)
            fired = t.tick({slots[i]: audios[i][s:s + 3200] for i in live})
            for i in live:
                got[i].extend(fired.get(slots[i], []))
        for i in sorted(live):
            for sl2, ids in t.finalize_slot(slots[i]).items():
                got[slots.index(sl2)].extend(ids)
            t.leave(slots[i])
            live.discard(i)
            check_invariant(t)
        # the freed rows are reusable: new joins land on the prefix again
        s_new = t.join()
        check_invariant(t)
        t.leave(s_new)
        return got

    plain = run(False)
    packed = run(True)
    for i in (1, 2, 4):         # survivors must match exactly
        assert packed[i] == plain[i], (i, packed[i], plain[i])
    assert any(len(plain[i]) for i in (1, 2, 4))


def test_vad_packed_compaction_leave_midstream(params):
    """Round-4 packed VAD cache: dropping a session mid-stream relocates
    the tail row; survivors must keep matching their individual steppers
    bit-for-bit, and the packed invariant must hold."""
    ticker = BatchedVadTicker(params, CFG, capacity=8)
    slots = [ticker.join() for _ in range(4)]
    individual = [StreamingVadStepper(params, CFG) for _ in range(4)]
    live = set(range(4))
    for step in range(6):
        if step == 3:
            ticker.leave(slots[0])        # row 0 vacated → tail relocates
            live.discard(0)
            rows = sorted(ticker._slot_row.values())
            assert rows == list(range(ticker._n_live))
        chunks = {slots[i]: _chunk(100 * i + step) for i in live}
        batched = ticker.tick(chunks)
        for i in live:
            want = individual[i](chunks[slots[i]])
            assert batched[slots[i]] == want, (step, i)
    for i in sorted(live):
        ticker.leave(slots[i])
    assert ticker._n_live == 0


def _pcm_grid(x):
    return (np.clip(np.round(x * 32768), -32768, 32767) / 32768.0
            ).astype(np.float32)


def test_vad_ticker_int16_transfer_lossless(params, monkeypatch):
    """PARAFORMER_TRANSFER_INT16=1 halves the fbank upload; for
    int16-grid audio (all service inputs) the VAD decisions are
    identical to the f32 path."""
    def run(flag):
        monkeypatch.setenv("PARAFORMER_TRANSFER_INT16", flag)
        t = BatchedVadTicker(params, CFG, capacity=4)
        slots = [t.join() for _ in range(2)]
        out = []
        for step in range(3):
            chunks = {slots[i]: _pcm_grid(_chunk(10 * i + step))
                      for i in range(2)}
            res = t.tick(chunks)
            out.append([res[s] for s in slots])
        return out

    assert run("1") == run("0")


def test_chunked_ticker_int16_transfer_lossless(monkeypatch):
    import jax
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.models import paraformer_online as po
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)

    cfg = paraformer.ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=2, decoder_layers=2, vocab_size=64)
    ocfg = po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)
    p = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    audio = _pcm_grid((rng.standard_normal(9600) * 0.1).astype(np.float32))

    def run(flag):
        monkeypatch.setenv("PARAFORMER_TRANSFER_INT16", flag)
        t = BatchedChunkedASR(p, cfg, ocfg, capacity=4, partials=True)
        s = t.join()
        got = []
        for i in range(0, len(audio), 3200):
            fired = t.tick({s: audio[i:i + 3200]})
            got.extend(fired.get(s, []))
        for _, ids in t.finalize_slot(s).items():
            got.extend(ids)
        return got

    assert run("1") == run("0")
