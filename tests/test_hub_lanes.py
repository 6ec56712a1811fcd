"""LanedHub (service/hub.py): N parallel tick lanes behind one hub facade.

Lanes exist to overlap per-tick device round trips across threads (the
tick-occupancy limiter at the 128-stream WS ceiling, benchmarks/RESULTS.md
r5). These tests pin the facade's CORRECTNESS on CPU: slot routing is
collision-free, per-session streams are bit-identical to the single-hub
path, joins balance, capacity semantics (AtCapacity only when every lane
is full), and the env wiring builds laned hubs.
"""
import threading

import numpy as np
import pytest

import jax

from toolbox_for_asr_and_tts_tpu.asr.tokenizer import CharTokenizer
from toolbox_for_asr_and_tts_tpu.models import paraformer as _pf
from toolbox_for_asr_and_tts_tpu.models import paraformer_online as _po
from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import AtCapacity
from toolbox_for_asr_and_tts_tpu.service.hub import (ChunkedHub,
                                                     HubStreamingRecognizer,
                                                     LanedHub, tick_lanes)

_PCFG = _pf.ParaformerConfig(input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
                             encoder_layers=2, decoder_layers=2, vocab_size=64)
_OCFG = _po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)


@pytest.fixture(scope="module")
def laned_hub():
    params = _pf.init_params(jax.random.PRNGKey(3), _PCFG)
    shared: dict = {}   # lanes share compiled tick programs (engines wiring)
    h = LanedHub(
        lambda i: ChunkedHub(params, _PCFG, _OCFG, CharTokenizer.dummy(64),
                             capacity=2, tick_ms=5.0, exec_cache=shared), 2)
    # the share actually happened: every lane ticker aliases ONE exec dict
    assert all(lane.ticker._step_execs is shared["step_execs"]
               for lane in h.lanes)
    for lane in h.lanes:   # unpipelined: tests read partials mid-stream
        lane.ticker._pipelined = False
    yield h
    h.close()


def test_laned_slot_routing_is_collision_free(laned_hub):
    """Global slots from concurrent joins are unique and decode back to
    (lane, inner) without collisions across lanes with equal inner ids."""
    hub = laned_hub
    slots = [hub.join() for _ in range(4)]
    assert len(set(slots)) == 4
    lanes = [s % hub.n for s in slots]
    # 4 joins over 2×capacity-2 lanes must balance 2/2
    assert sorted(lanes) == [0, 0, 1, 1]
    with pytest.raises(AtCapacity):
        hub.join()
    for s in slots:
        hub.leave(s)
    assert hub._live == [0, 0]


def test_laned_hub_matches_per_session_recognizers(laned_hub):
    """4 sessions spread over 2 lanes accumulate exactly the per-session
    OnlineRecognizer incremental ids — the single-hub equivalence test,
    through the facade."""
    hub = laned_hub
    rng = np.random.default_rng(11)
    n_sessions, step, total = 4, 3200, 12800
    audio = [(rng.standard_normal(total) * 0.1).astype(np.float32)
             for _ in range(n_sessions)]

    params = hub.lanes[0].ticker.params
    want = []
    for i in range(n_sessions):
        reco = _po.OnlineRecognizer(params, _PCFG, CharTokenizer.dummy(64),
                                    _OCFG, partial_mode="incremental")
        for s in range(0, total, step):
            reco.push_audio(audio[i][s:s + step])
        want.append(list(reco._inc_ids))

    recos = [HubStreamingRecognizer(hub) for _ in range(n_sessions)]
    # sessions landed on BOTH lanes
    assert {r.slot % hub.n for r in recos} == {0, 1}
    barrier = threading.Barrier(n_sessions)

    def run(i):
        for s in range(0, total, step):
            barrier.wait()
            recos[i].push_audio(audio[i][s:s + step])

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    tok = CharTokenizer.dummy(64)
    for i in range(n_sessions):
        assert recos[i].partial_text() == tok.ids_to_text(want[i])
        assert len(want[i]) > 0
    # both lanes ticked, and telemetry aggregates over lanes
    assert all(lane.ticks > 0 for lane in hub.lanes)
    assert hub.ticks == sum(lane.ticks for lane in hub.lanes)
    assert hub.submissions >= n_sessions * (total // step)
    for r in recos:
        r.close()


def test_laned_finalize_and_reset_are_lane_local(laned_hub):
    """finalize() drains exactly one session's slot on its own lane; a
    sibling session on the OTHER lane is untouched."""
    hub = laned_hub
    rng = np.random.default_rng(13)
    a = HubStreamingRecognizer(hub)
    b = HubStreamingRecognizer(hub)
    assert a.slot % hub.n != b.slot % hub.n   # balanced onto distinct lanes
    audio = (rng.standard_normal(12800) * 0.1).astype(np.float32)
    for s in range(0, len(audio), 3200):
        a.push_audio(audio[s:s + 3200])
        b.push_audio(audio[s:s + 3200])
    pa, pb = a.partial_text(), b.partial_text()
    assert pa == pb != ""      # same audio, same weights → same partials
    final = a.finalize()
    assert final.startswith(pa) and a.partial_text() == ""
    assert b.partial_text() == pb          # sibling lane untouched
    b.reset()
    assert b.partial_text() == ""
    # replay after reset reproduces the fresh-session stream
    for s in range(0, len(audio), 3200):
        b.push_audio(audio[s:s + 3200])
    assert b.partial_text() == pb
    a.close()
    b.close()


def test_exec_cache_shares_compiled_programs():
    """A second identically-configured ticker built with the same
    exec_cache reuses lane 1's compiled executables (no recompilation —
    over the dev tunnel that is minutes per program family), and a
    mismatched geometry is refused loudly."""
    from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (
        BatchedChunkedASR)
    params = _pf.init_params(jax.random.PRNGKey(5), _PCFG)
    shared: dict = {}
    t1 = BatchedChunkedASR(params, _PCFG, _OCFG, capacity=2, fused=True,
                           partials=True, exec_cache=shared)
    t1.warm()
    n_execs = len(shared["step_execs"])
    assert n_execs > 0
    tail = shared["fbank_fns"]["tail"]
    reset = shared["reset"]
    t2 = BatchedChunkedASR(params, _PCFG, _OCFG, capacity=2, fused=True,
                           partials=True, exec_cache=shared)
    t2.warm()
    # nothing recompiled: same executables, same count
    assert len(shared["step_execs"]) == n_execs
    assert t2._fbank_fns["tail"] is tail
    assert t2._reset_fn is reset
    assert t2._step_execs is t1._step_execs
    # and the shared programs still produce a working ticker: one tick on
    # each, identical audio → identical fired ids
    rng = np.random.default_rng(8)
    audio = (rng.standard_normal(6400) * 0.1).astype(np.float32)
    s1, s2 = t1.join(), t2.join()
    f1 = t1.tick({s1: audio.copy()})
    f2 = t2.tick({s2: audio.copy()})
    t1._harvest(), t2._harvest()
    assert (t1._carry.get(s1) or f1.get(s1)) == \
           (t2._carry.get(s2) or f2.get(s2))
    with pytest.raises(ValueError, match="differently-configured"):
        BatchedChunkedASR(params, _PCFG, _OCFG, capacity=4, fused=True,
                          partials=True, exec_cache=shared)


def test_gather_hub_workers_match_single():
    """KwsHub/FinalizeHub with workers=2 (gather-hub lanes): concurrent
    requests still return the unbatched engines' exact results, telemetry
    sums correctly, close() joins all workers."""
    from toolbox_for_asr_and_tts_tpu.models.kws_ctc import KeywordSpotter
    from toolbox_for_asr_and_tts_tpu.service.hub import FinalizeHub, KwsHub

    def _win(seed, secs=1.6):
        rng = np.random.default_rng(seed)
        t = np.arange(int(16000 * secs)) / 16000
        return (0.3 * np.sin(2 * np.pi * (200 + 20 * seed) * t)
                + 0.05 * rng.standard_normal(len(t))).astype(np.float32)

    kws = KeywordSpotter.random(threshold=0.0)
    windows = [_win(i) for i in range(6)]
    singles = [kws.detect_audio(w) for w in windows]
    hub = KwsHub(kws, window_ms=40.0, workers=2)
    try:
        assert len(hub._threads) == 2
        out = [None] * len(windows)
        ths = [threading.Thread(
            target=lambda i=i: out.__setitem__(i, hub.detect_audio(windows[i])))
            for i in range(len(windows))]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=300)
        assert hub.requests == len(windows)
        for got, want in zip(out, singles):
            assert got is not None and got[0] == want[0]
            np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-5)
    finally:
        hub.close()
    assert all(not t.is_alive() for t in hub._threads)

    class Echo:
        def diarize_batch(self, wavs, sr=16000, need_spk=True):
            return [float(np.sum(w)) for w in wavs]

    fhub = FinalizeHub(Echo(), window_ms=40.0, workers=2)
    try:
        wavs = [np.full(160, i, np.float32) for i in range(8)]
        out = [None] * len(wavs)
        ths = [threading.Thread(
            target=lambda i=i: out.__setitem__(i, fhub.diarize(wavs[i])))
            for i in range(len(wavs))]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=120)
        assert out == [float(np.sum(w)) for w in wavs]
        assert fhub.requests == len(wavs)
    finally:
        fhub.close()


def test_laned_env_wiring(monkeypatch):
    """VOICE_TICK_LANES=2 builds LanedHub in BOTH serving factories with
    ceil-divided per-lane capacity (total never shrinks)."""
    monkeypatch.setenv("VOICE_BATCH_SERVING", "1")
    monkeypatch.setenv("VOICE_ENABLE_PARTIALS", "1")
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "3")
    monkeypatch.setenv("VOICE_TICK_LANES", "2")
    assert tick_lanes() == 2
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    from toolbox_for_asr_and_tts_tpu.service.engines import (_streaming_factory,
                                                             _vad_factory)
    reco = Recognizer.random(_PCFG, use_mesh=False)
    factory = _streaming_factory(reco)
    try:
        hub = factory.hub
        assert isinstance(hub, LanedHub) and hub.n == 2
        # ceil(3/2)=2 per lane → 4 total rows ≥ the requested 3
        assert sum(lane.ticker.capacity for lane in hub.lanes) >= 3
        st = factory()
        rng = np.random.default_rng(7)
        out = st.push_audio((rng.standard_normal(6400) * 0.1)
                            .astype(np.float32))
        assert isinstance(out, str)
        st.close()
    finally:
        factory.hub.close()
    vfac = _vad_factory()
    try:
        assert isinstance(vfac.hub, LanedHub) and vfac.hub.n == 2
        st = vfac()
        out = st((np.random.default_rng(2).standard_normal(6400) * 0.1)
                 .astype(np.float32))
        assert isinstance(out, bool)
        st.close()
    finally:
        vfac.hub.close()
