"""Shared batched-serving hub: N concurrent sessions, one device tick
(service/hub.py) — equivalence with per-session steppers and real batching."""
import threading

import numpy as np
import pytest

import jax

from toolbox_for_asr_and_tts_tpu.asr.vad import StreamingVadStepper
from toolbox_for_asr_and_tts_tpu.models import fsmn_vad
from toolbox_for_asr_and_tts_tpu.service.hub import HubVadStepper, VadHub

CFG = fsmn_vad.FsmnVadConfig(input_dim=20, input_affine_dim=12, linear_dim=16,
                             proj_dim=8, fsmn_layers=2, lorder=5,
                             output_affine_dim=12, output_dim=6)
# tiny frontend: FsmnVadConfig.frontend is lfr 5/1 over 80 mel — too big for
# the tiny dims, so use the full-size config for the e2e test instead
FULL = fsmn_vad.FsmnVadConfig()


@pytest.fixture(scope="module")
def hub():
    params = fsmn_vad.init_params(jax.random.PRNGKey(7), FULL)
    h = VadHub(params, FULL, capacity=8, tick_ms=5.0)
    yield h
    h.close()


def test_hub_matches_per_session_steppers(hub):
    """4 sessions submitting concurrently through the hub produce exactly
    the per-session StreamingVadStepper decisions, and the hub actually
    batches (fewer ticks than submissions)."""
    rng = np.random.default_rng(0)
    n_sessions, n_chunks = 4, 6
    audio = [[(rng.standard_normal(6400) * (0.2 if (i + j) % 2 else 0.005))
              .astype(np.float32) for j in range(n_chunks)]
             for i in range(n_sessions)]

    # reference: independent per-session steppers (same weights)
    want = []
    for i in range(n_sessions):
        st = StreamingVadStepper(hub.ticker.params, FULL)
        want.append([st(c) for c in audio[i]])

    steppers = [HubVadStepper(hub) for _ in range(n_sessions)]
    got = [[None] * n_chunks for _ in range(n_sessions)]
    barrier = threading.Barrier(n_sessions)

    def run(i):
        for j in range(n_chunks):
            barrier.wait()          # submit in lockstep so ticks batch
            got[i][j] = steppers[i](audio[i][j])

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert got == want, (got, want)
    assert hub.ticks < hub.submissions, (hub.ticks, hub.submissions)
    for st in steppers:
        st.close()


def test_hub_reset_and_leave(hub):
    st = HubVadStepper(hub)
    rng = np.random.default_rng(1)
    chunk = (rng.standard_normal(6400) * 0.2).astype(np.float32)
    a = st(chunk)
    st.reset()
    b = st(chunk)   # after reset, identical input → identical decision
    assert a == b
    st.close()
    assert st.slot is None


# --------------------------------------------------------- chunked hub
from toolbox_for_asr_and_tts_tpu.models import paraformer as _pf
from toolbox_for_asr_and_tts_tpu.models import paraformer_online as _po
from toolbox_for_asr_and_tts_tpu.asr.tokenizer import CharTokenizer
from toolbox_for_asr_and_tts_tpu.service.hub import (ChunkedHub,
                                                     HubStreamingRecognizer)

_PCFG = _pf.ParaformerConfig(input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
                             encoder_layers=2, decoder_layers=2, vocab_size=64)
_OCFG = _po.OnlineConfig(c1=4, c2=5, encoder_look_back=2)


@pytest.fixture(scope="module")
def chunked_hub():
    params = _pf.init_params(jax.random.PRNGKey(3), _PCFG)
    h = ChunkedHub(params, _PCFG, _OCFG, CharTokenizer.dummy(64),
                   capacity=8, tick_ms=5.0)
    # per-TICK routing lock: read _ids mid-stream, so run unpipelined here
    # (pipelined total-equality incl. finalize is locked in
    # test_stream_batcher.py::test_pipelined_tick_matches_unpipelined)
    h.ticker._pipelined = False
    yield h
    h.close()


def test_chunked_hub_matches_per_session_recognizers(chunked_hub):
    """3 sessions pushing concurrently through the hub accumulate exactly
    the incremental-mode OnlineRecognizer partial ids, and the hub batches
    (fewer device ticks than submissions)."""
    hub = chunked_hub
    rng = np.random.default_rng(11)
    n_sessions, step, total = 3, 3200, 16000
    audio = [(rng.standard_normal(total) * 0.1).astype(np.float32)
             for _ in range(n_sessions)]

    want = []
    for i in range(n_sessions):
        reco = _po.OnlineRecognizer(hub.ticker.params, _PCFG,
                                    CharTokenizer.dummy(64), _OCFG,
                                    partial_mode="incremental")
        for s in range(0, total, step):
            reco.push_audio(audio[i][s:s + step])
        want.append(list(reco._inc_ids))

    recos = [HubStreamingRecognizer(hub) for _ in range(n_sessions)]
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
        t.join()
    tok = CharTokenizer.dummy(64)
    for i in range(n_sessions):
        got = hub._ids[recos[i].slot]
        assert got == want[i], f"session {i}: {got} != {want[i]}"
        assert recos[i].partial_text() == tok.ids_to_text(want[i])
        assert len(want[i]) > 0
    assert hub.ticks < hub.submissions, (hub.ticks, hub.submissions)
    for r in recos:
        r.close()


def test_chunked_hub_reset_restarts_cleanly(chunked_hub):
    """reset() clears partial ids AND streaming caches: replaying the same
    audio after reset reproduces the same partials (fresh-session equality)."""
    hub = chunked_hub
    rng = np.random.default_rng(12)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    reco = HubStreamingRecognizer(hub)
    first = []
    for s in range(0, 16000, 3200):
        reco.push_audio(audio[s:s + 3200])
    first = list(hub._ids[reco.slot])
    assert len(first) > 0
    reco.reset()
    assert reco.partial_text() == ""
    for s in range(0, 16000, 3200):
        reco.push_audio(audio[s:s + 3200])
    assert hub._ids[reco.slot] == first
    reco.close()
    assert reco.slot is None


def test_chunked_hub_finalize(chunked_hub):
    """finalize() (what the native WS bridge calls on is_speaking:false)
    drains the slot's remainder + lookahead + CIF tail, returns the final
    text extending the partials, and leaves the slot clean for the next
    utterance (round-2 review finding: HubStreamingRecognizer had no
    finalize, so batched online-mode finals were always empty)."""
    hub = chunked_hub
    rng = np.random.default_rng(13)
    audio = (rng.standard_normal(17600) * 0.1).astype(np.float32)
    reco = HubStreamingRecognizer(hub)
    for s in range(0, len(audio), 3200):   # last push is a 1600 remainder
        reco.push_audio(audio[s:s + 3200])
    partial = reco.partial_text()
    assert len(partial) > 0
    final = reco.finalize()
    # incremental decode only appends: the final must extend the partials
    # (the drain encodes the remainder + lookahead the partials hadn't seen)
    assert final.startswith(partial)
    assert len(final) > len(partial)
    # slot is clean: replaying yields fresh-session-identical partials
    assert reco.partial_text() == ""
    for s in range(0, len(audio), 3200):
        reco.push_audio(audio[s:s + 3200])
    assert reco.partial_text() == partial
    second = reco.finalize()
    assert second == final    # finalize is deterministic on a clean slot
    reco.close()


def test_streaming_factory_batch_env(monkeypatch):
    """VOICE_BATCH_SERVING=1 + VOICE_ENABLE_PARTIALS=1 wires sessions'
    partials through the shared ChunkedHub."""
    monkeypatch.setenv("VOICE_BATCH_SERVING", "1")
    monkeypatch.setenv("VOICE_ENABLE_PARTIALS", "1")
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "4")
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    from toolbox_for_asr_and_tts_tpu.service.engines import _streaming_factory
    reco = Recognizer.random(_PCFG, use_mesh=False)
    factory = _streaming_factory(reco)
    try:
        st = factory()
        assert isinstance(st, HubStreamingRecognizer)
        rng = np.random.default_rng(13)
        out = st.push_audio((rng.standard_normal(6400) * 0.1)
                            .astype(np.float32))
        assert isinstance(out, str)
        st.close()
    finally:
        factory.hub.close()


def test_service_batch_serving_env(monkeypatch):
    """VOICE_BATCH_SERVING=1 wires HubVadStepper into the engines'
    vad_factory."""
    monkeypatch.setenv("VOICE_BATCH_SERVING", "1")
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "4")
    from toolbox_for_asr_and_tts_tpu.service.engines import _vad_factory
    factory = _vad_factory()
    try:
        st = factory()
        assert isinstance(st, HubVadStepper)
        rng = np.random.default_rng(2)
        out = st((rng.standard_normal(6400) * 0.1).astype(np.float32))
        assert isinstance(out, bool)
        st.close()
    finally:
        factory.hub.close()


def test_hub_concurrent_lifecycle_stress(chunked_hub):
    """8 threads race join/submit/reset/finalize/leave against the shared
    ticker for a few hundred ops: no deadlock, no exception, no cross-slot
    leakage crash, and the hub still serves a clean session afterwards
    (locks + generation guards under churn — round-2d hardening)."""
    import random
    hub = chunked_hub
    rng = np.random.default_rng(21)
    audio = (rng.standard_normal(3200) * 0.1).astype(np.float32)
    errors = []

    def worker(seed):
        r = random.Random(seed)
        try:
            for _ in range(12):
                reco = HubStreamingRecognizer(hub)
                for _ in range(r.randint(1, 4)):
                    op = r.random()
                    if op < 0.6:
                        reco.push_audio(audio)
                    elif op < 0.8:
                        reco.reset()
                    else:
                        reco.finalize()
                reco.close()
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "worker deadlocked"
    assert not errors, errors
    # the hub still serves a clean deterministic session
    reco = HubStreamingRecognizer(hub)
    for s in range(0, 16000, 3200):
        reco.push_audio(audio if s else audio)
    first = reco.finalize()
    for s in range(0, 16000, 3200):
        reco.push_audio(audio)
    assert reco.finalize() == first
    reco.close()


# ------------------------------------------------------------ FinalizeHub
def _speech(secs=1.2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    return (0.3 * np.sin(2 * np.pi * 250 * t)
            + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


def test_diarize_batch_matches_single():
    """One batched diarize call == N single calls (same texts/speakers) —
    the correctness contract the FinalizeHub relies on."""
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    eng = E.build_test_engines()
    diar = getattr(eng.diarizer, "inner", eng.diarizer)
    wavs = [_speech(seed=i) for i in range(3)]
    singles = [diar.diarize(w) for w in wavs]
    batched = diar.diarize_batch(wavs)
    assert len(batched) == 3
    for got, want in zip(batched, singles):
        assert [s.text for s in got] == [s.text for s in want]
        assert [s.spk for s in got] == [s.spk for s in want]


def test_finalize_hub_batches_and_matches():
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    from toolbox_for_asr_and_tts_tpu.service.hub import FinalizeHub
    eng = E.build_test_engines()
    diar = getattr(eng.diarizer, "inner", eng.diarizer)
    hub = FinalizeHub(diar, window_ms=80.0)
    try:
        wavs = [_speech(seed=i) for i in range(4)]
        singles = [diar.diarize(w) for w in wavs]
        out = [None] * 4
        ths = [threading.Thread(
            target=lambda i=i: out.__setitem__(i, hub.diarize(wavs[i])))
            for i in range(4)]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=120)
        assert hub.requests == 4
        assert hub.batches <= 3     # concurrent submits coalesced
        for got, want in zip(out, singles):
            assert got is not None
            assert [s.text for s in got] == [s.text for s in want]
    finally:
        hub.close()


def test_finalize_hub_propagates_errors():
    from toolbox_for_asr_and_tts_tpu.service.hub import FinalizeHub

    class Broken:
        def diarize_batch(self, wavs, sr=16000):
            raise RuntimeError("boom")

    hub = FinalizeHub(Broken(), window_ms=10.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            hub.diarize(np.zeros(1600, np.float32))
    finally:
        hub.close()


def _kws_window(seed: int, secs: float = 1.6) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    return (0.3 * np.sin(2 * np.pi * (200 + 20 * seed) * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def test_kws_batch_matches_single():
    """detect_audio_batch == detect_audio row-for-row (the correctness
    contract KwsHub relies on), across mixed window lengths."""
    from toolbox_for_asr_and_tts_tpu.models.kws_ctc import KeywordSpotter
    kws = KeywordSpotter.random(threshold=0.0)
    windows = [_kws_window(i) for i in range(3)] + [_kws_window(9, secs=0.8)]
    singles = [kws.detect_audio(w) for w in windows]
    batched = kws.detect_audio_batch(windows)
    assert len(batched) == len(windows)
    for (gd, gs), (wd, ws) in zip(batched, singles):
        assert gd == wd
        np.testing.assert_allclose(gs, ws, rtol=1e-4, atol=1e-5)


def test_kws_hub_batches_and_matches():
    """Concurrent detect_audio calls through the hub coalesce into fewer
    device batches and return the unbatched spotter's exact decisions."""
    from toolbox_for_asr_and_tts_tpu.models.kws_ctc import KeywordSpotter
    from toolbox_for_asr_and_tts_tpu.service.hub import KwsHub
    kws = KeywordSpotter.random(threshold=0.0)
    windows = [_kws_window(i) for i in range(4)]
    singles = [kws.detect_audio(w) for w in windows]
    hub = KwsHub(kws, window_ms=80.0)
    try:
        # proxying: session code reads .keyword/.threshold off engines.kws
        assert hub.keyword == kws.keyword
        assert hub.threshold == kws.threshold
        out = [None] * 4
        ths = [threading.Thread(
            target=lambda i=i: out.__setitem__(i, hub.detect_audio(windows[i])))
            for i in range(4)]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=120)
        assert hub.requests == 4
        assert hub.batches <= 3     # concurrent submits coalesced
        for got, want in zip(out, singles):
            assert got is not None
            assert got[0] == want[0]
            np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-5)
    finally:
        hub.close()


def test_kws_hub_propagates_errors():
    from toolbox_for_asr_and_tts_tpu.service.hub import KwsHub

    class Broken:
        def detect_audio_batch(self, windows):
            raise RuntimeError("kws boom")

    hub = KwsHub(Broken(), window_ms=10.0)
    try:
        with pytest.raises(RuntimeError, match="kws boom"):
            hub.detect_audio(np.zeros(25600, np.float32))
    finally:
        hub.close()


def test_wake_session_runs_through_kws_hub():
    """A session in WAITING_FOR_WAKEUP drives engines.kws (the hub) and the
    wake → enrollment transition still fires once the window is full."""
    from toolbox_for_asr_and_tts_tpu.asr import session as S
    from toolbox_for_asr_and_tts_tpu.service import engines as E
    eng = E.build_test_engines()
    try:
        from toolbox_for_asr_and_tts_tpu.service.hub import KwsHub
        assert isinstance(eng.kws, KwsHub)   # default-on batched serving
        eng.kws.inner.threshold = -1e9       # random weights: force a wake
        sess = S.StreamingASRSession(eng, use_wake=True, use_sv=True)
        woke = False
        for i in range(4):                   # 4 × 400 ms fills the FIFO
            woke = sess.process_wakeup_chunk(_kws_window(i, secs=0.4))
        assert woke
        assert sess.mode == S.WAITING_FOR_ENROLLMENT
        assert eng.kws.requests >= 1
        sess.close()
    finally:
        eng.close()
