"""Engine bootstrap: build the model bundle the voice service runs on.

Equivalent of the reference's model loading layer (voice-service/app/
services/voice_interface.py:593-870: container path → dev path → ModelScope
resolution, lazy singletons, startup preload). Here:

- `build_engines(model_dir)` loads converted checkpoints when the directory
  exists (runtime/checkpoints.py) and falls back to randomly initialized
  models otherwise — the service boots either way, mirroring the reference's
  lazy/tolerant loading (voice-service/app/main.py:52-60).
- Tiny random engines (`build_test_engines`) keep CI fast.
"""
from __future__ import annotations

import logging
import os
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger("toolbox.engines")


def _batch_capacity(default: int = None) -> int:
    """Serving-hub row count: VOICE_BATCH_CAPACITY env wins; then an
    explicit caller default (test engines pin 16 — CPU hubs must stay
    small); otherwise the dispatch profile picks it (tunnel 16 /
    direct-attached 128 — the 2026-08-18 chunked capacity sweep,
    benchmarks/RESULTS.md)."""
    import os as _os
    if default is not None and _os.getenv("VOICE_BATCH_CAPACITY") is None:
        return default
    from ..runtime.autotune import env_or_profile_int
    return env_or_profile_int("VOICE_BATCH_CAPACITY", "batch_capacity")


def build_test_engines():
    """Small random-weight engines for tests/dev (no checkpoints needed)."""
    # same eager dispatch-profile resolution as build_engines: the probe
    # runs device ops, which are illegal inside a jit trace — resolve it
    # here, in host context, before any engine code can trace
    from ..runtime.autotune import get_profile
    get_profile()
    from ..asr.diarization import Diarizer
    from ..asr.recognizer import Recognizer
    from ..asr.session import VoiceEngines
    from ..asr.speaker import SpeakerVerifier
    from ..models.kws_ctc import KeywordSpotter
    from ..models.paraformer import ParaformerConfig
    from ..models.ct_transformer import Punctuator

    reco = Recognizer.random(
        ParaformerConfig(input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
                         encoder_layers=2, decoder_layers=2, vocab_size=64),
        use_mesh=False)
    sv = SpeakerVerifier.random()
    punc = Punctuator.random()
    diar = Diarizer(reco, sv, punctuator=punc)
    if os.getenv("VOICE_BATCH_SERVING", "1") in ("1", "true"):
        from .hub import FinalizeHub
        diar = FinalizeHub(diar)
    kws = KeywordSpotter.random(threshold=1e9)  # random weights: never fires
    if os.getenv("VOICE_BATCH_SERVING", "1") in ("1", "true"):
        from .hub import KwsHub
        kws = KwsHub(kws)
    # no model-VAD in test engines: random FSMN-VAD weights fire on silence,
    # which would distort the enrollment FSM's energy-based pacing
    return VoiceEngines(diarizer=diar, kws=kws, verifier=sv,
                        streaming_factory=_streaming_factory(reco, capacity=16))


def _vad_factory(model_dir: Optional[str] = None,
                 capacity: Optional[int] = None):
    """Per-session FSMN-VAD stepper factory (per-connection cache, like the
    reference's `session.vad_cache`). Shares one weight pytree, loaded from
    the resolved `fsmn_vad` checkpoint when present (geometry + am.mvn CMVN
    from the dir itself) with a LOUD random fallback otherwise.

    VOICE_BATCH_SERVING=1 serves all sessions' chunks through ONE batched
    device tick instead (service/hub.py) — same stepper interface, same
    per-session cache semantics, one kernel per tick for S sessions."""
    import jax
    from ..models import fsmn_vad
    from ..runtime.registry import resolve
    params = cfg = cmvn = None
    d = resolve("fsmn_vad", model_dir)
    if d is not None:
        try:
            params, cfg, cmvn = fsmn_vad.from_model_dir(d)
            logger.info("FSMN-VAD loaded from %s", d)
        except Exception:
            logger.exception("FAILED converting FSMN-VAD checkpoint at %s — "
                             "FALLING BACK TO RANDOM WEIGHTS", d)
            params = None
    if params is None:
        logger.warning(
            "NO FSMN-VAD checkpoint dir (registry key 'fsmn_vad') — serving "
            "RANDOMLY INITIALIZED VAD weights: model-VAD decisions are "
            "arbitrary until a real model is mounted (energy VAD still "
            "gates speech, voice_interface.py:1606)")
        cfg = fsmn_vad.FsmnVadConfig()
        params = fsmn_vad.init_params(jax.random.PRNGKey(7), cfg)

    # speech-probability threshold (FunASR speech_2_noise_ratio-family knob):
    # >1.0 makes the model's DECISION always-False while the device work
    # still runs — what the wake-mode load bench uses to keep random-weight
    # VAD from stalling the enrollment AND-rule (benchmarks/run.py)
    threshold = float(os.getenv("VOICE_VAD_THRESHOLD", "0.5"))

    if os.getenv("VOICE_BATCH_SERVING", "1") in ("1", "true"):
        from ..asr.vad import StreamingVadStepper
        from ..parallel.stream_batcher import AtCapacity
        from .hub import HubVadStepper, LanedHub, VadHub, tick_lanes
        cap, lanes = _batch_capacity(capacity), tick_lanes()
        if lanes > 1:
            per = -(-cap // lanes)   # ceil: total capacity never shrinks
            shared: dict = {}        # lanes share compiled tick programs
            hub = LanedHub(lambda i: VadHub(params, cfg, capacity=per,
                                            threshold=threshold, cmvn=cmvn,
                                            exec_cache=shared),
                           lanes)
        else:
            hub = VadHub(params, cfg, capacity=cap,
                         threshold=threshold, cmvn=cmvn)
        # overflow sessions share ONE compiled program set, warmed under a
        # lock by a throwaway instance: per-instance lazy jits would trace
        # in serving threads concurrently with hub compiles (the
        # UnexpectedTracerError class of failure stream_batcher.py documents)
        # and recompile per overflow connection
        ovf_fns: dict = {}
        ovf_lock = threading.Lock()

        def factory():
            try:
                return HubVadStepper(hub)
            except AtCapacity:
                # hub rows exhausted: degrade the OVERFLOW session to a
                # per-session stepper instead of refusing the connection
                logger.warning("VAD hub at capacity — overflow session uses "
                               "a per-session stepper")
                with ovf_lock:
                    if "step" not in ovf_fns:
                        warm = StreamingVadStepper(params, cfg,
                                                   threshold=threshold,
                                                   cmvn=cmvn, fns=ovf_fns)
                        warm(np.zeros(6400, np.float32))
                    return StreamingVadStepper(params, cfg,
                                               threshold=threshold,
                                               cmvn=cmvn, fns=ovf_fns)

        factory.hub = hub
        return factory

    from ..asr.vad import StreamingVadStepper

    def factory():
        return StreamingVadStepper(params, cfg, threshold=threshold,
                                   cmvn=cmvn)

    return factory


def _streaming_factory(reco, model_dir=None, capacity=None):
    """Per-session streaming recognizer factory (2-pass partials), DEFAULT-ON
    (VOICE_ENABLE_PARTIALS=0 restores the reference's no-mid-chunk-decode
    behavior, voice_interface.py:1749-1809).

    Default implementation: the FunASR-faithful chunked encoder with k/v
    caches (models/paraformer_online.py, chunk [0,4,5] look-back 4/1 like
    voice_interface.py:651-653); VOICE_STREAMING_IMPL=windowed selects the
    round-1 windowed re-encode fallback."""
    if os.getenv("VOICE_ENABLE_PARTIALS", "1") not in ("1", "true"):
        return None

    # The reference loads a SEPARATE chunk-trained online checkpoint
    # (paraformer-zh-streaming, voice_interface.py:629-634); resolve it and
    # prefer its weights for partials — the offline model's weights are the
    # structural fallback (identical pytree).
    from ..runtime.registry import resolve
    d = resolve("paraformer_streaming", model_dir)
    if d is not None:
        try:
            from ..asr.recognizer import Recognizer
            online = Recognizer.from_model_dir(d, use_mesh=False)
            logger.info("streaming partials use the ONLINE checkpoint %s", d)
            reco = online
        except Exception:
            logger.exception("FAILED converting online checkpoint at %s — "
                             "partials fall back to the OFFLINE weights", d)
    else:
        logger.warning("no online (paraformer-zh-streaming) checkpoint dir —"
                       " streaming partials reuse the offline ASR weights")

    cmvn = None
    if reco.cmvn is not None:
        import numpy as _np
        cmvn = (_np.asarray(reco.cmvn[0]), _np.asarray(reco.cmvn[1]))

    if os.getenv("VOICE_STREAMING_IMPL", "chunked") == "windowed":
        from ..models.paraformer_streaming import (StreamingConfig,
                                                   StreamingRecognizer)

        def factory():
            return StreamingRecognizer(reco.params, reco.cfg, reco.tokenizer,
                                       StreamingConfig(), cmvn=cmvn)
        return factory

    from ..models.paraformer_online import OnlineConfig, OnlineRecognizer

    if os.getenv("VOICE_BATCH_SERVING", "1") in ("1", "true"):
        # batched partials: every session's speech chunk joins ONE fused
        # device program per tick (service/hub.py::ChunkedHub) instead of
        # one OnlineRecognizer program per connection per chunk
        from ..parallel.stream_batcher import AtCapacity
        from .hub import (ChunkedHub, HubStreamingRecognizer, LanedHub,
                          tick_lanes)
        cap, lanes = _batch_capacity(capacity), tick_lanes()
        if lanes > 1:
            per = -(-cap // lanes)
            shared: dict = {}        # lanes share compiled tick programs
            hub = LanedHub(
                lambda i: ChunkedHub(reco.params, reco.cfg, OnlineConfig(),
                                     reco.tokenizer, cmvn=cmvn, capacity=per,
                                     exec_cache=shared),
                lanes)
        else:
            hub = ChunkedHub(reco.params, reco.cfg, OnlineConfig(),
                             reco.tokenizer, cmvn=cmvn, capacity=cap)
        # shared overflow program cache + warm-once (same rationale as the
        # VAD overflow path above: no tracing in serving threads, no
        # per-connection recompiles)
        ovf_fns: dict = {}
        ovf_lock = threading.Lock()

        def factory():
            try:
                return HubStreamingRecognizer(hub)
            except AtCapacity:
                # hub rows exhausted: the overflow session gets its own
                # OnlineRecognizer (slower, unbatched) instead of a refused
                # connection
                logger.warning("chunked hub at capacity — overflow session "
                               "uses a per-session recognizer")
                with ovf_lock:
                    if "step" not in ovf_fns:
                        warm = OnlineRecognizer(reco.params, reco.cfg,
                                                reco.tokenizer, OnlineConfig(),
                                                cmvn=cmvn, fns=ovf_fns)
                        warm.push_audio(np.zeros(16000, np.float32))
                        warm.finalize()
                    return OnlineRecognizer(reco.params, reco.cfg,
                                            reco.tokenizer, OnlineConfig(),
                                            cmvn=cmvn, fns=ovf_fns)

        factory.hub = hub
        return factory

    def factory():
        return OnlineRecognizer(reco.params, reco.cfg, reco.tokenizer,
                                OnlineConfig(), cmvn=cmvn)

    return factory


def build_engines(model_dir: Optional[str] = None, use_mesh: bool = True):
    """Production engines: converted checkpoints from `model_dir` when
    present, random weights otherwise (with a loud warning)."""
    # resolve the dispatch profile NOW (host context) so no jit trace ever
    # has to probe it (runtime/autotune.py)
    from ..runtime.autotune import get_profile
    get_profile()
    from ..asr.diarization import Diarizer
    from ..asr.recognizer import Recognizer
    from ..asr.session import VoiceEngines
    from ..asr.speaker import SpeakerVerifier
    from ..models.kws_ctc import KeywordSpotter
    from ..models.ct_transformer import Punctuator

    from ..runtime.registry import resolve

    def load(key: str, loader, fallback, what: str):
        """Resolve + convert a family; LOUD warning on random fallback
        (round-1 ADVICE: SV/punc/KWS silently served random weights)."""
        d = resolve(key, model_dir)
        if d is not None:
            try:
                eng = loader(d)
                logger.info("%s loaded from %s", what, d)
                return eng
            except Exception:
                logger.exception("FAILED converting %s checkpoint at %s — "
                                 "FALLING BACK TO RANDOM WEIGHTS", what, d)
        else:
            logger.warning(
                "NO %s checkpoint dir (registry key %r) — serving RANDOMLY "
                "INITIALIZED weights: outputs are arbitrary until a real "
                "model is mounted", what, key)
        return fallback()

    reco = load("paraformer_offline",
                lambda d: Recognizer.from_model_dir(d, use_mesh=use_mesh),
                lambda: Recognizer.random(use_mesh=use_mesh),
                "ASR (Paraformer-large)")
    sv = load("sv", SpeakerVerifier.from_model_dir, SpeakerVerifier.random,
              "speaker verification (CAM++)")
    punc = load("punc", Punctuator.from_model_dir, Punctuator.random,
                "punctuation (CT-Transformer)")
    # load with the default keyword, then apply the env keyword AFTER — a
    # ValueError raised inside the loader would be swallowed by load()'s
    # random fallback, discarding a perfectly good real checkpoint just
    # because VOICE_KWS_KEYWORD was out-of-vocab (round-2d review finding)
    kws_thr = dict(threshold=float(os.getenv("VOICE_KWS_THRESHOLD", "1e9")))
    kws = load("kws", lambda d: KeywordSpotter.from_model_dir(d, **kws_thr),
               lambda: KeywordSpotter.random(**kws_thr),
               "keyword spotting (charctc)")
    want_kw = os.getenv("VOICE_KWS_KEYWORD", "小护")
    if kws is not None and want_kw != kws.keyword:
        try:
            kws.set_keyword(want_kw)
        except ValueError:
            # out-of-vocab keyword (set_keyword refuses to alias unknown
            # chars to the CTC blank): keep the loaded weights and the
            # default keyword instead of failing boot
            logger.exception("invalid VOICE_KWS_KEYWORD %r — keeping the "
                             "default keyword %r", want_kw, kws.keyword)
    diar = Diarizer(reco, sv, punctuator=punc)
    if os.getenv("VOICE_BATCH_SERVING", "1") in ("1", "true"):
        # cross-session finalize batching: concurrent finalize buffers meet
        # in one diarize_batch (batched recognition + one embedding call)
        from .hub import FinalizeHub, KwsHub
        diar = FinalizeHub(diar)
        if kws is not None:
            # wake-word batching: S waiting sessions' window scores meet in
            # one fused program per tick (wrap AFTER set_keyword so the
            # env-keyword resolution above acts on the bare spotter)
            kws = KwsHub(kws)
            if os.getenv("VOICE_KWS_AOT", "0") in ("1", "true"):
                # wake-enabled deployments pre-compile the pow-2 batch
                # programs at boot (a mid-serving tunnel compile takes
                # minutes); off by default because most deployments keep
                # wake gating disabled until a real KWS checkpoint mounts
                kws.warm()
    return VoiceEngines(diarizer=diar, kws=kws, verifier=sv,
                        vad_factory=_vad_factory(model_dir),
                        streaming_factory=_streaming_factory(reco, model_dir))
