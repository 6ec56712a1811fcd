"""toolbox_for_asr_and_tts_tpu — a TPU-native speech framework.

A from-scratch rebuild of the capabilities of `terrense/toolbox-for-ASR-and-TTS`
(an ASR/voice service + TTS service toolbox) designed TPU-first:

- JAX/XLA/Pallas compute path: Kaldi-style DSP frontend (STFT, log-mel fbank,
  LFR, CMVN) as fused XLA/Pallas programs; Paraformer (SAN-M) ASR, FSMN-VAD,
  CT-Transformer punctuation, CAM++ speaker verification, char-CTC KWS,
  Sambert-style acoustic model + HiFi-GAN vocoder as functional JAX models.
- `jax.sharding.Mesh` + jit for batched / concurrent-stream serving
  (data-parallel over ICI); fixed-bucket padded shapes so every serving path
  is a pre-compiled XLA program.
- Service shell compatible with the reference wire formats: REST + WebSocket
  (see reference voice-service/app/api/voice.py and tts-service/app/api/tts.py).

Layout:
    runtime/   device & mesh bootstrap, shape bucketing, config, metrics,
               checkpoint conversion
    ops/       DSP frontend + neural net ops + Pallas TPU kernels
    models/    model families (fsmn_vad, paraformer, ct_transformer, campplus,
               kws, sambert, hifigan)
    parallel/  mesh serving utilities (batch fan-out over devices)
    asr/       session logic: streaming FSM, hotwords, diarization, corrections
    tts/       text frontend, synthesis pipeline, job manager, concat
    llm/       LLM post-correction client
    service/   HTTP/WebSocket service shell (stdlib asyncio; no FastAPI dep)
    utils/     audio I/O, WAV codec, logging helpers
"""

__version__ = "0.1.0"
