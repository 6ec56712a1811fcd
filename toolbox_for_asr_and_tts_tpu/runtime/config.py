"""Env-var driven configuration, superset of the reference's knobs.

Voice flags mirror reference voice-service/app/config.py:12-122
(FUNASR_DISABLE_LM, VOICE_DISABLE_LLM, VOICE_ALWAYS_SAVE_SAMPLE,
VOICE_REQUIRE_WAKE, server/SSL/security settings); TTS knobs mirror the raw
os.getenv block in reference tts-service/app/services/tts_service.py:51-76.
Implemented with pydantic (v2) models reading the process environment, like
the reference's pydantic-settings classes but without that extra dependency.
"""
from __future__ import annotations

import os
from typing import List, Optional

from pydantic import BaseModel, Field


def _env_bool(name: str, default: bool) -> bool:
    v = os.getenv(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int) -> int:
    v = os.getenv(name)
    return int(v) if v not in (None, "") else default


def _env_float(name: str, default: float) -> float:
    v = os.getenv(name)
    return float(v) if v not in (None, "") else default


def _env_list(name: str, default: List[str]) -> List[str]:
    v = os.getenv(name)
    if v is None:
        return list(default)
    return [s.strip() for s in v.split(",") if s.strip()]


class ServerConfig(BaseModel):
    host: str = "0.0.0.0"
    port: int = 8001  # reference voice-service/app/config.py default


class SSLConfig(BaseModel):
    enabled: bool = False
    certfile: Optional[str] = None
    keyfile: Optional[str] = None


class SecurityConfig(BaseModel):
    allowed_hosts: List[str] = Field(default_factory=lambda: ["*"])
    cors_origins: List[str] = Field(default_factory=lambda: ["*"])


class VoiceConfig(BaseModel):
    """Voice-service configuration (reference voice-service/app/config.py)."""

    server: ServerConfig = Field(default_factory=ServerConfig)
    ssl: SSLConfig = Field(default_factory=SSLConfig)
    security: SecurityConfig = Field(default_factory=SecurityConfig)

    funasr_disable_lm: bool = False
    disable_llm: bool = True  # no LLM endpoint in the test env; enable via env
    always_save_sample: bool = False
    require_wake: bool = False

    # Engine knobs (superset; reference hard-codes these as module globals,
    # voice_interface.py:644-658, 1116-1148)
    sample_rate: int = 16000
    chunk_ms: int = 400
    energy_mean_threshold: float = 0.03
    energy_peak_threshold: float = 0.17
    silence_finalize_s: float = 2.0
    kws_window_s: float = 1.6
    kws_keyword: str = "小护"
    sv_threshold: float = 0.40
    min_enroll_seconds: float = 5.0
    pre_speech_buffer_s: float = 0.4
    max_silent_chunks_kept: int = 2

    model_dir: str = "/workspace/models/damo"
    generated_dir: str = "generated"


class TTSConfig(BaseModel):
    """TTS-service configuration (reference tts_service.py:51-76 env knobs)."""

    server: ServerConfig = Field(default_factory=lambda: ServerConfig(port=7001))
    ssl: SSLConfig = Field(default_factory=SSLConfig)

    seg_target: int = 18
    seg_first: int = 14
    seg_hard_max: int = 22
    crossfade_ms: int = 60
    pause_soft_ms: int = 120
    pause_hard_ms: int = 200
    beam_size: int = 1
    sampling_rate: int = 16000
    parallel_segments: bool = False
    max_parallel_segments: int = 2
    use_batch: bool = True   # TPU-native default: batch segments onto the mesh
    batch_size: int = 8
    max_concurrent_jobs: int = 2
    default_voice: str = "zhitian_emo"

    model_dir: str = "/workspace/models/damo"


def load_voice_config() -> VoiceConfig:
    return VoiceConfig(
        server=ServerConfig(
            host=os.getenv("VOICE_HOST", "0.0.0.0"),
            port=_env_int("VOICE_PORT", 8001),
        ),
        ssl=SSLConfig(
            enabled=_env_bool("SSL_ENABLED", False),
            certfile=os.getenv("SSL_CERTFILE"),
            keyfile=os.getenv("SSL_KEYFILE"),
        ),
        security=SecurityConfig(
            allowed_hosts=_env_list("ALLOWED_HOSTS", ["*"]),
            cors_origins=_env_list("CORS_ORIGINS", ["*"]),
        ),
        funasr_disable_lm=_env_bool("FUNASR_DISABLE_LM", False),
        disable_llm=_env_bool("VOICE_DISABLE_LLM", True),
        always_save_sample=_env_bool("VOICE_ALWAYS_SAVE_SAMPLE", False),
        require_wake=_env_bool("VOICE_REQUIRE_WAKE", False),
        model_dir=os.getenv("VOICE_MODEL_DIR", "/workspace/models/damo"),
        generated_dir=os.getenv("GENERATED_DIR", "generated"),
    )


def load_tts_config() -> TTSConfig:
    return TTSConfig(
        server=ServerConfig(
            host=os.getenv("TTS_HOST", "0.0.0.0"),
            port=_env_int("TTS_PORT", 7001),
        ),
        ssl=SSLConfig(
            enabled=_env_bool("SSL_ENABLED", False),
            certfile=os.getenv("SSL_CERTFILE"),
            keyfile=os.getenv("SSL_KEYFILE"),
        ),
        seg_target=_env_int("TTS_SEG_TARGET", 18),
        seg_first=_env_int("TTS_SEG_FIRST", 14),
        seg_hard_max=_env_int("TTS_SEG_HARD_MAX", 22),
        crossfade_ms=_env_int("TTS_CROSSFADE_MS", 60),
        pause_soft_ms=_env_int("TTS_PAUSE_SOFT_MS", 120),
        pause_hard_ms=_env_int("TTS_PAUSE_HARD_MS", 200),
        beam_size=_env_int("TTS_BEAM_SIZE", 1),
        sampling_rate=_env_int("TTS_SAMPLING_RATE", 16000),
        parallel_segments=_env_bool("TTS_PARALLEL_SEGMENTS", False),
        max_parallel_segments=_env_int("TTS_MAX_PARALLEL_SEGMENTS", 2),
        use_batch=_env_bool("TTS_USE_BATCH", True),
        batch_size=_env_int("TTS_BATCH_SIZE", 8),
        max_concurrent_jobs=_env_int("TTS_MAX_JOBS", 2),
        default_voice=os.getenv("TTS_DEFAULT_VOICE", "zhitian_emo"),
        model_dir=os.getenv("TTS_MODEL_DIR", "/workspace/models/damo"),
    )
