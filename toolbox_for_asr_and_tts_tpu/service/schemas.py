"""Wire-format schemas, matching the reference's pydantic models.

Voice: voice-service/app/models/voice.py:6-58 (ASRRequest/ASRResponse and the
WS welcome/result/error message shapes). TTS: tts-service/app/models/
tts.py:7-34 (TTSRequest/CancelRequest/TTSResponse/TTSResultResponse).
Field names and defaults are kept identical so existing reference clients
work unchanged.
"""
from __future__ import annotations

from typing import Optional

from pydantic import BaseModel


class ASRRequest(BaseModel):
    audio_data: str                      # base64 WAV
    use_wake: Optional[bool] = None      # None → default True (reference)
    use_llm: Optional[bool] = None
    save_sample: bool = False
    sample_id: Optional[str] = None
    diagnosis_session_id: Optional[str] = None


class ASRResponse(BaseModel):
    text: str = ""
    success: bool = True
    message: str = ""
    sample_id: Optional[str] = None


class TTSRequest(BaseModel):
    text: str
    voice: str = "zhitian_emo"


class CancelRequest(BaseModel):
    job_id: str


class TTSResponse(BaseModel):
    job_id: str
    status: str = "pending"
    message: str = ""


class TTSResultResponse(BaseModel):
    job_id: str
    status: str
    audio_base64: Optional[str] = None
    text: Optional[str] = None
    audio_size: int = 0
    error: Optional[str] = None
    # beyond the reference (streamed jobs, tts/jobs.py): progress gauges,
    # and with ?partial=1 audio_base64 carries the audio synthesized so far
    segments_done: int = 0
    n_segments: Optional[int] = None
