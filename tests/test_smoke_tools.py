"""smoke_http + start_all against live in-process services."""
import asyncio
import threading
import time

import pytest

jax = pytest.importorskip("jax")
httpx = pytest.importorskip("httpx")


def test_start_all_and_smoke(monkeypatch):
    from toolbox_for_asr_and_tts_tpu.runtime.config import (TTSConfig,
                                                            VoiceConfig)
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    from toolbox_for_asr_and_tts_tpu.service.tts_app import create_app as ct
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app as cv
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    from toolbox_for_asr_and_tts_tpu.tools.smoke_http import (smoke_tts,
                                                              smoke_voice)

    voice_app = cv(engines=build_test_engines(),
                   cfg=VoiceConfig(disable_llm=True))
    tts_app = ct(synthesizer=Synthesizer.random(tiny=True), cfg=TTSConfig())

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.create_task(voice_app.serve("127.0.0.1", 0))
        loop.create_task(tts_app.serve("127.0.0.1", 0))
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(200):
        if getattr(voice_app, "port", None) and getattr(tts_app, "port", None):
            break
        time.sleep(0.05)

    v = smoke_voice(f"http://127.0.0.1:{voice_app.port}")
    assert v["health"]["status"] == "healthy"
    assert v["asr"]["success"] is True

    t = smoke_tts(f"http://127.0.0.1:{tts_app.port}")
    assert t["health"]["status"] == "healthy"
    assert t["tts"]["status"] == "completed"
    assert t["tts"]["audio_bytes"] > 1000
