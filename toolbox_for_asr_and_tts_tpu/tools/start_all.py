"""Combined launcher (reference `start_test.py` equivalent — survey §0):
both services in one process on their default ports, sharing the JAX
runtime. Useful for single-host deployments and smoke testing.

    python -m toolbox_for_asr_and_tts_tpu.tools.start_all \
        [--voice-port 8001] [--tts-port 7001]
"""
from __future__ import annotations

import argparse
import asyncio
import logging

logger = logging.getLogger("toolbox.start_all")


async def serve_all(voice_port: int, tts_port: int) -> None:
    from ..launch import setup_compilation_cache, setup_service_logging
    from ..runtime.config import load_tts_config, load_voice_config
    from ..service.engines import build_engines
    from ..service.tts_app import create_app as create_tts
    from ..service.voice_app import create_app as create_voice

    setup_service_logging()
    setup_compilation_cache()
    vcfg = load_voice_config()
    tcfg = load_tts_config()
    engines = build_engines(vcfg.model_dir)
    voice_app = create_voice(engines=engines, cfg=vcfg)
    tts_app = create_tts(cfg=tcfg)
    logger.info("starting voice on :%d and tts on :%d", voice_port, tts_port)
    await asyncio.gather(
        voice_app.serve(vcfg.server.host, voice_port),
        tts_app.serve(tcfg.server.host, tts_port),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voice-port", type=int, default=8001)
    ap.add_argument("--tts-port", type=int, default=7001)
    args = ap.parse_args()
    asyncio.run(serve_all(args.voice_port, args.tts_port))


if __name__ == "__main__":
    main()
