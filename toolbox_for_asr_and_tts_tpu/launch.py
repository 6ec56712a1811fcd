"""Service launchers (reference start.py equivalents).

Voice (reference voice-service/start.py:55-222): bring up the native
WebSocket ASR server on :10095, verify TCP readiness, then serve the HTTP/WS
app; SIGTERM/SIGINT stop both. The native server runs IN-PROCESS here (a
ctypes-loaded C++ library, native/bridge.py) instead of the reference's
supervised subprocess — there is no separate process tree to babysit, which
retires the stale-process cleanup and log-tail machinery (start.py:55-61,
116-143) by construction.

TTS (reference tts-service/start.py): plain app serve on :7001.
"""
from __future__ import annotations

import logging
import logging.config
import os
import signal
import socket
import time

logger = logging.getLogger("toolbox.launch")


def setup_service_logging() -> None:
    """Reference `shared.service_launcher.setup_service_logging` equivalent:
    YAML dictConfig (assets/logging.yaml or LOG_CONFIG_FILE) with rotating
    file handlers unless LOG_TO_CONSOLE_ONLY is set."""
    if os.getenv("LOG_TO_CONSOLE_ONLY"):
        logging.basicConfig(level=logging.INFO, force=True)
        return
    path = os.getenv("LOG_CONFIG_FILE", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets", "logging.yaml"))
    # NOTE: `import logging.config` must stay at module level — a
    # function-local `import logging.config` binds LOCAL name `logging`,
    # making the LOG_TO_CONSOLE_ONLY branch above crash with
    # UnboundLocalError (found by benchmarks/boot_wake.py, round 5)
    try:
        import yaml
        with open(path, encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
        os.makedirs("logs", exist_ok=True)
        logging.config.dictConfig(cfg)
    except Exception:
        logging.basicConfig(level=logging.INFO, force=True)
        logger.exception("falling back to basicConfig (bad %s)", path)


def _wait_tcp(port: int, timeout_s: float = 30.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return True
        except OSError:
            time.sleep(0.3)
    return False


def setup_compilation_cache() -> None:
    """Persistent XLA compilation cache: restarts reuse compiled buckets
    (complements tools/warmup.py). Dir via JAX_COMPILATION_CACHE_DIR."""
    cache_dir = os.getenv("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/toolbox_xla"))
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info("XLA compilation cache at %s", cache_dir)
    except Exception:
        logger.exception("compilation cache unavailable")


def launch_voice() -> None:
    from .runtime.config import load_voice_config
    from .service.engines import build_engines
    from .service.voice_app import create_app

    setup_service_logging()
    setup_compilation_cache()
    cfg = load_voice_config()
    engines = build_engines(cfg.model_dir)

    ws_server = None
    ws_port = int(os.getenv("FUNASR_WS_PORT", "10095"))
    if os.getenv("FUNASR_WS_ENABLE", "1") not in ("0", "false"):
        try:
            from .native.bridge import start_offline_asr_server
            ws_server = start_offline_asr_server(engines, port=ws_port)
            if not _wait_tcp(ws_server.port):
                raise RuntimeError("native WS server not reachable")
            logger.info("native offline-ASR WS server ready on :%d",
                        ws_server.port)
        except Exception:
            logger.exception("native WS server unavailable; REST/WS API "
                             "still serves (degraded, like the reference's "
                             "lazy-tolerant boot)")

    app = create_app(engines=engines, cfg=cfg)

    def _stop(signum, frame):
        logger.info("signal %d — shutting down", signum)
        if ws_server is not None:
            ws_server.stop()
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    try:
        from .service.http import ssl_context_for
        app.run(cfg.server.host, cfg.server.port,
                ssl_context=ssl_context_for(cfg.ssl))
    finally:
        if ws_server is not None:
            ws_server.stop()
        engines.close()   # stop the serving-hub threads


def launch_tts() -> None:
    from .runtime.config import load_tts_config
    from .service.tts_app import create_app

    setup_service_logging()
    setup_compilation_cache()
    cfg = load_tts_config()
    app = create_app(cfg=cfg)
    signal.signal(signal.SIGTERM, lambda s, f: (_ for _ in ()).throw(SystemExit(0)))
    from .service.http import ssl_context_for
    app.run(cfg.server.host, cfg.server.port,
            ssl_context=ssl_context_for(cfg.ssl))
