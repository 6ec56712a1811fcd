"""Python ↔ C++ bridge for the native WebSocket ASR server.

Loads `libfunasr_ws.so` (built by native/Makefile) via ctypes and registers
the JAX recognition engine as its callback, replacing the reference's
separate FunASR C++ ONNX server process (voice-service/start.py:64-113) with
an in-process native server: C++ owns sockets/framing/sessions, TPU owns the
math. The wire protocol is the FunASR one the reference's (commented) client
speaks (voice_interface.py:255-296), so existing FunASR clients connect
unchanged.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Callable

import numpy as np

logger = logging.getLogger("toolbox.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libfunasr_ws.so")

_RECOGNIZE_CB = ctypes.CFUNCTYPE(ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int, ctypes.c_char_p)
_PARTIAL_CB = ctypes.CFUNCTYPE(ctypes.c_void_p, ctypes.c_ulonglong,
                               ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int, ctypes.c_int)
_FREE_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p)

_libc = ctypes.CDLL(None)
_libc.malloc.restype = ctypes.c_void_p
_libc.malloc.argtypes = [ctypes.c_size_t]
_libc.free.argtypes = [ctypes.c_void_p]


def build_library(force: bool = False) -> str:
    """Compile the shared library if missing (g++ is in the image)."""
    if force or not os.path.exists(_LIB):
        logger.info("building native WS server library...")
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    return _LIB


class NativeWSServer:
    """In-process native WebSocket ASR server bound to a recognize fn."""

    def __init__(self, recognize: Callable[[np.ndarray, str], str],
                 port: int = 10095,
                 streaming_factory: Callable[[], object] = None):
        """streaming_factory: optional () -> StreamingRecognizer-like object
        (push_audio / finalize / reset). When provided, the server also
        serves FunASR modes "online" and "2pass" with per-connection state."""
        self.lib = ctypes.CDLL(build_library())
        self.lib.ws_server_start2.argtypes = [ctypes.c_int, _RECOGNIZE_CB,
                                              _PARTIAL_CB, _FREE_CB]
        self.lib.ws_server_start2.restype = ctypes.c_int
        self.lib.ws_server_port.restype = ctypes.c_int
        self._recognize = recognize
        self._port_arg = port
        self._streaming_factory = streaming_factory
        self._sessions = {}
        import threading
        self._sess_lock = threading.Lock()

        def _alloc(text: str):
            data = text.encode("utf-8") + b"\x00"
            buf = _libc.malloc(len(data))
            ctypes.memmove(buf, data, len(data))
            return buf

        def _cb(samples, n, hotwords):
            try:
                arr = np.ctypeslib.as_array(samples, shape=(n,)).copy()
                hw = (hotwords or b"").decode("utf-8", "replace")
                text = self._recognize(arr, hw) or ""
            except Exception:
                logger.exception("recognition callback failed")
                text = ""
            return _alloc(text)

        def _partial(session_id, samples, n, reset):
            try:
                if self._streaming_factory is None:
                    return None
                with self._sess_lock:
                    sr = self._sessions.get(session_id)
                    if sr is None and not reset:
                        sr = self._streaming_factory()
                        self._sessions[session_id] = sr
                if reset:
                    with self._sess_lock:
                        sr = self._sessions.pop(session_id, None)
                    return _alloc(sr.finalize() if sr is not None else "")
                arr = np.ctypeslib.as_array(samples, shape=(n,)).copy()
                return _alloc(sr.push_audio(arr) or "")
            except Exception:
                logger.exception("partial callback failed")
                return None

        def _free(ptr):
            _libc.free(ptr)

        # keep references so the callbacks aren't GC'd while C++ holds them
        self._cb = _RECOGNIZE_CB(_cb)
        self._partial_cb = (_PARTIAL_CB(_partial) if streaming_factory
                            else ctypes.cast(None, _PARTIAL_CB))
        self._free = _FREE_CB(_free)

    # ctypes trampolines ever handed to the C++ side, kept alive for the
    # PROCESS lifetime: ws_server_stop drains handler threads with a bounded
    # wait, so in a pathological hang a detached thread could still call a
    # callback after this object is garbage-collected — a few leaked
    # function pointers are cheaper than a use-after-free interpreter crash
    _LIVE_CALLBACKS: list = []

    def start(self) -> int:
        NativeWSServer._LIVE_CALLBACKS.extend(
            [self._cb, self._partial_cb, self._free])
        rc = self.lib.ws_server_start2(self._port_arg, self._cb,
                                       self._partial_cb, self._free)
        if rc != 0:
            raise RuntimeError(f"ws_server_start failed: {rc}")
        self.port = int(self.lib.ws_server_port())
        logger.info("native WS ASR server listening on :%d", self.port)
        return self.port

    def stop(self) -> None:
        self.lib.ws_server_stop()


def start_offline_asr_server(engines=None, port: int = 10095,
                             apply_itn: bool = True) -> NativeWSServer:
    """Spin up the native server over the offline recognition engine."""
    if engines is None:
        from ..service.engines import build_engines
        engines = build_engines()

    def recognize(audio: np.ndarray, hotwords_json: str) -> str:
        del hotwords_json  # biasing integrates at decode; LLM uses hotwords
        sents = engines.diarizer.diarize(audio)
        text = "".join(s.text for s in sents)
        if apply_itn and text:
            from ..asr.itn import apply_itn as itn
            text = itn(text)
        return text

    server = NativeWSServer(
        recognize, port=port,
        streaming_factory=getattr(engines, "streaming_factory", None))
    server.start()
    return server
