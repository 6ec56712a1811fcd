import gzip
import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.asr.hotword_bias import apply_hotword_bias  # noqa: E402


def _logprobs(ids, V=20, conf=5.0, weak=None):
    """Rows peaked at ids; positions in `weak` get a small margin."""
    n = len(ids)
    lp = np.full((n, V), -10.0)
    for i, t in enumerate(ids):
        lp[i, t] = -0.5
        if weak and i in weak:
            lp[i] = np.full(V, -3.0)
            lp[i, t] = -2.8  # tiny margin over alternatives
    # normalize-ish (not required by the algorithm)
    return lp


def test_bias_flips_weak_substitution():
    t2i = {"心": 3, "衰": 4, "竭": 5, "哀": 6}
    decoded = [3, 6, 5]  # 心哀竭 — middle char weakly decoded
    lp = _logprobs(decoded, weak=[1])
    out = apply_hotword_bias(decoded, lp, {"心衰竭": 20}, t2i)
    assert out == [3, 4, 5]


def test_bias_respects_confident_decode():
    t2i = {"心": 3, "衰": 4, "竭": 5, "哀": 6}
    decoded = [3, 6, 5]
    lp = _logprobs(decoded)  # confident everywhere
    out = apply_hotword_bias(decoded, lp, {"心衰竭": 20}, t2i)
    assert out == decoded  # margin too large to flip


def test_bias_exact_match_noop():
    t2i = {"心": 3, "衰": 4}
    decoded = [3, 4]
    lp = _logprobs(decoded)
    out = apply_hotword_bias(decoded, lp, {"心衰": 20}, t2i)
    assert out == decoded


def test_banned_word_demoted():
    t2i = {"那": 7, "个": 8}
    decoded = [7, 8]
    lp = _logprobs(decoded)
    out = apply_hotword_bias(decoded, lp, {"那个": -10}, t2i)
    assert out != decoded


def test_recognizer_accepts_hotwords():
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    from toolbox_for_asr_and_tts_tpu.models.paraformer import ParaformerConfig
    reco = Recognizer.random(ParaformerConfig(
        input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=1, decoder_layers=1, vocab_size=32), use_mesh=False)
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.2
    r = reco.transcribe([wav], hotwords={"一二": 20})
    assert isinstance(r[0].text, str)


# ------------------------------------------------------------- gzip + chat
def test_http_gzip(tmp_path):
    import asyncio
    import threading
    import time
    import httpx
    from toolbox_for_asr_and_tts_tpu.service.http import App, Response, Request

    app = App("gz")

    @app.get("/big")
    async def big(req: Request) -> Response:
        return Response.json({"data": "x" * 10000})

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0))
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(100):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)
    r = httpx.get(f"http://127.0.0.1:{app.port}/big",
                  headers={"Accept-Encoding": "gzip"})
    assert r.status_code == 200
    assert r.headers.get("content-encoding") == "gzip"
    assert r.json()["data"] == "x" * 10000  # httpx transparently decompresses


def test_chat_client_disabled_is_silent():
    from toolbox_for_asr_and_tts_tpu.llm.chat import ChatClient
    c = ChatClient(base_url="")
    assert c.chat_with_qwen("你好") == ""
    c.reset()
    assert len(c.history) == 1
