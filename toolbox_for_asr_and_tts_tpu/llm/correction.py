"""LLM post-correction client for medical-ASR text.

Port of the reference's `LLM_functions.py` (the module deployed as
`hg_deepseek`, survey §0): an OpenAI-compatible chat call that minimally
edits ASR text using a hotword list, with the same operating budget —
temperature 0, seed 42, max_tokens 840, JSON mode, 3 retries with
exponential backoff, 60 s timeout (LLM_functions.py:184-262). Public
surface matches the names the reference imports: `correct_text_only`,
`process_speech_result`, `load_hotwords_list`.

Endpoint/model/key come from env (LLM_BASE_URL, LLM_MODEL, LLM_API_KEY —
no checked-in keys, unlike the reference). Without an endpoint configured,
correction is a transparent no-op so the service degrades gracefully
(mirroring the reference's fallback-to-uncorrected behavior).
"""
from __future__ import annotations

import json
import logging
import os
import re
import time
from typing import List, Optional, Sequence

logger = logging.getLogger("toolbox.llm")

PROMPT_HEADER = (
    "你是医疗语音识别文本的纠错助手。请对输入文本做最小限度的修改：\n"
    "1. 仅修正明显的同音字/近音字错误，优先使用热词表中的词汇；\n"
    "2. 不改变句子结构，不增删语义内容；\n"
    "3. 不修正你不确定的内容；\n"
    "4. 保留原有标点；\n"
    "5. 输出 JSON：{\"corrected\": \"修正后的文本\"}。\n"
)

MAX_TOKENS = 840        # LLM_functions.py:208
TEMPERATURE = 0.0
SEED = 42
RETRIES = 3
TIMEOUT_S = 60.0


def _extract_json(text: str) -> Optional[dict]:
    """Robust JSON extraction (LLM_functions.py:151-181): direct parse, then
    the first {...} block."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        m = re.search(r"\{.*\}", text, re.DOTALL)
        if m:
            try:
                return json.loads(m.group(0))
            except json.JSONDecodeError:
                return None
    return None


class LLMCorrector:
    def __init__(self, base_url: Optional[str] = None,
                 model: Optional[str] = None,
                 api_key: Optional[str] = None):
        self.base_url = base_url or os.getenv("LLM_BASE_URL", "")
        self.model = model or os.getenv("LLM_MODEL", "qwen3-32b")
        self.api_key = api_key or os.getenv("LLM_API_KEY", "")

    @property
    def enabled(self) -> bool:
        return bool(self.base_url)

    def _call(self, messages: list) -> Optional[str]:
        import httpx
        url = self.base_url.rstrip("/") + "/chat/completions"
        payload = {
            "model": self.model,
            "messages": messages,
            "temperature": TEMPERATURE,
            "seed": SEED,
            "max_tokens": MAX_TOKENS,
            "response_format": {"type": "json_object"},
        }
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        delay = 1.0
        for attempt in range(RETRIES):
            try:
                # HTTP/1.1 forced, as the reference does (LLM_functions.py:201-211)
                with httpx.Client(http1=True, http2=False,
                                  timeout=TIMEOUT_S) as client:
                    r = client.post(url, json=payload, headers=headers)
                    r.raise_for_status()
                    return r.json()["choices"][0]["message"]["content"]
            except Exception as e:
                logger.warning("LLM call failed (attempt %d/%d): %s",
                               attempt + 1, RETRIES, e)
                time.sleep(delay)
                delay *= 2
        return None

    def correct_text_only(self, hotwords: Sequence[str], text: str) -> str:
        """Minimal-edit correction; returns input on any failure
        (LLM_functions.py:505-535)."""
        if not text or not self.enabled:
            return text
        prompt = PROMPT_HEADER + f"\n热词表：{'、'.join(hotwords)}\n输入文本：{text}"
        out = self._call([{"role": "user", "content": prompt}])
        if not out:
            return text
        obj = _extract_json(out)
        corrected = (obj or {}).get("corrected")
        if not corrected or not isinstance(corrected, str):
            return text
        # semantic-conservation guard: reject wildly different outputs
        if abs(len(corrected) - len(text)) > max(8, len(text) // 2):
            logger.warning("LLM correction rejected (length drift): %r", corrected)
            return text
        return corrected


_default = LLMCorrector()


def correct_text_only(latest_context=None, latest_options: Sequence[str] = (),
                      text: str = "", DEBUG: bool = False) -> str:
    """Signature-compatible with the reference's import sites
    (voice.py:831-836)."""
    del latest_context, DEBUG
    return _default.correct_text_only(list(latest_options), text)


def process_speech_result(hotwords: Sequence[str], text: str) -> str:
    """Reference `process_speech_result` (LLM_functions.py:571-626):
    correction plus hotword-priority pass-through."""
    return _default.correct_text_only(list(hotwords), text)


def load_hotwords_list(path: Optional[str] = None) -> List[str]:
    """Reference `load_hotwords_list` (LLM_functions.py:454-502): explicit
    path → HOTWORDS_FILE env → packaged assets/hotwords.txt → SYMS."""
    from ..asr.hotwords import load_hotwords_from_file, positive_hotword_list
    candidates = [path, os.getenv("HOTWORDS_FILE"),
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), "assets", "hotwords.txt")]
    for p in candidates:
        if p and os.path.exists(p):
            words = positive_hotword_list(load_hotwords_from_file(p))
            if words:
                return words
    from .syms import SYMS
    return list(SYMS)
