"""N-gram language model fusion for offline decoding.

Equivalent of the reference's optional WFST n-gram LM
(`damo/speech_ngram_lm_zh-cn-ai-wesp-fst`, applied inside the FunASR C++
server and gated by FUNASR_DISABLE_LM — voice-service/start.py:73-99). Here:
an ARPA-format character LM (unigram..trigram with backoff) fused into the
NAR decoder's output by Viterbi rescoring over the top-k acoustic candidates
per token position:

    path score = Σ_t [ logP_acoustic(y_t) + λ · logP_LM(y_t | y_{t-2} y_{t-1}) ]

Host-side dynamic programming over (positions × k² transitions) — the
candidate set is tiny (k≈4, utterances ≤ ~64 tokens), so this costs
microseconds and needs no device work.
"""
from __future__ import annotations

import logging
import math
import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

logger = logging.getLogger("toolbox.ngram")

LOG10 = math.log(10.0)


class ArpaLM:
    """ARPA back-off LM over character tokens (orders 1..3)."""

    def __init__(self):
        self.logp: List[Dict[Tuple[str, ...], float]] = [{}, {}, {}]
        self.backoff: List[Dict[Tuple[str, ...], float]] = [{}, {}, {}]
        self.order = 1

    @classmethod
    def load(cls, path: str) -> "ArpaLM":
        lm = cls()
        order = 0
        with open(path, encoding="utf-8") as f:
            for raw in f:
                line = raw.strip()
                if not line or line.startswith("\\data"):
                    continue
                m = re.match(r"\\(\d)-grams:", line)
                if m:
                    order = int(m.group(1))
                    lm.order = max(lm.order, order)
                    continue
                if line.startswith("\\end"):
                    break
                if order == 0:
                    continue
                parts = line.split("\t")
                if len(parts) < 2:
                    parts = line.split()
                    if len(parts) < order + 1:
                        continue
                    prob, words = parts[0], parts[1:order + 1]
                    bo = parts[order + 1] if len(parts) > order + 1 else None
                else:
                    prob = parts[0]
                    words = parts[1].split()
                    bo = parts[2] if len(parts) > 2 else None
                key = tuple(words)
                try:
                    lm.logp[order - 1][key] = float(prob) * LOG10
                    if bo is not None:
                        lm.backoff[order - 1][key] = float(bo) * LOG10
                except ValueError:
                    continue
        logger.info("ARPA LM loaded: %s", [len(d) for d in lm.logp])
        return lm

    def score(self, context: Sequence[str], word: str) -> float:
        """log P(word | context) with back-off (natural log)."""
        ctx = tuple(context[-(self.order - 1):]) if self.order > 1 else ()
        for n in range(min(len(ctx), self.order - 1), -1, -1):
            key = ctx[len(ctx) - n:] + (word,)
            if key in self.logp[n]:
                bo = 0.0
                if n < len(ctx):
                    bo_key = ctx[len(ctx) - n - 1:]
                    bo = self.backoff[n].get(bo_key, 0.0) if n < 2 else 0.0
                return self.logp[n][key] + bo
            # accumulate? standard backoff: alpha(ctx) + P(word | shorter ctx)
        return self.logp[0].get((word,), math.log(1e-7))


def lm_rescore(token_ids: List[int], logprobs: np.ndarray, lm: ArpaLM,
               id_to_token: Sequence[str], lm_weight: float = 0.3,
               top_k: int = 4) -> List[int]:
    """Viterbi fusion over top-k acoustic candidates per position."""
    n = len(token_ids)
    if n == 0:
        return token_ids
    cands = np.argsort(-logprobs[:n], axis=-1)[:, :top_k]  # [n, k]
    k = cands.shape[1]
    # dp[j] = best score ending with candidate j at position t
    dp = np.full((k,), -np.inf)
    bp = np.zeros((n, k), np.int32)
    for j in range(k):
        tok = id_to_token[cands[0, j]] if cands[0, j] < len(id_to_token) else ""
        dp[j] = logprobs[0, cands[0, j]] + lm_weight * lm.score([], tok)
    for t in range(1, n):
        ndp = np.full((k,), -np.inf)
        for j in range(k):
            tid = cands[t, j]
            tok = id_to_token[tid] if tid < len(id_to_token) else ""
            ac = logprobs[t, tid]
            for i in range(k):
                prev_tok = id_to_token[cands[t - 1, i]] \
                    if cands[t - 1, i] < len(id_to_token) else ""
                s = dp[i] + ac + lm_weight * lm.score([prev_tok], tok)
                if s > ndp[j]:
                    ndp[j] = s
                    bp[t, j] = i
        dp = ndp
    j = int(np.argmax(dp))
    out = [0] * n
    for t in range(n - 1, -1, -1):
        out[t] = int(cands[t, j])
        j = int(bp[t, j])
    return out
