"""Speaker diarization: ASR sentences + CAM++ embeddings + host clustering.

Equivalent of the reference's `iic/speech_paraformer-large-vad-punc-spk`
pipeline (voice-service/app/services/voice_interface.py:759-848), which
returns `sentence_info`: per-sentence text, timestamps and speaker labels —
the structure `finalize()` groups by speaker (voice_interface.py:2108-2170).

TPU/host split (survey §7 hard parts): sentence embeddings run batched on
the TPU (models/campplus.py); agglomerative clustering over the handful of
sentence embeddings is sequential and runs on host numpy.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Sequence, Tuple

import numpy as np

logger = logging.getLogger("toolbox.diarization")


@dataclasses.dataclass
class Sentence:
    text: str
    start_ms: int
    end_ms: int
    spk: int = 0


def cluster_embeddings(embeddings: np.ndarray, threshold: float = 0.60,
                       max_speakers: int = 8) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine similarity.

    Merges the two closest clusters while their average similarity exceeds
    `threshold`; caps at max_speakers by continuing to merge the closest
    pair. Returns int labels, renumbered by first appearance.
    """
    n = len(embeddings)
    if n == 0:
        return np.zeros((0,), np.int32)
    x = np.asarray(embeddings, np.float64)
    x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-9)
    clusters: List[List[int]] = [[i] for i in range(n)]
    sim = x @ x.T

    def avg_sim(a: List[int], b: List[int]) -> float:
        return float(sim[np.ix_(a, b)].mean())

    while len(clusters) > 1:
        best, bi, bj = -2.0, -1, -1
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                s = avg_sim(clusters[i], clusters[j])
                if s > best:
                    best, bi, bj = s, i, j
        if best < threshold and len(clusters) <= max_speakers:
            break
        clusters[bi] = clusters[bi] + clusters[bj]
        del clusters[bj]
    labels = np.zeros(n, np.int32)
    for lbl, members in enumerate(clusters):
        for m in members:
            labels[m] = lbl
    # renumber by first appearance (stable speaker ids like the reference)
    order: Dict[int, int] = {}
    out = np.zeros(n, np.int32)
    for i, l in enumerate(labels):
        if l not in order:
            order[l] = len(order)
        out[i] = order[l]
    return out


class Diarizer:
    """Offline transcription with sentence timestamps + speaker labels."""

    def __init__(self, recognizer, verifier, punctuator=None,
                 cluster_threshold: float = 0.60,
                 gap_split_ms: int = 800):
        """gap_split_ms mirrors the reference's >800 ms-gap heuristic speaker
        split (voice_interface.py:2108-2170)."""
        self.recognizer = recognizer
        self.verifier = verifier
        self.punctuator = punctuator
        self.cluster_threshold = cluster_threshold
        self.gap_split_ms = gap_split_ms

    def _sentences_from_tokens(self, result) -> List[Sentence]:
        """Split a TranscribeResult into sentences at predicted sentence-final
        punctuation (the reference's `sentence_info` granularity) and at
        >gap_split_ms timestamp gaps."""
        toks, ts = result.tokens, result.timestamps_ms
        if not toks:
            return []
        final_after = set()
        if self.punctuator is not None:
            try:
                cls = self.punctuator.classify(toks)
                plist = self.punctuator.cfg.punc_list
                for i, c in enumerate(cls):
                    if int(c) < len(plist) and plist[int(c)] in "。？！；":
                        final_after.add(i)
            except Exception:
                logger.exception("punctuation classify failed; gaps only")
        sents: List[Sentence] = []
        start = 0
        for i in range(1, len(toks) + 1):
            gap = (ts[i] - ts[i - 1]) if i < len(toks) else self.gap_split_ms + 1
            if gap > self.gap_split_ms or (i - 1) in final_after:
                text = "".join(toks[start:i])
                sents.append(Sentence(text=text, start_ms=ts[start],
                                      end_ms=ts[i - 1] + 60))
                start = i
        return sents

    def diarize(self, wav: np.ndarray, sample_rate: int = 16000
                ) -> List[Sentence]:
        results = self.recognizer.transcribe([wav])
        sents = self._sentences_from_tokens(results[0])
        if not sents:
            return []
        segs = []
        for s in sents:
            a = int(s.start_ms * sample_rate / 1000)
            b = int(s.end_ms * sample_rate / 1000)
            b = max(b, a + sample_rate // 10)  # ≥100 ms for an embedding
            segs.append(np.asarray(wav[a:b], np.float32))
        emb = self.verifier.embed(segs)
        labels = cluster_embeddings(emb, self.cluster_threshold)
        for s, l in zip(sents, labels):
            s.spk = int(l)
        if self.punctuator is not None:
            for s in sents:
                s.text = self.punctuator.punctuate(s.text)
        return sents


def group_by_speaker(sents: Sequence[Sentence]) -> Dict[int, List[Sentence]]:
    """Reference `finalize` grouping (voice_interface.py:2108-2170)."""
    groups: Dict[int, List[Sentence]] = {}
    for s in sents:
        groups.setdefault(s.spk, []).append(s)
    return groups


def extract_speaker_audio(wav: np.ndarray, sents: Sequence[Sentence], spk: int,
                          sample_rate: int = 16000) -> np.ndarray:
    """Concatenate a speaker's segments (reference `_extract_speaker_audio`,
    voice_interface.py:2347-2388)."""
    parts = []
    for s in sents:
        if s.spk == spk:
            a = int(s.start_ms * sample_rate / 1000)
            b = int(s.end_ms * sample_rate / 1000)
            parts.append(np.asarray(wav[a:b], np.float32))
    if not parts:
        return np.zeros((0,), np.float32)
    return np.concatenate(parts)
