"""Prosodic phrase-break prediction for long clauses (VERDICT-r3 #7).

The reference's compiled ttsfrd frontend (tts-service/Dockerfile:61-64)
predicts a prosodic hierarchy — word (#1), minor phrase (#2), phrase (#3),
intonation (#4) — so Sambert pauses inside long punctuation-free clauses.
This module adds the #2/#3 levels on top of the Viterbi word segmentation:
clauses longer than `max_phrase` syllables are cut at the best-scoring
word boundary by syntactic-window rules, and the break surfaces as a
`#sp` (minor) or `#br` (phrase) phone in the linguistic unit — symbols
the KAN-TTS phone set already carries (tts/pinyin_data.py SPECIALS), so a
real checkpoint's duration predictor gives them their trained pause
lengths.

Boundary scoring (hand-compiled from the shapes a syntactic parser would
license; cf. ttsfrd's statistical phrasing):

- break BEFORE a function word that opens a new phrase — preposition /
  conjunction / adverb (在/从/把/被/和/但/而/也/都/就…);
- break AFTER a clause-medial particle or copula (了/着/过/吗/吧/是/说);
- NEVER immediately after the clitics 的/地/得 (they bind the phrase
  that follows) or before them;
- plain word boundaries are last-resort cut points.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

Item = Tuple[str, Optional[str]]   # (char run, tone-numbered syllable)

# single-char function words that OPEN a phrase: break is good BEFORE a
# word starting with one (prepositions / conjunctions)
_PHRASE_OPENERS = set("在从对向给把被和与或但而并因由若如当像沿按趁凭靠连"
                      "跟同为自除至每")
# single-char adverbs (checked only when they ARE the whole next word)
_ADVERB_CHARS = set("也都还就又再才只更最")
# multi-char connectives/adverbs (checked against the whole next word)
_OPENER_WORDS = {"非常", "依然", "仍然", "已经", "正在", "马上", "立刻",
                 "终于", "突然", "因为", "所以", "如果", "但是", "而且",
                 "并且", "或者", "然后", "同时", "另外", "此外", "针对",
                 "关于", "对于", "除了", "为了"}
# particles/copulas that CLOSE a phrase: break is good AFTER them
_PHRASE_CLOSERS = set("了着过吧吗呢啊呀嘛是说")
# clitics that forbid an adjacent break on either side
_NO_BREAK = set("的地得")


@dataclasses.dataclass
class _Word:
    start: int          # first item index
    end: int            # last item index (inclusive)
    n_syl: int          # syllable-bearing items inside
    first: str          # first char
    last: str           # last char
    text: str = ""      # full word text (word-level opener checks)


def _words(items: Sequence[Item], spans: Sequence[int]) -> List[_Word]:
    """Reconstruct the word list from Viterbi spans; punctuation items
    (no syllable, non-alnum) become sentinel words with n_syl=0 that act
    as existing clause boundaries."""
    out: List[_Word] = []
    i = 0
    while i < len(items):
        ln = max(spans[i], 1)
        chunk = items[i:i + ln]
        n_syl = sum(1 for ch, sy in chunk
                    if sy is not None or (ch[:1].isascii()
                                          and ch[:1].isalnum()))
        out.append(_Word(i, i + ln - 1, n_syl, chunk[0][0][:1],
                         chunk[-1][0][-1:],
                         "".join(ch for ch, _ in chunk)))
        i += ln
    return out


def _boundary_score(prev: _Word, nxt: _Word) -> float:
    """Score for breaking BETWEEN prev and nxt (higher = better)."""
    if prev.last in _NO_BREAK or nxt.first in _NO_BREAK:
        return float("-inf")
    score = 1.0                       # any word boundary is a legal cut
    if nxt.first in _PHRASE_OPENERS:
        score += 4.0
    elif nxt.text in _OPENER_WORDS:
        score += 4.0
    elif nxt.text in _ADVERB_CHARS:
        score += 2.0
    if prev.last in _PHRASE_CLOSERS:
        score += 3.0
    if prev.n_syl >= 2 and nxt.n_syl >= 2:
        score += 0.5                  # multi-syllable words on both sides
    return score


def predict_breaks(items: Sequence[Item], spans: Sequence[int],
                   min_phrase: int = 4, max_phrase: int = 10,
                   strong_score: float = 5.0) -> Dict[int, int]:
    """item index → break level (2 = minor `#sp`, 3 = phrase `#br`)
    AFTER that item.

    Greedy phrasing: walk the words of each punctuation-free clause,
    accumulating syllables; once a phrase holds ≥ min_phrase syllables,
    remember the best-scoring boundary seen; when it would exceed
    max_phrase, cut at that boundary (falling back to the last legal one).
    Boundaries scoring ≥ strong_score become #3 (`#br`), others #2
    (`#sp`) — matching ttsfrd's minor/major phrase split."""
    words = _words(items, spans)
    breaks: Dict[int, int] = {}
    syl = 0                 # syllables in the open phrase
    best: Optional[Tuple[float, int, int]] = None   # (score, item, syl_at)
    for k, w in enumerate(words):
        if w.n_syl == 0:    # punctuation / space: clause boundary resets
            syl = 0
            best = None
            continue
        nxt = words[k + 1] if k + 1 < len(words) else None
        if syl + w.n_syl > max_phrase and best is not None:
            score, at_item, syl_at = best
            breaks[at_item] = 3 if score >= strong_score else 2
            syl -= syl_at
            best = None
        syl += w.n_syl
        if nxt is None or nxt.n_syl == 0:
            syl = 0
            best = None
            continue
        if syl >= min_phrase:
            s = _boundary_score(w, nxt)
            if s > float("-inf") and (best is None or s >= best[0]):
                best = (s, w.end, syl)
    return breaks
