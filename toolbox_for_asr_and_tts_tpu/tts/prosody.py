"""Prosodic phrase-break prediction for long clauses (VERDICT-r3 #7,
statistical layer VERDICT-r4 #3).

The reference's compiled ttsfrd frontend (tts-service/Dockerfile:61-64)
predicts a prosodic hierarchy — word (#1), minor phrase (#2), phrase (#3),
intonation (#4) — so Sambert pauses inside long punctuation-free clauses.
This module adds the #2/#3 levels on top of the Viterbi word segmentation,
and the break surfaces as a `#sp` (minor) or `#br` (phrase) phone in the
linguistic unit — symbols the KAN-TTS phone set already carries
(tts/pinyin_data.py SPECIALS), so a real checkpoint's duration predictor
gives them their trained pause lengths.

Two scoring layers feed ONE dynamic-programming decode per clause:

- RULES (hand-compiled from the shapes a syntactic parser would license):
  break BEFORE a function word that opens a new phrase (在/从/把/被/和/但/
  而/也/都/就…); break AFTER a clause-medial particle or copula
  (了/着/过/吗/吧/是/说); NEVER adjacent to the clitics 的/地/得.
- STATISTICS (tts/break_stats.py, compiled offline by
  tools/build_break_stats.py from published prose where the author's
  internal punctuation marks the boundaries — the data half of ttsfrd's
  learned phrasing): per-boundary log-odds from right-word / left-word
  tables with character backoff, plus a comma-segment length model.

The DP picks the break set maximizing Σ segment-length log-prob +
Σ boundary net scores, so breaks appear only where the evidence beats the
insertion cost — short clauses stay whole, long clauses phrase at the
statistically-licensed boundaries. First-contact numbers against the
held-out eval split are recorded in docs/G2P.md §prosody.
"""
from __future__ import annotations

import dataclasses
import math
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
# solo monosyllabic adverbs bind their verb phrase: never cut directly
# after one (我母亲便|把我喊醒) nor directly before one (说了|再做) —
# round-5 tranche-D closure, docs/G2P.md §prosody tranche D
_SOLO_ADVERBS = _ADVERB_CHARS | set("便即则乃")


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
    if prev.text in _SOLO_ADVERBS:
        return float("-inf")          # 我母亲便|把我喊醒 never cuts there
    if nxt.text in _SOLO_ADVERBS and prev.last in "了着过":
        return float("-inf")
        # tranche-D closure (replaces a +2 bonus toward breaking before a
        # solo adverb): the V了|再V parallel-predicate shape (说了|再做)
        # must not cut before the adverb, but a subject|adverb-predicate
        # boundary (血压和血糖水平|都已经恢复) remains the DP's preferred
        # phrasing. Measured across the three held-out tranches
        # (docs/G2P.md §prosody tranche D).
    score = 1.0                       # any word boundary is a legal cut
    if nxt.first in _PHRASE_OPENERS:
        score += 4.0
    elif nxt.text in _OPENER_WORDS:
        score += 4.0
    if prev.last in _PHRASE_CLOSERS:
        score += 3.0
    if prev.n_syl >= 2 and nxt.n_syl >= 2:
        score += 0.5                  # multi-syllable words on both sides
    return score


# ---------------------------------------------------------------- stats
# Compiled boundary statistics (tts/break_stats.py) → smoothed log-odds
# tables + a segment-length log-prob model, loaded once.
_W_RULE = 0.3          # weight of (rule score − base) in the net boundary
_W_STAT = 1.2          # weight of the statistical log-odds
_BREAK_COST = 0.4      # insertion cost a break must overcome
# ^ grid-tuned on the TRAIN split only (tests/data/prosody_break_train.tsv,
#   2026-08-20: R=0.74 P=0.76 in-sample); the eval split stayed untouched.
_LO_CAP = 2.5          # cap per-feature log-odds (tiny-count sanity)
_ALPHA = 3.0           # pseudo-counts pulling features toward base rate
_MAX_SEG = 12          # hard cap on segment syllables (test contract ≤13)

_STATS: Optional[dict] = None


def _load_stats() -> Optional[dict]:
    global _STATS
    if _STATS is None:
        try:
            from . import break_stats as S
        except ImportError:        # stats not compiled: rules-only decode
            _STATS = {}
            return _STATS
        n_break, n_bound = S.BASE
        p0 = max(n_break, 1) / max(n_bound, 2)
        base_lo = math.log(p0 / (1.0 - p0))

        def lo_table(raw):
            out = {}
            for key, (k, n) in raw.items():
                p = (k + _ALPHA * p0) / (n + _ALPHA)
                v = math.log(p / (1.0 - p)) - base_lo
                out[key] = max(-_LO_CAP, min(_LO_CAP, v))
            return out

        total = sum(S.SEG_LEN.values()) or 1
        max_l = max(S.SEG_LEN) if S.SEG_LEN else _MAX_SEG
        seg_logp = []
        for length in range(0, max_l + 1):
            c = S.SEG_LEN.get(length, 0)
            seg_logp.append(math.log((c + 0.5) / (total + 0.5 * (max_l + 1))))
        _STATS = dict(r_word=lo_table(S.R_WORD), l_word=lo_table(S.L_WORD),
                      r_char=lo_table(S.R_CHAR), l_char=lo_table(S.L_CHAR),
                      seg_logp=seg_logp)
    return _STATS


def _stat_logodds(prev: _Word, nxt: _Word) -> float:
    st = _load_stats()
    if not st:
        return 0.0
    right = st["r_word"].get(nxt.text)
    if right is None:
        right = st["r_char"].get(nxt.first, 0.0)
    left = st["l_word"].get(prev.text)
    if left is None:
        left = st["l_char"].get(prev.last, 0.0)
    return right + left


def _seg_logp(n_syl: int) -> float:
    st = _load_stats()
    if not st:
        return 0.0
    table = st["seg_logp"]
    return table[min(n_syl, len(table) - 1)]


def predict_breaks(items: Sequence[Item], spans: Sequence[int],
                   min_phrase: int = 4, max_phrase: int = 10,
                   strong_score: float = 5.0) -> Dict[int, int]:
    """item index → break level (2 = minor `#sp`, 3 = phrase `#br`)
    AFTER that item.

    Per punctuation-free clause, a DP chooses the break set maximizing
    Σ segment-length log-prob + Σ boundary net score, where a boundary's
    net score is _W_RULE·(rule−1) + _W_STAT·stat_logodds − _BREAK_COST
    (−inf at 的/地/得 adjacency). Segments are capped at _MAX_SEG
    syllables when any legal cut exists. Boundaries whose RULE score
    reaches `strong_score` become #3 (`#br`) — the syntactically licensed
    phrase level — and statistics-only cuts surface as #2 (`#sp`),
    matching ttsfrd's minor/major split."""
    words = _words(items, spans)
    breaks: Dict[int, int] = {}
    clause: List[_Word] = []
    for k, w in enumerate(words):
        if w.n_syl == 0:    # punctuation / space: clause boundary
            _decode_clause(clause, breaks, strong_score)
            clause = []
            continue
        clause.append(w)
    _decode_clause(clause, breaks, strong_score)
    return breaks


def _decode_clause(ws: List[_Word], breaks: Dict[int, int],
                   strong_score: float) -> None:
    m = len(ws)
    if m < 2:
        return
    # net boundary scores after local word i (i in 0..m-2)
    rule = [0.0] * (m - 1)
    net = [0.0] * (m - 1)
    for i in range(m - 1):
        r = _boundary_score(ws[i], ws[i + 1])
        rule[i] = r
        if r == float("-inf"):
            net[i] = float("-inf")
        else:
            net[i] = (_W_RULE * (r - 1.0)
                      + _W_STAT * _stat_logodds(ws[i], ws[i + 1])
                      - _BREAK_COST)
    pre = [0] * (m + 1)      # prefix syllable counts
    for i, w in enumerate(ws):
        pre[i + 1] = pre[i] + w.n_syl

    def run_dp(cap: int):
        NEG = float("-inf")
        dp = [NEG] * (m + 1)
        back = [0] * (m + 1)
        dp[0] = 0.0
        for i in range(1, m + 1):
            for j in range(i - 1, -1, -1):
                seg = pre[i] - pre[j]
                if seg > cap and j < i - 1:
                    break
                if dp[j] == NEG:
                    continue
                s = dp[j] + _seg_logp(seg)
                if i < m:
                    if net[i - 1] == NEG:
                        continue
                    s += net[i - 1]
                if s > dp[i]:
                    dp[i] = s
                    back[i] = j
        return dp, back

    dp, back = run_dp(_MAX_SEG)
    if dp[m] == float("-inf"):   # 的/地/得 walls made the cap infeasible
        dp, back = run_dp(10 ** 9)
        if dp[m] == float("-inf"):
            return
    cuts = []
    i = m
    while i > 0:
        j = back[i]
        if i < m:
            cuts.append(i - 1)
        i = j
    for c in cuts:
        breaks[ws[c].end] = 3 if rule[c] >= strong_score else 2
