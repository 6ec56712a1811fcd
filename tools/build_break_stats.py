"""Compile prosodic-break statistics from the TRAIN split (VERDICT-r4 #3).

This is the `build_polyphone_lexicon.py` trick applied to phrasing: the
reference ships ttsfrd's LEARNED prosodic-phrase model as compiled data
(tts-service/Dockerfile:61-64); here the equivalent statistics are compiled
OFFLINE from externally-published prose (tests/data/prosody_break_train.tsv,
verbatim passages with citations — the author's internal punctuation is the
boundary signal) into a checked-in Python table
(toolbox_for_asr_and_tts_tpu/tts/break_stats.py) that tts/prosody.py's DP
decoder consumes at runtime. The eval split (prosody_break_eval.tsv) is
never read here — fitting and measurement stay disjoint.

For every boundary between adjacent segmentation words in a stripped
sentence we record whether the published author put a comma there, keyed by
four backoff features: right word text, left word text, right first char,
left last char; plus the histogram of comma-segment lengths in syllables.

Usage:  python tools/build_break_stats.py          # rewrites break_stats.py
        python tools/build_break_stats.py --dry    # print summary only
"""
from __future__ import annotations

import importlib.util
import os
import sys
from collections import Counter

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

TRAIN = os.path.join(_REPO, "tests", "data", "prosody_break_train.tsv")
OUT = os.path.join(_REPO, "toolbox_for_asr_and_tts_tpu", "tts",
                   "break_stats.py")

# share the passage/strip helpers with the eval harness — same coordinates
_spec = importlib.util.spec_from_file_location(
    "prosody_eval", os.path.join(_HERE, "prosody_eval.py"))
_pe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_pe)


def collect():
    from toolbox_for_asr_and_tts_tpu.tts.prosody import _words
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g2p = G2P()
    r_word, l_word = Counter(), Counter()
    r_word_n, l_word_n = Counter(), Counter()
    r_char, l_char = Counter(), Counter()
    r_char_n, l_char_n = Counter(), Counter()
    seg_len = Counter()
    n_break = n_bound = 0
    for passage, _src in _pe.load_passages(TRAIN):
        for sent in _pe.split_sentences(passage):
            stripped, gold = _pe.gold_and_stripped(sent)
            items = g2p._resolve(stripped)
            spans = g2p._word_spans(items)
            words = _words(items, spans)
            # char offset at the END of each word
            ends = []
            at = 0
            i = 0
            for w in words:
                seg = items[w.start:w.end + 1]
                at += sum(len(ch) for ch, _ in seg)
                ends.append(at)
            syl_since = 0
            for k, w in enumerate(words):
                syl_since += w.n_syl
                if k + 1 >= len(words):
                    if syl_since:
                        seg_len[syl_since] += 1
                    break
                nxt = words[k + 1]
                if w.n_syl == 0 or nxt.n_syl == 0:
                    if w.n_syl == 0:
                        syl_since = 0
                    continue
                is_break = ends[k] in gold
                n_bound += 1
                n_break += is_break
                r_word_n[nxt.text] += 1
                l_word_n[w.text] += 1
                r_char_n[nxt.first] += 1
                l_char_n[w.last] += 1
                if is_break:
                    r_word[nxt.text] += 1
                    l_word[w.text] += 1
                    r_char[nxt.first] += 1
                    l_char[w.last] += 1
                    seg_len[syl_since] += 1
                    syl_since = 0
    return dict(base=(n_break, n_bound),
                r_word={w: (r_word[w], n) for w, n in r_word_n.items()
                        if n >= 2},
                l_word={w: (l_word[w], n) for w, n in l_word_n.items()
                        if n >= 2},
                r_char={c: (r_char[c], n) for c, n in r_char_n.items()},
                l_char={c: (l_char[c], n) for c, n in l_char_n.items()},
                seg_len=dict(seg_len))


def emit(stats) -> str:
    def fmt(d):
        lines = []
        for k in sorted(d):
            lines.append(f"    {k!r}: {d[k]!r},")
        return "{\n" + "\n".join(lines) + "\n}"
    n_break, n_bound = stats["base"]
    return f'''"""Prosodic-break statistics — GENERATED, do not hand-edit.

Compiled by tools/build_break_stats.py from
tests/data/prosody_break_train.tsv (externally-published passages, cited
per line; the author's internal punctuation is the boundary label). This
is the data half of the ttsfrd-grade statistical phrasing the reference
ships compiled (tts-service/Dockerfile:61-64); tts/prosody.py's DP decoder
turns these counts into boundary log-odds at runtime.

Regenerate after extending the train split:
    python tools/build_break_stats.py

Base rate: {n_break}/{n_bound} word boundaries carry a published comma.
Counts are (breaks, total) per feature value; word tables keep features
seen >= 2 times. SEG_LEN is the histogram of comma-segment lengths in
syllables.
"""

BASE = ({n_break}, {n_bound})
R_WORD = {fmt(stats["r_word"])}
L_WORD = {fmt(stats["l_word"])}
R_CHAR = {fmt(stats["r_char"])}
L_CHAR = {fmt(stats["l_char"])}
SEG_LEN = {fmt(stats["seg_len"])}
'''


def main():
    stats = collect()
    n_break, n_bound = stats["base"]
    print(f"boundaries: {n_bound}, breaks: {n_break} "
          f"(base rate {n_break / max(n_bound, 1):.3f})")
    print(f"r_word features: {len(stats['r_word'])}, "
          f"l_word: {len(stats['l_word'])}, "
          f"r_char: {len(stats['r_char'])}, l_char: {len(stats['l_char'])}")
    top = sorted(stats["r_word"].items(),
                 key=lambda kv: kv[1][0] / (kv[1][1] + 1), reverse=True)[:15]
    print("top break-attracting right words:",
          " ".join(f"{w}:{k}/{n}" for w, (k, n) in top))
    if "--dry" not in sys.argv:
        with open(OUT, "w", encoding="utf-8") as f:
            f.write(emit(stats))
        print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
