"""Falsifiable prosodic-break evaluation (VERDICT round-4 #3).

The reference's compiled ttsfrd frontend carries a LEARNED prosodic-phrase
model (tts-service/Dockerfile:61-64); `tts/prosody.py` predicts the same
#2/#3 levels. This tool measures it against EXTERNALLY-authored boundaries:
each line of the data file is a passage quoted verbatim from published
prose, and the published author's internal punctuation (，；：、) marks the
gold boundaries — the classic punctuation-restoration proxy for
intonational-phrase breaks. The harness strips that punctuation, lets the
predictor re-phrase the resulting long punctuation-free stretch, and scores
the predicted boundaries against the stripped positions.

Metrics (strict exact-boundary matching):
- recall_major  — fraction of removed ，；： positions that got ANY
  predicted break (#2 or #3). These are clause-level boundaries; the
  module's job is to recover them.
- recall_dunhao — same for 、 (enumeration commas; sub-clause level,
  diagnostic only).
- precision_br  — fraction of predicted #3 (`#br`) breaks that sit on a
  removed-punctuation position.
- precision_any — same over #2∪#3. #2 is sub-comma phrasing by design, so
  this under-reports; reported for completeness.

Usage:
  python tools/prosody_eval.py [tests/data/prosody_break_eval.tsv] [-v]
"""
from __future__ import annotations

import json
import os
import sys

MAJOR = set("，；：")
DUNHAO = set("、")
TERMINAL = set("。！？")


def load_passages(path: str):
    out = []
    with open(path, encoding="utf-8") as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            passage, src = ln.split("\t")
            out.append((passage, src))
    return out


def split_sentences(passage: str):
    """Split on terminal punctuation; yield sentences (sans terminal)."""
    cur = []
    for ch in passage:
        if ch in TERMINAL:
            if cur:
                yield "".join(cur)
            cur = []
        else:
            cur.append(ch)
    if cur:
        yield "".join(cur)


def gold_and_stripped(sentence: str):
    """(stripped_text, {char_offset: klass}) — offset counts non-punct
    chars BEFORE the removed mark, i.e. a break belongs AFTER the char at
    offset-1 of the stripped text."""
    stripped = []
    gold = {}
    for ch in sentence:
        if ch in MAJOR:
            gold[len(stripped)] = "major"
        elif ch in DUNHAO:
            gold[len(stripped)] = "dunhao"
        elif ch in "“”‘’「」《》（）—…":
            continue
        else:
            stripped.append(ch)
    return "".join(stripped), gold


def predict_offsets(g2p, text: str):
    """{char_offset: level} — offsets in the same coordinates as gold."""
    from toolbox_for_asr_and_tts_tpu.tts.prosody import predict_breaks
    items = g2p._resolve(text)
    spans = g2p._word_spans(items)
    brk = predict_breaks(items, spans)
    # cumulative char offsets per item end
    out = {}
    at = 0
    for i, (chars, _sy) in enumerate(items):
        at += len(chars)
        if i in brk:
            out[at] = brk[i]
    return out


def evaluate(path: str, verbose: bool = False):
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g2p = G2P()
    n_major = n_major_hit = n_dun = n_dun_hit = 0
    n_p3 = n_p3_hit = n_pa = n_pa_hit = 0
    for passage, src in load_passages(path):
        for sent in split_sentences(passage):
            stripped, gold = gold_and_stripped(sent)
            if not gold:
                continue
            pred = predict_offsets(g2p, stripped)
            for off, klass in gold.items():
                hit = off in pred
                if klass == "major":
                    n_major += 1
                    n_major_hit += hit
                else:
                    n_dun += 1
                    n_dun_hit += hit
            for off, level in pred.items():
                n_pa += 1
                n_pa_hit += off in gold
                if level == 3:
                    n_p3 += 1
                    n_p3_hit += off in gold
            if verbose:
                shown = []
                at = 0
                for ch in stripped:
                    at += 1
                    shown.append(ch)
                    if at in pred and at in gold:
                        shown.append(f"[=#{pred[at]}]")
                    elif at in pred:
                        shown.append(f"[+#{pred[at]}]")
                    elif at in gold:
                        shown.append("[-]")
                sys.stderr.write("".join(shown) + f"   ({src})\n")
    res = {
        "recall_major": round(n_major_hit / max(n_major, 1), 4),
        "n_major": n_major,
        "recall_dunhao": round(n_dun_hit / max(n_dun, 1), 4),
        "n_dunhao": n_dun,
        "precision_br": round(n_p3_hit / max(n_p3, 1), 4),
        "n_br": n_p3,
        "precision_any": round(n_pa_hit / max(n_pa, 1), 4),
        "n_pred": n_pa,
        "file": os.path.basename(path),
    }
    print(json.dumps(res, ensure_ascii=False))
    return res


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    path = args[0] if args else os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        "prosody_break_eval.tsv")
    evaluate(path, verbose=("-v" in sys.argv))
