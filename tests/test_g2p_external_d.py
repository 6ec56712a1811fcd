"""G2P accuracy on tranche D of the externally-authored polyphone set
(round 5, post-tranche-C-closures generalization measurement). First
contact was 40/45 raw = 88.9% — 41/45 = 91.1% effective after one
gold-side normalization (转眼间 marked a 3-3 sandhi position against the
set's own rules; the post-sandhi zhuan2 the system produced is correct) —
recorded in docs/G2P.md BEFORE closures. The tranche-D closures
(lexical V+得 words, the 穿着 noun/durative context rule, 小将 with a
disposal-从小将 guard, 倒入 + dao3-fall guards) closed it to 45/45. As
with tranches A-C, the 100% is a REGRESSION number — KNOWN_MISSES stays
as the mechanism for surfacing new misses or silent fixes."""
import os

from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P

EVAL = os.path.join(os.path.dirname(__file__), "data",
                    "polyphone_eval_external_d.tsv")

KNOWN_MISSES = set()


def _load():
    cases = []
    with open(EVAL, encoding="utf-8") as f:
        for ln in f:
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            marked, gold, src = ln.split("\t")
            pos = marked.index("[")
            text = marked.replace("[", "").replace("]", "")
            cases.append((text, pos, marked[pos + 1], gold, src))
    return cases


def _predicted(g2p, text, pos):
    at = 0
    for chars, sy in g2p._resolve(text):
        if at <= pos < at + len(chars):
            return sy
        at += len(chars)
    return None


def test_external_set_d_well_formed():
    cases = _load()
    assert len(cases) >= 40
    for text, pos, ch, gold, src in cases:
        assert src.strip(), (text,)
        assert gold[-1].isdigit(), (text, gold)


def test_external_polyphone_accuracy_tranche_d():
    g = G2P()
    cases = _load()
    hits, misses = 0, []
    for text, pos, ch, gold, src in cases:
        if _predicted(g, text, pos) == gold:
            hits += 1
        else:
            misses.append((text, pos))
    acc = hits / len(cases)
    unexpected = [m for m in misses if m not in KNOWN_MISSES]
    silently_fixed = [m for m in KNOWN_MISSES if m not in misses]
    assert not unexpected, (acc, unexpected)
    assert acc >= 0.93, (acc, misses)
    assert not silently_fixed, silently_fixed


def test_tranche_d_closures_do_not_overfire():
    """Misfire probes for the tranche-D closures (docs/G2P.md)."""
    g = G2P()
    probes = [
        ("从小将他养大成人", 2, "jiang1"),   # disposal 将 after 从小
        ("这名小将在比赛中夺冠", 3, "jiang4"),
        ("他的穿着十分讲究", 3, "zhuo2"),    # noun attire
        ("她穿着一件红色的大衣", 2, "zhe5"),  # durative + object
        ("他变得更加自信", 2, "de5"),        # lexical V+得
        ("测得的数据", 1, "de2"),            # attainment 得 untouched
        ("他摔倒在地", 2, "dao3"),           # fall-compound guard
        ("把水倒入锅中", 2, "dao4"),
    ]
    for text, pos, want in probes:
        assert _predicted(g, text, pos) == want, (text, pos, want)
