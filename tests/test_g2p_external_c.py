"""G2P accuracy on tranche C of the externally-authored polyphone set
(round 5, post-tranche-B-closures generalization measurement). First
contact was 45/55 = 81.8% (2026-08-20), recorded in docs/G2P.md BEFORE
closures; the tranche-C lexeme block in tts/polyphones.py (少/处-neutral/
模-idiom/什刹海/调-kitchen/和面 families + V过/X系/X少 misfire guards)
plus the 过-experiential, 系+NUM+CLF and 和-dough frames in
tts/postagger.py closed it to 55/55. As with tranches A and B, the 100%
is a REGRESSION number — KNOWN_MISSES stays as the mechanism for
surfacing new misses or silent fixes."""
import os

from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P

EVAL = os.path.join(os.path.dirname(__file__), "data",
                    "polyphone_eval_external_c.tsv")

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


def test_external_set_c_well_formed():
    cases = _load()
    assert len(cases) >= 50
    for text, pos, ch, gold, src in cases:
        assert src.strip(), (text,)
        assert gold[-1].isdigit(), (text, gold)


def test_external_polyphone_accuracy_tranche_c():
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


def test_new_frames_do_not_overfire():
    """Misfire probes for the tranche-C frame rules (docs/G2P.md): the
    experiential-过, 系+NUM+CLF and 和-dough frames plus the common-word
    locks must not disturb neighbouring shapes."""
    g = G2P()
    probes = [
        ("走过大桥就到了", 1, "guo4"),       # directional complement
        ("他没通过考试", 3, "guo4"),         # locked 通过
        ("他曾路过这里", 3, "guo4"),         # locked 路过
        ("没见过这么大的雪", 2, "guo5"),     # experiential after 没
        ("数学系一向很强", 2, "xi4"),        # 系 + 一向 is not tying
        ("联系一下他", 1, "xi4"),            # locked 联系
        ("棒上系一条长绳", 2, "ji4"),        # tying before NUM+CLF
        ("缺少年轻人", 1, "shao3"),          # 少年 must not match inside
        ("多少年过去了", 1, "shao3"),
        ("拉面和成都小吃都好吃", 2, "he2"),  # 成都 blocks the dough frame
        ("面和好了就醒发", 1, "huo2"),
    ]
    for text, pos, want in probes:
        assert _predicted(g, text, pos) == want, (text, pos, want)
