"""Bare-polyphone POS rules (tts/postagger.py) + held-out accuracy.

The accuracy set (tests/data/polyphone_eval.tsv) is EXTERNAL text: authored
for this evaluation, not drawn from the lexicon/rule sources, so it measures
generalization of the compound lexicon + particle rules + POS rules
together — the role ttsfrd's statistical tagger plays in the reference
(tts-service/Dockerfile:61-64). docs/G2P.md records the current table."""
import collections
import os

from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P

EVAL = os.path.join(os.path.dirname(__file__), "data", "polyphone_eval.tsv")


def _load_cases():
    cases = []
    with open(EVAL, encoding="utf-8") as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            marked, gold = ln.split("\t")
            pos = marked.index("[")
            text = marked.replace("[", "").replace("]", "")
            ch = marked[pos + 1]
            cases.append((text, pos, ch, gold))
    return cases


def _predicted(g2p, text, pos):
    """Syllable assigned to the char at `pos` (post-sandhi), tracking
    erhua merges by walking item char runs."""
    items = g2p._resolve(text)
    at = 0
    for chars, sy in items:
        if at <= pos < at + len(chars):
            return sy
        at += len(chars)
    return None


def test_polyphone_eval_accuracy():
    g = G2P()
    cases = _load_cases()
    assert len(cases) >= 60
    per_char = collections.defaultdict(lambda: [0, 0])
    failures = []
    for text, pos, ch, gold in cases:
        got = _predicted(g, text, pos)
        per_char[ch][1] += 1
        if got == gold:
            per_char[ch][0] += 1
        else:
            failures.append((text, ch, gold, got))
    total = sum(n for _, n in per_char.values())
    correct = sum(c for c, _ in per_char.values())
    acc = correct / total
    msg = "\n".join(f"{t}: {c} expected {g}, got {p}"
                    for t, c, g, p in failures)
    # held-out bar: ≥90% on external sentences (docs/G2P.md has the table)
    assert acc >= 0.90, f"accuracy {acc:.2%} ({correct}/{total})\n{msg}"


def test_specific_pos_rules():
    g = G2P()
    assert _predicted(g, "他把钱还给了我", 3) == "huan2"
    assert _predicted(g, "他还没有来", 1) == "hai2"
    assert _predicted(g, "她会弹钢琴", 2) == "tan2"
    assert _predicted(g, "他捡到一枚弹壳", 5) == "dan4"
    assert _predicted(g, "这篇作文要重写", 5) == "chong2"
    assert _predicted(g, "这个箱子很重", 5) == "zhong4"
    assert _predicted(g, "他被选为班长", 3) == "wei2"


def test_round4_parser_class_frames():
    """The 4 clause-level frames that closed the external set (docs/G2P.md):
    each asserted on a sentence OTHER than the eval item, plus an overfire
    guard on the common competing shape."""
    g = G2P()
    # 朝…暮/夕 parallelism → zhao1; bare dynasty stays chao2
    assert _predicted(g, "朝令夕改让人无所适从", 0) == "zhao1"
    assert _predicted(g, "唐朝的诗人很多", 1) == "chao2"
    # classical copular 为 + clause-final role NP → wei2; benefactive with a
    # following predicate keeps wei4 (incl. the 为人民 plural-person guard)
    assert _predicted(g, "人为刀俎，我为鱼肉", 6) == "wei2"
    assert _predicted(g, "为人民服务", 0) == "wei4"
    # 还 + bare place NP → huan2; adverb before a place phrase stays hai2
    assert _predicted(g, "告老还京的大臣", 2) == "huan2"
    assert _predicted(g, "他还故意迟到", 1) == "hai2"
    # 同行 + duration/aspect → xing2; the trade noun stays hang2
    assert _predicted(g, "我们同行了三天", 3) == "xing2"
    assert _predicted(g, "我们是同行", 4) == "hang2"


def test_round5_advisor_closures():
    """Round-5 advisor findings (ADVICE.md): overfires of the round-4
    frames on common modern shapes, each locked with its regression pair."""
    g = G2P()
    # directional 朝着/朝向 and dynasty 朝 beat the 朝…暮/夕 frame
    assert _predicted(g, "他朝着夕阳走去", 1) == "chao2"
    assert _predicted(g, "唐朝夕阳下的长安", 1) == "chao2"
    assert _predicted(g, "清朝的暮年", 1) == "chao2"
    assert _predicted(g, "朝发夕至", 0) == "zhao1"          # frame intact
    # a locked 了解 cannot license the travel reading of 同行
    assert _predicted(g, "几位同行了解这项技术", 3) == "hang2"
    assert _predicted(g, "我们同行了三天", 3) == "xing2"    # frame intact
    # 京沪/京津/京广 coordination after 还 stays the adverb
    assert _predicted(g, "山东还京沪两地都有分部", 2) == "hai2"
    assert _predicted(g, "告老还京的大臣", 2) == "huan2"    # frame intact


def test_rules_never_crash_on_edges():
    g = G2P()
    for text in ("还", "弹", "为", "着", "盛了", "一曲", "数"):
        assert g(text)  # phones come out, no exception
