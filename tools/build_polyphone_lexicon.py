"""Derive a statistical polyphone word-lexicon from jieba's POS dictionary.

ROADMAP #11 ("open-domain polyphone tail needs a real tagger"): the
reference's native ttsfrd frontend resolves polyphones with a statistical
POS tagger (reference tts-service/Dockerfile:61-64). Instead of running a
tagger at synthesis time, this tool compiles the same statistical signal
OFFLINE: jieba's MIT-licensed `dict.txt` carries (word, freq, POS) for
349k words, and for a curated set of polyphone characters the word-level
POS determines the reading (还 as a verb is huan2, as an adverb hai2;
弹 nouns are dan4, verbs tan2; …).

Per character we only use the POS directions that are actually RELIABLE in
jieba's tagging (verified by hand against the generated output):

- jieba tags many verb-derived nouns as `n` (传统/扫地/畜牧), so e.g. 传
  only maps v/vn→chuan2 and never n→zhuan4 (传记-class words are few and
  hand-listed in tts/polyphones.py instead).
- known mis-tags are blacklisted (还有/还好 are `v` in jieba but read hai2;
  动弹 is dong4 tan5; 耕种 reads zhong4; …).

Words containing ANY OTHER ambiguous char (≥2 distinct readings across the
table + WORD_PINYIN + the POS maps, or a contextual-rule char) are skipped
so a generated entry can never hard-lock a wrong reading for a neighbour
polyphone (中弹 would otherwise lock 中=zhong1).

Output: toolbox_for_asr_and_tts_tpu/assets/polyphone_lexicon.tsv with `word<TAB>pinyin<TAB>freq`
lines, loaded by G2P at init BELOW tts/polyphones.py precedence (authored
entries always win). The file is committed — deployments don't need jieba.

Rebuild: PYTHONPATH=. python tools/build_polyphone_lexicon.py
"""
from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

JIEBA_DICT = os.path.join(
    os.path.dirname(re.__file__), "..",  # overwritten below if jieba exists
)

# reading by POS tag, per char, CLEAN directions only
POS_MAPS = {
    "还": {"v": "huan2", "d": "hai2"},
    "弹": {"v": "tan2", "n": "dan4", "nz": "dan4"},
    "数": {"v": "shu3", "n": "shu4", "m": "shu4", "vn": "shu4"},
    "种": {"v": "zhong4", "vn": "zhong4", "n": "zhong3", "q": "zhong3"},
    "传": {"v": "chuan2", "vn": "chuan2"},
    "扫": {"v": "sao3"},
    "缝": {"v": "feng2", "vn": "feng2", "n": "feng4"},
    "铺": {"v": "pu1", "vn": "pu1", "n": "pu4"},
    "畜": {"n": "chu4"},
    "扇": {"v": "shan1", "n": "shan4", "q": "shan4"},
}

# jieba mis-tags / lexical exceptions, applied before the POS map;
# value None drops the word entirely (authored elsewhere or genuinely odd)
OVERRIDES = {
    "还有": "hai2 you3", "还好": "hai2 hao3",
    "动弹": "dong4 tan5",
    "耕种": "geng1 zhong4",
    "缝纫": "feng2 ren4", "缝纫机": "feng2 ren4 ji1", "缝制": "feng2 zhi4",
    "铺筑": "pu1 zhu4", "铺垫": "pu1 dian4", "铺路": "pu1 lu4",
    "铺张": "pu1 zhang1",
    "畜牧": "xu4 mu4", "畜牧业": "xu4 mu4 ye4", "畜产": "xu4 chan3",
    "畜产品": "xu4 chan3 pin3",
    # review wave over the first generated output (all 305 entries read):
    # 种 farm verbs tagged n; 育种 is the zhong3 noun despite the v tag
    "种菜": "zhong4 cai4", "种田": "zhong4 tian2",
    "种植业": "zhong4 zhi2 ye4", "种植园": "zhong4 zhi2 yuan2",
    "育种": "yu4 zhong3",
    # 弹 music/elastic senses tagged n (tan2), 防弹 tagged v (dan4)
    "弹指": "tan2 zhi3", "弹词": "tan2 ci2", "弹压": "tan2 ya1",
    "弹唱": "tan2 chang4", "弹奏": "tan2 zou4", "弹力": "tan2 li4",
    "弹性体": "tan2 xing4 ti3", "防弹": "fang2 dan4",
    # 数 verb senses tagged n/m
    "历数": "li4 shu3", "要数": "yao4 shu3",
    # the OTHER char is the polyphone (解数 xiè, 经传 zhuàn, 裁缝 feng5)
    "解数": "xie4 shu4", "经传": "jing1 zhuan4", "裁缝": "cai2 feng5",
}

MIN_FREQ = 50
CJK_WORD = re.compile(r"^[一-鿿]{2,4}$")


def ambiguous_chars() -> set:
    """Chars with ≥2 distinct readings across the shipped data, plus the
    contextual-rule chars — a generated word containing one of these (other
    than the word's own target char) is skipped."""
    from toolbox_for_asr_and_tts_tpu.tts.pinyin_data import PINYIN_TABLE
    from toolbox_for_asr_and_tts_tpu.tts.polyphones import WORD_PINYIN
    from toolbox_for_asr_and_tts_tpu.tts.postagger import RULES

    readings = defaultdict(set)
    for c, p in PINYIN_TABLE.items():
        readings[c].add(p)
    for w, py in WORD_PINYIN.items():
        for c, p in zip(w, py.split()):
            readings[c].add(p)
    for c, m in POS_MAPS.items():
        readings[c].update(m.values())
    amb = {c for c, rs in readings.items() if len(rs) > 1}
    amb |= set(RULES)
    # contextual particle chars (resolved at runtime, never lock statically)
    amb |= set("地得了着只数子")
    return amb


def main() -> None:
    import jieba  # noqa: F401  (source dictionary)
    from toolbox_for_asr_and_tts_tpu.tts.pinyin_data import PINYIN_TABLE
    from toolbox_for_asr_and_tts_tpu.tts.polyphones import WORD_PINYIN

    dict_path = os.path.join(os.path.dirname(jieba.__file__), "dict.txt")
    amb = ambiguous_chars()
    out = {}
    freqs = {}
    for line in open(dict_path, encoding="utf-8"):
        w, f, pos = line.split()
        if not CJK_WORD.match(w) or int(f) < MIN_FREQ or w in WORD_PINYIN:
            continue
        if w in OVERRIDES:
            if OVERRIDES[w]:
                out[w] = OVERRIDES[w]
                freqs[w] = int(f)
            continue
        targets = [c for c in set(w) if c in POS_MAPS and pos in POS_MAPS[c]]
        if len(targets) != 1:
            continue
        tgt = targets[0]
        # no other ambiguous char may be locked by this entry
        if any(c in amb and c != tgt for c in w):
            continue
        if any(c not in PINYIN_TABLE for c in w):
            continue
        py = " ".join(POS_MAPS[tgt][pos] if c == tgt else PINYIN_TABLE[c]
                      for c in w)
        out[w] = py
        freqs[w] = int(f)

    # validation: every syllable must encode (no <unk> phones)
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import (G2P, PhoneVocab,
                                                               text_to_phone_ids)
    g, vocab = G2P(words=out), PhoneVocab.default()
    bad = [w for w in out
           if vocab.to_id[vocab.UNK] in text_to_phone_ids(w, g, vocab)]
    assert not bad, f"unencodable entries: {bad[:10]}"

    path = os.path.join(os.path.dirname(__file__), "..",
                        "toolbox_for_asr_and_tts_tpu", "assets",
                        "polyphone_lexicon.tsv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("# generated by tools/build_polyphone_lexicon.py — "
                "POS-derived polyphone words (see module docstring).\n"
                "# word<TAB>pinyin<TAB>jieba-freq. Authored "
                "tts/polyphones.py entries always take precedence.\n")
        for w in sorted(out, key=lambda w: (-freqs[w], w)):
            f.write(f"{w}\t{out[w]}\t{freqs[w]}\n")
    print(f"wrote {len(out)} entries to {path}")


if __name__ == "__main__":
    main()
