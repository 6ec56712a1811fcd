"""Word-segmentation (word_segment prosody stream) tests.

The reference's ttsfrd frontend statistically segments text before prosody
(tts-service/Dockerfile:61-64); here the uni-gram Viterbi pass in
tts/segmenter.py over the authored lexicon (tts/segwords.py) supplies the
same stream. These tests lock: (1) DP beats greedy longest-match on the
classic 研究生命 ambiguity, (2) ordinary words get real word marks instead
of degrading to singles, (3) out-of-lexicon text degrades to singles and
never falsely merges, and (4) segmentation can never change pronunciations.
"""
import pytest

from toolbox_for_asr_and_tts_tpu.tts.segmenter import segment, viterbi_spans
from toolbox_for_asr_and_tts_tpu.tts.segwords import general_words
from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P


@pytest.fixture(scope="module")
def words():
    return general_words()


@pytest.fixture(scope="module")
def g2p():
    return G2P()


def _seg(text, words):
    return segment(text, words, max(len(w) for w in words))


def _greedy(text, words):
    """Greedy longest-match baseline (what round-2 _word_spans did)."""
    out, i, mx = [], 0, max(len(w) for w in words)
    while i < len(text):
        for ln in range(min(mx, len(text) - i), 0, -1):
            if ln == 1 or text[i:i + ln] in words:
                out.append(text[i:i + ln])
                i += ln
                break
    return out


def test_dp_beats_greedy_on_overlap(words):
    # greedy longest-match over-commits to the 3-char entries 生活费/皮肤科
    # and strands the next char; the DP pass scores whole segmentations so
    # the two-word reading wins. Guard against the lexicon drifting into
    # making these cases vacuous: greedy must actually diverge.
    for text, want in [("生活费用", ["生活", "费用"]),
                       ("皮肤科学很有趣", ["皮肤", "科学"])]:
        assert _greedy(text, words)[:2] != want
        assert _seg(text, words)[:2] == want


def test_adjacent_words_never_strand_oov(words):
    # OOV singles must cost more than any lexicon word, or two adjacent
    # real words mis-segment into word+stranded char (大学习惯 → 大|学习|惯)
    assert _seg("大学习惯", words) == ["大学", "习惯"]
    assert _seg("合同事故", words) == ["合同", "事故"]
    assert _seg("剂量血压", words) == ["剂量", "血压"]


def test_single_char_lexicon_entry_not_penalized(words):
    # a single-char lexicon word (醋, tier 3) must never cost more than an
    # unknown char, else listing it biases the DP against it
    from toolbox_for_asr_and_tts_tpu.tts.segmenter import OOV_COST, WORD_BASE
    assert "醋" in words
    assert min(WORD_BASE - words["醋"], OOV_COST) <= OOV_COST
    assert _seg("喝醋", words) == ["喝", "醋"]


def test_oov_cost_exceeds_all_word_costs(words):
    # the invariant the cost model rests on (segmenter.py): every lexicon
    # word is cheaper per item than an OOV single
    from toolbox_for_asr_and_tts_tpu.tts.segmenter import OOV_COST, WORD_BASE
    assert max(WORD_BASE - t for t in words.values()) < OOV_COST


def test_everyday_words_segment(words):
    assert _seg("我们今天去医院", words) == ["我们", "今天", "去", "医院"]


def test_oov_degrades_to_singles(words):
    # characters with no lexicon word between them must never merge
    out = _seg("刘翟骁", words)
    assert out == ["刘", "翟", "骁"]


def test_spans_contract(words):
    # viterbi_spans returns the _word_spans contract: length at word start,
    # 0 inside a word, covers every item exactly once
    chars = list("我们去医院")
    spans = viterbi_spans(chars, words, max(len(w) for w in words))
    assert spans == [2, 0, 1, 2, 0]


def test_word_pos_stream_marks_words(g2p):
    # word_pos: 1 begin · 2 middle · 3 end · 4 single (text_frontend.py)
    phones = g2p("我们去医院")
    pos = [p.word_pos for p in phones if not p.is_punct]
    # 我们 → begin,end; 去 → single; 医院 → begin,end — each syllable emits
    # initial+final phones sharing the word_pos
    assert 1 in pos and 3 in pos and 4 in pos
    # first syllable of 我们 is a word begin, not a single
    assert pos[0] == 1


def test_segmentation_never_changes_pronunciation(g2p):
    # 银行 (hang2) and 重要 (zhong4) ride the pronunciation lexicon; the
    # segmentation lexicon must not alter their syllables
    syms = [(p.symbol, p.tone) for p in g2p("去银行很重要")]
    flat = "".join(s for s, _ in syms)
    assert "ang" in flat          # hang2 final present
    tones = {s: t for s, t in syms}
    assert tones.get("ang") == 2   # 行 → hang2
    assert tones.get("ong") == 4   # 重 → zhong4


def test_word_pos_stream_well_formed_over_lexicon(g2p, words):
    # every seg-lexicon word, dropped into a carrier sentence, must emit a
    # well-formed word_segment stream: begin(1) always eventually closed by
    # end(3), middles(2) only between them — even when a word's char has no
    # pinyin entry and falls back to char_<cp> (the round-3 regression:
    # fallback phones hardcoded single(4), emitting begin-without-end)
    for w in sorted(words):
        if len(w) < 2:
            continue
        raw = [p.word_pos for p in g2p(w) if not p.is_punct]
        # both phones of a syllable share its mark — collapse duplicates
        seq = [wp for i, wp in enumerate(raw) if i == 0 or wp != raw[i - 1]]
        state = 0  # 0 outside, 1 inside a word
        for wp in seq:
            if state == 0:
                assert wp in (0, 1, 4), (w, raw)
                state = 1 if wp == 1 else 0
            else:
                assert wp in (2, 3), (w, raw)
                state = 0 if wp == 3 else 1
        assert state == 0, (w, raw)


def test_erhua_merge_survives_segmentation(g2p):
    # 一点儿 erhua-merges to dianr; the segmenter sees the merged item as
    # one node and must keep it a single word, never splitting the rhotic
    phones = g2p("吃一点儿")
    assert any(p.symbol.endswith("r") and p.symbol != "r" for p in phones
               if not p.is_punct)
