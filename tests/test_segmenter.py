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


def test_dp_beats_greedy_on_overlap(words):
    # greedy longest-match commits to 研究生 and strands 命; the DP pass
    # scores whole segmentations so 研究/生命 wins
    assert _seg("研究生命很重要", words)[:2] == ["研究", "生命"]


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


def test_erhua_merge_survives_segmentation(g2p):
    # 一点儿 erhua-merges to dianr; the segmenter sees the merged item as
    # one node and must keep it a single word, never splitting the rhotic
    phones = g2p("吃一点儿")
    assert any(p.symbol.endswith("r") and p.symbol != "r" for p in phones
               if not p.is_punct)
