"""Prosodic phrase-break prediction (tts/prosody.py, VERDICT-r3 #7):
break positions on long clauses + duration effect through the synthesizer.
Matches ttsfrd's #2/#3 phrasing role (tts-service/Dockerfile:61-64)."""
import numpy as np

from toolbox_for_asr_and_tts_tpu.tts.prosody import predict_breaks
from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P, LingVocab


def _breaks(g2p, text):
    items = g2p._resolve(text)
    return items, predict_breaks(items, g2p._word_spans(items))


def _char_positions(items, brk):
    """Map break item indices → character offsets for readable asserts."""
    out = {}
    at = 0
    for i, (ch, _) in enumerate(items):
        at += len(ch)
        if i in brk:
            out[at] = brk[i]
    return out


G = G2P()


def test_short_clauses_get_no_breaks():
    for text in ["你好", "今天天气很好", "请坐", "血压正常"]:
        _, brk = _breaks(G, text)
        assert not brk, (text, brk)


def test_long_clause_gets_breaks_before_preposition():
    text = "我们明天下午三点在人民医院门诊大厅集合"
    items, brk = _breaks(G, text)
    assert brk, "19-syllable clause must be phrased"
    pos = _char_positions(items, brk)
    # the strongest cut lands BEFORE the 在-phrase (after char 8 = 三点|在)
    assert 8 in pos and pos[8] == 3, pos


def test_coordination_kept_whole_break_at_predicate():
    """The statistical DP (round 5) keeps the 和-coordination 血压和血糖水平
    intact — published prose rarely commas inside a short coordination —
    and phrases at the subject|predicate boundary before the adverb 都
    instead (the rule-only layer used to cut 血压|和)."""
    text = "患者目前的血压和血糖水平都已经恢复到了正常范围之内"
    items, brk = _breaks(G, text)
    pos = _char_positions(items, brk)
    assert 12 in pos, pos                   # …水平 | 都已经恢复…
    assert 8 not in pos and 10 not in pos, pos   # 和-coordination unsplit


def test_no_break_after_clitic_de():
    """的/地/得 bind the following phrase — no break may follow them."""
    text = "患者目前的血压和血糖水平都已经恢复到了正常范围之内"
    items, brk = _breaks(G, text)
    for i in brk:
        assert items[i][0][-1] not in "的地得", (i, items[i])
        assert items[i + 1][0][0] not in "的地得", (i, items[i + 1])


def test_breaks_only_at_word_boundaries():
    """A break may never split a segmentation word (e.g. 医院/大厅)."""
    text = "我们明天下午三点在人民医院门诊大厅集合"
    items = G._resolve(text)
    spans = G._word_spans(items)
    brk = predict_breaks(items, spans)
    word_ends = set()
    i = 0
    while i < len(items):
        ln = max(spans[i], 1)
        word_ends.add(i + ln - 1)
        i += ln
    assert set(brk) <= word_ends, (brk, word_ends)


def test_phrase_lengths_bounded():
    """No phrase between breaks exceeds max_phrase+wordlen slack."""
    text = "这种药物每天饭后服用两次每次两片连续服用七天不能随意停药"
    items, brk = _breaks(G, text)
    sylpos = [i for i, (ch, sy) in enumerate(items) if sy is not None]
    cuts = sorted(brk) + [len(items)]
    start = 0
    for c in cuts:
        n = sum(1 for i in sylpos if start <= i <= c)
        assert n <= 13, (start, c, n)
        start = c + 1


def test_punctuation_resets_phrasing():
    """Clauses already split by punctuation below the threshold stay
    break-free."""
    text = "你好，今天天气很好，请坐，血压正常。"
    _, brk = _breaks(G, text)
    assert not brk, brk


def test_breaks_surface_as_sp_br_phones_and_ling_rows():
    text = "我们明天下午三点在人民医院门诊大厅集合"
    phones = G(text)
    syms = [p.symbol for p in phones]
    assert "#br" in syms or "#sp" in syms
    # they ride the ling stream like other specials (valid sy ids)
    vocab = LingVocab.default()
    rows = vocab.encode(phones)
    unk = vocab.to_id[vocab.UNK]
    for p, row in zip(phones, rows):
        if p.symbol in ("#sp", "#br"):
            assert row[0] != unk
            assert row[1] == 0 and row[3] == 0      # no tone, no word mark


def test_disable_flag_removes_breaks():
    g_off = G2P(phrase_breaks=False)
    text = "我们明天下午三点在人民医院门诊大厅集合"
    syms = [p.symbol for p in g_off(text)]
    assert "#sp" not in syms and "#br" not in syms


def test_breaks_lengthen_predicted_durations():
    """Duration assertion (VERDICT ask): the break rows the frontend
    inserts get REAL nonzero durations from the duration predictor, so
    total predicted frames for the clause grow. Asserted at the
    predictor level — the end wav length is quantized by the two-phase
    mel bucketing, which can mask a 2-row difference."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from toolbox_for_asr_and_tts_tpu.models import sambert

    vocab = LingVocab.default()
    cfg = sambert.SambertConfig(
        vocab_size=len(vocab), d_model=32, n_heads=2, ffn_dim=64,
        encoder_layers=1, decoder_layers=1, var_channels=32,
        postnet_channels=32, frames_per_phone=8)
    params = sambert.init_params(jax.random.PRNGKey(0), cfg)
    text = "患者目前的血压和血糖水平都已经恢复到了正常范围之内"

    def durations(g2p):
        from toolbox_for_asr_and_tts_tpu.tts.text_frontend import (
            text_to_ling_ids)
        rows = text_to_ling_ids(text, g2p, vocab)
        ids = jnp.asarray(rows)[None]
        out = sambert.forward(params, ids,
                              jnp.asarray([len(rows)]),
                              jnp.zeros((1,), jnp.int32), cfg)
        return np.asarray(out["durations"][0][: len(rows)]), rows

    dur_on, rows_on = durations(G2P())
    dur_off, rows_off = durations(G2P(phrase_breaks=False))
    assert len(rows_on) > len(rows_off)            # breaks inserted
    # every break row carries at least one frame (an audible pause slot);
    # total-sum comparison across different row sequences is NOT a valid
    # invariant under random weights (neighboring rows' predictions move)
    phones = G2P()(text)
    br_rows = [i for i, p in enumerate(phones) if p.symbol in ("#sp", "#br")]
    assert br_rows and all(dur_on[i] >= 1 for i in br_rows)
    assert sum(int(dur_on[i]) for i in br_rows) > 0
