import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.tokenizer import CharTokenizer, join_tokens  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.hotwords import (  # noqa: E402
    banned_words,
    hotwords_json,
    load_hotwords_from_file,
    normalize_hotwords,
    positive_hotword_list,
)
from toolbox_for_asr_and_tts_tpu.models.paraformer import ParaformerConfig  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models import paraformer, fsmn_vad  # noqa: E402

TINY = ParaformerConfig(
    input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
    encoder_layers=2, decoder_layers=2, vocab_size=64,
)


@pytest.fixture(scope="module")
def reco():
    return Recognizer.random(TINY, use_mesh=False)


def _wav(secs, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    return (0.3 * np.sin(2 * np.pi * 300 * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def test_transcribe_returns_results(reco):
    res = reco.transcribe([_wav(1.0), _wav(2.0, seed=1)])
    assert len(res) == 2
    for r in res:
        assert isinstance(r.text, str)
        assert len(r.token_ids) == len(r.timestamps_ms)
        assert r.rtf is not None and r.rtf > 0
    assert res[0].audio_s == pytest.approx(1.0, abs=0.01)


def test_bucketing_reuses_compiled(reco):
    reco.transcribe([_wav(0.9)])
    n = len(reco._compiled)
    reco.transcribe([_wav(0.95)])  # same 1 s bucket
    assert len(reco._compiled) == n


def test_deterministic(reco):
    a = reco.transcribe([_wav(1.0)])[0]
    b = reco.transcribe([_wav(1.0)])[0]
    assert a.token_ids == b.token_ids


def test_transcribe_file_roundtrip(tmp_path, reco):
    from toolbox_for_asr_and_tts_tpu.utils.audio import write_wav
    p = str(tmp_path / "x.wav")
    write_wav(p, _wav(1.0), 16000)
    r = reco.transcribe_file(p)
    assert isinstance(r.text, str)


# ------------------------------------------------------------ tokenizer
def test_join_tokens_rules():
    assert join_tokens(["你", "好"]) == "你好"
    assert join_tokens(["hello", "world"]) == "hello world"
    assert join_tokens(["he@@", "llo", "你", "好", "ok"]) == "hello你好ok"


def test_dummy_tokenizer_strips_specials():
    tok = CharTokenizer.dummy(16)
    text = tok.ids_to_text([0, 1, 2, 4, 5])
    assert len(text) == 2


# ------------------------------------------------------------- hotwords
def test_hotwords_file_parsing(tmp_path):
    f = tmp_path / "hw.txt"
    f.write_text("# comment\n心衰\n高血压 30\n废话 -10\n", encoding="utf-8")
    hw = load_hotwords_from_file(str(f))
    assert hw == {"心衰": 20, "高血压": 30, "废话": -10}
    assert positive_hotword_list(hw) == ["心衰", "高血压"]
    assert banned_words(hw) == ["废话"]
    j = hotwords_json(hw)
    assert "心衰" in j


def test_hotwords_normalize_forms():
    assert normalize_hotwords(["a", "b"]) == {"a": 20, "b": 20}
    assert normalize_hotwords('{"x": 5}') == {"x": 5}
    assert normalize_hotwords("a b") == {"a": 20, "b": 20}
    assert normalize_hotwords(None) == {}


# -------------------------------------------------- checkpoint round-trip
def test_paraformer_state_dict_roundtrip():
    params = paraformer.init_params(jax.random.PRNGKey(1), TINY)
    rules = ckpt.paraformer_rules(TINY.encoder_layers, TINY.decoder_layers)
    sd = ckpt.invert_to_state_dict(params, rules)
    assert "encoder.encoders0.0.self_attn.linear_q_k_v.weight" in sd
    assert "decoder.output_layer.weight" in sd
    restored = ckpt.convert_state_dict(sd, rules, params)
    orig = ckpt.flatten_params(params)
    back = ckpt.flatten_params(restored)
    assert set(orig) == set(back)
    for k in orig:
        np.testing.assert_array_equal(np.asarray(orig[k]), back[k], err_msg=k)


def test_fsmn_vad_state_dict_roundtrip():
    cfg = fsmn_vad.FsmnVadConfig()
    params = fsmn_vad.init_params(jax.random.PRNGKey(2), cfg)
    rules = ckpt.fsmn_vad_rules(cfg.fsmn_layers)
    sd = ckpt.invert_to_state_dict(params, rules)
    assert "encoder.fsmn.0.1.conv_left.weight" in sd
    assert sd["encoder.fsmn.0.1.conv_left.weight"].shape == (128, 1, 20, 1)
    restored = ckpt.convert_state_dict(sd, rules, params)
    for k, v in ckpt.flatten_params(restored).items():
        np.testing.assert_array_equal(ckpt.flatten_params(params)[k], v)


def test_cmvn_parse(tmp_path):
    p = tmp_path / "am.mvn"
    p.write_text(
        "<Nnet>\n<Splice> 560 560\n[ 0 ]\n<AddShift> 3 3\n<LearnRateCoef> 0 "
        "[ -1.5 -2.5 -3.5 ]\n<Rescale> 3 3\n<LearnRateCoef> 0 [ 0.5 0.25 0.125 ]\n</Nnet>\n")
    means, istd = ckpt.parse_kaldi_cmvn(str(p))
    np.testing.assert_allclose(means, [-1.5, -2.5, -3.5])
    np.testing.assert_allclose(istd, [0.5, 0.25, 0.125])


def test_recognizer_on_mesh():
    """use_mesh=True shards the batch over the 8-device CPU mesh and pads
    the batch to a mesh multiple."""
    reco = Recognizer.random(TINY, use_mesh=True)
    res = reco.transcribe([_wav(1.0), _wav(1.0, seed=9), _wav(0.5, seed=3)])
    assert len(res) == 3
    local = Recognizer.random(TINY, use_mesh=False)
    res_local = local.transcribe([_wav(1.0)])
    assert res[0].token_ids == res_local[0].token_ids  # same weights/seed


def test_timestamp_spans_are_sane(reco):
    """FunASR-style [start_ms, end_ms] spans: non-negative, start < end,
    non-overlapping and ordered."""
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    r = reco.transcribe([wav])[0]
    if not r.timestamp:
        return
    prev_end = -1
    for (s, e), c in zip(r.timestamp, r.timestamps_ms):
        assert 0 <= s < e, (s, e)
        assert s <= c <= e, (s, c, e)       # center inside its span
        assert s >= prev_end - 60, (s, prev_end)  # ≤1-frame overlap
        prev_end = e
