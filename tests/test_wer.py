import pytest

from toolbox_for_asr_and_tts_tpu.tools.wer import (
    cer,
    corpus_cer,
    edit_distance,
    normalize_zh,
)


def test_edit_distance_ops():
    dist, ops = edit_distance(list("abc"), list("axc"))
    assert dist == 1 and ops["sub"] == 1
    dist, ops = edit_distance(list("abc"), list("ab"))
    assert dist == 1 and ops["del"] == 1
    dist, ops = edit_distance(list("abc"), list("abcd"))
    assert dist == 1 and ops["ins"] == 1
    assert edit_distance([], list("ab"))[0] == 2


def test_normalize_zh():
    assert normalize_zh("你好，world。") == ["你", "好", "world"]
    assert normalize_zh("血压120高") == ["血", "压", "120", "高"]


def test_cer():
    assert cer("你好世界", "你好世界") == 0.0
    assert cer("你好世界", "你坏世界") == 0.25
    assert cer("你好。", "你好") == 0.0  # punctuation ignored
    assert cer("", "") == 0.0


def test_corpus_cer():
    stats = corpus_cer([("你好", "你好"), ("四字成语", "四字成句")])
    assert stats["n"] == 2
    assert stats["exact_match"] == 0.5
    assert abs(stats["cer"] - 1 / 6) < 1e-9


def test_mel_distance():
    import numpy as np
    pytest.importorskip("jax")
    from toolbox_for_asr_and_tts_tpu.tools.mel_distance import mel_distance
    t = np.arange(16000) / 16000
    a = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    b = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    same = mel_distance(a, a.copy())
    diff = mel_distance(a, b)
    assert same["rmse_db"] < 1e-4
    assert same["corr"] > 0.999
    assert diff["rmse_db"] > same["rmse_db"] + 1.0
