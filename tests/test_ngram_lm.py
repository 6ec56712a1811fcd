import math

import numpy as np
import pytest

from toolbox_for_asr_and_tts_tpu.asr.ngram_lm import ArpaLM, lm_rescore

ARPA = """\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.5\t心\t-0.3
-0.5\t衰\t-0.3
-1.5\t哀\t-0.3
-0.9\t好\t-0.3

\\2-grams:
-0.1\t心 衰
-2.0\t心 哀
-0.5\t衰 好

\\end\\
"""


@pytest.fixture()
def lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA, encoding="utf-8")
    return ArpaLM.load(str(p))


def test_arpa_load_and_score(lm):
    assert lm.order == 2
    # bigram hit: P(衰|心) = 10^-0.1
    assert abs(lm.score(["心"], "衰") - (-0.1 * math.log(10))) < 1e-6
    # bigram present but low: 心→哀
    assert lm.score(["心"], "哀") < lm.score(["心"], "衰")
    # unseen word falls to floor
    assert lm.score([], "无") < -10


def test_lm_rescore_fixes_weak_choice(lm):
    # vocabulary: 0:心 1:衰 2:哀 3:好
    id_to_token = ["心", "衰", "哀", "好"]
    # acoustics slightly prefer 哀 over 衰 at position 1, LM strongly
    # prefers 心→衰
    logprobs = np.array([
        [-0.1, -5.0, -5.0, -5.0],
        [-5.0, -1.2, -1.0, -5.0],   # 哀 barely beats 衰 acoustically
        [-5.0, -5.0, -5.0, -0.1],
    ])
    greedy = list(np.argmax(logprobs, axis=-1))
    assert greedy[1] == 2  # acoustic pick is 哀
    fused = lm_rescore(greedy, logprobs, lm, id_to_token, lm_weight=0.5)
    assert fused[1] == 1  # LM flips to 衰
    assert fused[0] == 0 and fused[2] == 3


def test_lm_rescore_keeps_confident(lm):
    id_to_token = ["心", "衰", "哀", "好"]
    logprobs = np.array([
        [-0.1, -9.0, -9.0, -9.0],
        [-9.0, -9.0, -0.1, -9.0],   # 哀 overwhelmingly confident
    ])
    fused = lm_rescore([0, 2], logprobs, lm, id_to_token, lm_weight=0.3)
    assert fused == [0, 2]


def test_lm_rescore_empty(lm):
    assert lm_rescore([], np.zeros((0, 4)), lm, ["a"] * 4) == []
