"""DER metric (tools/der.py) — hand-computed md-eval cases, RTTM round
trip, and the full-pipeline synthetic regression (VERDICT round-3 item #4:
a diarization quality number with a threshold)."""
import math

import pytest

from toolbox_for_asr_and_tts_tpu.tools.der import (
    Turn, der, read_rttm, synth_mixture, synthetic_eval,
    turns_from_sentences, write_rttm)


def T(spk, a, b):
    return Turn(spk, float(a), float(b))


def test_perfect_hypothesis_is_zero():
    ref = [T("A", 0, 10), T("B", 12, 20)]
    m = der(ref, ref)
    assert m["der"] == 0.0 and m["miss"] == 0.0 and m["fa"] == 0.0


def test_permutation_invariance():
    ref = [T("A", 0, 10), T("B", 12, 20)]
    hyp = [T("x9", 0, 10), T("x1", 12, 20)]
    assert der(ref, hyp)["der"] == 0.0


def test_pure_miss():
    m = der([T("A", 0, 10)], [])
    # collar removes ±0.25 around 0 and 10 → 9.5 s scored, all missed
    assert math.isclose(m["total"], 9.5, abs_tol=1e-9)
    assert math.isclose(m["miss"], 9.5, abs_tol=1e-9)
    assert math.isclose(m["der"], 1.0, abs_tol=1e-9)


def test_pure_false_alarm():
    ref = [T("A", 0, 10)]
    hyp = [T("A", 0, 10), T("A", 20, 25)]
    m = der(ref, hyp)
    # the extra 20–25 s turn is outside any ref collar → 5 s FA
    assert math.isclose(m["fa"], 5.0, abs_tol=1e-9)
    assert math.isclose(m["der"], 5.0 / 9.5, abs_tol=1e-9)


def test_confusion_two_speakers_one_hyp_label():
    ref = [T("A", 0, 10), T("B", 10, 20)]
    hyp = [T("X", 0, 10), T("X", 10, 20)]
    m = der(ref, hyp)
    # X maps to one ref speaker; the other's 9.5 scored seconds confuse
    assert math.isclose(m["confusion"], 9.5, abs_tol=1e-9)
    assert math.isclose(m["der"], 0.5, abs_tol=1e-9)


def test_collar_forgives_small_boundary_error():
    ref = [T("A", 0, 10)]
    hyp = [T("A", 0.2, 10.2)]
    assert der(ref, hyp)["der"] == 0.0


def test_overlap_counts_in_denominator():
    ref = [T("A", 0, 10), T("B", 5, 10)]
    hyp = [T("A", 0, 10)]
    m = der(ref, hyp)
    # scored: 0.25–4.75 (1 spk) + 5.25–9.75 (2 spk) → total 4.5 + 2·4.5
    assert math.isclose(m["total"], 13.5, abs_tol=1e-9)
    assert math.isclose(m["miss"], 4.5, abs_tol=1e-9)
    assert math.isclose(m["der"], 1.0 / 3.0, abs_tol=1e-9)


def test_turns_from_sentences_overlap_spk():
    class S:
        def __init__(self, spk, a, b, ov=None):
            self.spk, self.start_ms, self.end_ms = spk, a, b
            self.overlap_spk = ov

    turns = turns_from_sentences([S(0, 0, 2000), S(1, 2000, 5000, ov=[0])])
    assert T("spk0", 0, 2) in turns
    assert T("spk1", 2, 5) in turns
    assert T("spk0", 2, 5) in turns          # overlap speaker, same span
    assert len(turns) == 3


def test_rttm_round_trip(tmp_path):
    turns = [T("alice", 0.5, 3.25), T("bob", 3.0, 7.125)]
    p = str(tmp_path / "x.rttm")
    write_rttm(p, turns)
    got = read_rttm(p)
    assert sorted(got, key=lambda t: t.start) == sorted(
        turns, key=lambda t: t.start)


def test_synth_mixture_is_reproducible_and_coded():
    import numpy as np
    t1, w1 = synth_mixture(3, seed=7)
    t2, w2 = synth_mixture(3, seed=7)
    assert t1 == t2 and np.array_equal(w1, w2)
    # bitmask coding: amplitudes are multiples of 0.02, some region speaks
    mask = np.round(w1 / 0.02).astype(int)
    assert mask.max() >= 1 and (np.abs(w1 - 0.02 * mask) < 1e-6).all()


def test_full_pipeline_der_regression():
    """The real Diarizer (window-level clustering + change-split + overlap
    pass) over synthesized 2/3/4-speaker mixtures with 15% overlapped turn
    starts. Round-4 measured pooled DER 0.028 (benchmarks/RESULTS.md);
    threshold 0.08 leaves ~3× headroom while still failing on any return
    of the sentence-level regime (pooled DER 1.01)."""
    r = synthetic_eval(n_mixtures=6)
    assert r["pooled_der"] < 0.08, r


@pytest.mark.parametrize("n_spk", [2, 4])
def test_single_mixture_der_bounded(n_spk):
    from toolbox_for_asr_and_tts_tpu.asr.diarization import Diarizer
    from toolbox_for_asr_and_tts_tpu.tools.der import (
        SyntheticRecognizer, SyntheticVerifier)
    diar = Diarizer(SyntheticRecognizer(), SyntheticVerifier(),
                    punctuator=None)
    truth, wav = synth_mixture(n_spk, seed=11)
    m = der(truth, turns_from_sentences(diar.diarize(wav)))
    assert m["der"] < 0.25, m


def test_service_layer_eval():
    """VERDICT-r4 #5: synthesized mixtures through the REAL finalize path —
    concurrent StreamingASRSession.finalize() → FinalizeHub (one batched
    need_spk diarize) → group_by_speaker → verify_embedding gate — scored
    from the service's own outputs. Full run (9 target / 6 impostor,
    benchmarks/RESULTS.md): pooled DER 0.029, target accept 9/9, impostor
    reject 6/6, best-score means 0.752 vs 0.030. Engines are synthetic:
    this regresses the service-layer LOGIC, not acoustics."""
    from toolbox_for_asr_and_tts_tpu.tools.der import service_eval
    r = service_eval(n_target=4, n_impostor=2)
    assert r["pooled_der"] < 0.10, r
    assert r["sv"]["target_accept"] == "4/4", r
    assert r["sv"]["impostor_reject"] == "2/2", r
    assert r["sv"]["mean_best_score_target"] > 0.6, r
    assert r["sv"]["mean_best_score_impostor"] < 0.2, r
