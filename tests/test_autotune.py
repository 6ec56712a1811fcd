"""Dispatch-profile autotuning (runtime/autotune.py, VERDICT round-2 #9):
the RTT probe picks tunnel vs local knob sets, env always wins, and both
profiles drive the synthesizer's dispatch paths."""
import numpy as np
import pytest

from toolbox_for_asr_and_tts_tpu.runtime import autotune as at


@pytest.fixture(autouse=True)
def fresh_profile(monkeypatch):
    at._cache.clear()
    yield
    at._cache.clear()


def test_probe_measures_and_classifies(monkeypatch):
    rtt = at.measure_rtt_ms(iters=3)
    assert rtt > 0
    prof = at.get_profile()
    assert prof["name"] in ("tunnel", "local")
    # CPU backend dispatch is sub-ms → local on the test host
    assert prof["name"] == ("local" if rtt < at.TUNNEL_RTT_MS else "tunnel")


def test_profile_knob_sets_differ():
    t, l = at.profile_knobs("tunnel"), at.profile_knobs("local")
    for k in ("tts_mel_group", "tts_group_by_length", "pallas_framing"):
        assert t[k] is False and l[k] is True
    # hub row count follows the dispatch cost (capacity sweep, RESULTS.md)
    assert t["batch_capacity"] == 16 and l["batch_capacity"] == 128


def test_env_beats_profile_int(monkeypatch):
    monkeypatch.setenv("TOOLBOX_DISPATCH_PROFILE", "local")
    at.get_profile(refresh=True)
    assert at.env_or_profile_int("VOICE_BATCH_CAPACITY",
                                 "batch_capacity") == 128
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "7")
    assert at.env_or_profile_int("VOICE_BATCH_CAPACITY",
                                 "batch_capacity") == 7


def test_test_engines_pin_small_capacity(monkeypatch):
    # CPU test hosts probe as "local" (sub-ms dispatch) — the 128-row
    # production capacity must NOT leak into test engines
    from toolbox_for_asr_and_tts_tpu.service.engines import _batch_capacity
    monkeypatch.delenv("VOICE_BATCH_CAPACITY", raising=False)
    monkeypatch.setenv("TOOLBOX_DISPATCH_PROFILE", "local")
    at.get_profile(refresh=True)
    assert _batch_capacity(16) == 16      # caller default wins over profile
    assert _batch_capacity() == 128       # profile applies without one
    monkeypatch.setenv("VOICE_BATCH_CAPACITY", "5")
    assert _batch_capacity(16) == 5       # env beats everything


def test_env_beats_profile(monkeypatch):
    monkeypatch.setenv("TOOLBOX_DISPATCH_PROFILE", "local")
    assert at.get_profile(refresh=True)["tts_mel_group"] is True
    monkeypatch.setenv("TTS_MEL_GROUP", "0")
    assert at.env_or_profile("TTS_MEL_GROUP", "tts_mel_group") is False
    monkeypatch.delenv("TTS_MEL_GROUP")
    assert at.env_or_profile("TTS_MEL_GROUP", "tts_mel_group") is True


def test_forced_profile_skips_probe(monkeypatch):
    monkeypatch.setenv("TOOLBOX_DISPATCH_PROFILE", "tunnel")
    monkeypatch.setattr(at, "measure_rtt_ms",
                        lambda *a, **k: pytest.fail("probe ran"))
    assert at.get_profile(refresh=True)["name"] == "tunnel"


@pytest.mark.parametrize("profile", ["tunnel", "local"])
def test_synthesizer_runs_under_both_profiles(profile, monkeypatch):
    monkeypatch.setenv("TOOLBOX_DISPATCH_PROFILE", profile)
    at._cache.clear()
    from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer
    synth = Synthesizer.random(tiny=True)
    assert synth.mel_group is (profile == "local")
    assert synth.group_by_length is (profile == "local")
    wavs, durs = synth.synthesize_segments(["你好，小护", "今天天气不错"],
                                           "zhitian_emo")
    assert all(w is not None and w.ndim == 1 and len(w) > 0 for w in wavs)
    assert all(d > 0 for d in durs)


def test_cpu_platform_keeps_conservative_knobs(monkeypatch):
    # a CPU host probes sub-ms dispatch ("local") but must not inherit the
    # TPU-measured aggressive knobs (128-row hubs, Pallas framing)
    monkeypatch.delenv("TOOLBOX_DISPATCH_PROFILE", raising=False)
    prof = at.get_profile(refresh=True)
    assert prof["platform"] == "cpu"      # tests force the CPU backend
    assert prof["batch_capacity"] == 16
    assert prof["pallas_framing"] is False
    # the TPU knob set is still reachable by explicit override
    assert at.profile_knobs("local", "tpu")["batch_capacity"] == 128


def test_probe_failure_falls_back_to_tunnel(monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("no device")

    monkeypatch.setattr(at, "measure_rtt_ms", boom)
    prof = at.get_profile(refresh=True)
    assert prof["name"] == "tunnel"        # fewest-round-trips is safe
    assert prof["tts_mel_group"] is False
