import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.runtime import (
    Bucketer,
    RTFMeter,
    StageTimer,
    load_tts_config,
    load_voice_config,
    serving_mesh,
    shard_batch,
)
from toolbox_for_asr_and_tts_tpu.runtime.bucketing import CompileCacheStats
from toolbox_for_asr_and_tts_tpu.ops.vad_energy import (
    audio_quality_stats,
    is_speech_energy,
)


def test_bucketer_rounds_up():
    b = Bucketer((100, 200, 400))
    assert b.bucket(1) == 100
    assert b.bucket(100) == 100
    assert b.bucket(101) == 200
    assert b.bucket(9999) == 400  # clamps


def test_bucketer_pad_batch_mesh_multiple():
    b = Bucketer.for_audio()
    xs = [np.ones(5000, np.float32), np.ones(12000, np.float32), np.ones(100, np.float32)]
    batch, lens = b.pad_batch(xs, batch_multiple=8)
    assert batch.shape == (8, 16000)
    assert list(lens[:3]) == [5000, 12000, 100]
    assert lens[3:].sum() == 0


def test_serving_mesh_shards_batch():
    mesh = serving_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    x = np.ones((8, 16), np.float32)
    y = shard_batch(mesh, x)
    assert y.sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(y), x)


def test_configs_load_from_env(monkeypatch):
    monkeypatch.setenv("VOICE_REQUIRE_WAKE", "true")
    monkeypatch.setenv("TTS_SEG_TARGET", "25")
    v = load_voice_config()
    t = load_tts_config()
    assert v.require_wake is True
    assert t.seg_target == 25
    assert v.energy_mean_threshold == 0.03
    assert t.crossfade_ms == 60


def test_stage_timer_and_rtf():
    st = StageTimer()
    with st.stage("work"):
        pass
    d = st.detailed()
    assert "work" in d["stages_ms"]
    m = RTFMeter()
    r = m.record(proc_s=0.5, audio_s=10.0, label="seg0")
    assert abs(r - 0.05) < 1e-9
    assert abs(m.overall - 0.05) < 1e-9


def test_energy_vad_reference_semantics():
    silent = np.zeros(6400, np.float32)
    assert not is_speech_energy(silent)
    loud = np.full(6400, 0.2, np.float32)
    assert is_speech_energy(loud)
    # mean passes but peak fails -> not speech (AND logic)
    mid = np.full(6400, 0.05, np.float32)
    assert not is_speech_energy(mid)


def test_audio_quality_stats():
    x = np.clip(np.linspace(-1.5, 1.5, 1000), -1, 1).astype(np.float32)
    s = audio_quality_stats(x)
    assert s["clipping_ratio"] > 0.2
    assert s["rms"] > 0


def test_compile_cache_stats():
    c = CompileCacheStats()
    assert c.record(8, 16000) is True
    assert c.record(8, 16000) is False


def test_profiling_helpers(tmp_path):
    from toolbox_for_asr_and_tts_tpu.runtime.profiling import (
        annotate, device_memory_stats, trace_to)
    import jax.numpy as jnp
    with trace_to(str(tmp_path / "tb")):
        with annotate("work"):
            jnp.ones(128).sum().block_until_ready()
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
