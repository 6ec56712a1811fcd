import os

from toolbox_for_asr_and_tts_tpu.runtime.registry import MODELS, resolve


def test_resolve_prefers_model_root(tmp_path):
    name = MODELS["sv"].name
    d = tmp_path / name
    d.mkdir()
    assert resolve("sv", str(tmp_path)) == str(d)


def test_resolve_missing_returns_none(tmp_path):
    assert resolve("kws", str(tmp_path)) is None


def test_all_keys_have_specs():
    for key, spec in MODELS.items():
        assert spec.name and spec.modelscope_id


def test_warmup_tool():
    from toolbox_for_asr_and_tts_tpu.service.engines import build_test_engines
    from toolbox_for_asr_and_tts_tpu.tools.warmup import warmup_asr
    engines = build_test_engines()
    report = warmup_asr(engines, seconds=[1.0])
    assert "asr_1.0s_b1" in report
