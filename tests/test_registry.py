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
