"""Synthesizer.from_model_dir: load a mounted sambert-hifigan package.

Builds a synthetic KAN-TTS-layout package (voices/<voice>/{am,voc}/ckpt/
checkpoint_*.pth + config.yaml) from tiny models via the converter's invert
mode, then checks the loader end-to-end: layout scan, config autoload,
state-dict shape pinning (shapes beat a lying config), weight-norm folding,
npz caching, and a real synthesis pass on the converted weights.
Reference: tts-service/app/services/tts_service.py:34-38,143-177 (local-dir
pipeline load).
"""
import dataclasses
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

from toolbox_for_asr_and_tts_tpu.models import hifigan, sambert  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402
from toolbox_for_asr_and_tts_tpu.tts.synthesizer import (  # noqa: E402
    Synthesizer, scan_tts_package)

ACFG = sambert.SambertConfig(
    vocab_size=32, n_speakers=2, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=2, decoder_layers=1, pnca_layers=2, postnet_layers=2,
    var_channels=16, prenet_units=12, outputs_per_step=3, n_mels=8,
    frames_per_phone=4)
VCFG = hifigan.HifiGanConfig(
    n_mels=8, upsample_initial_channel=16, upsample_rates=(2, 2),
    upsample_kernels=(4, 4), resblock_kernels=(3,),
    resblock_dilations=((1, 2),))


def _weight_normed(sd):
    out = {}
    for k, v in sd.items():
        if k.endswith(".weight") and np.ndim(v) >= 2:
            v = np.asarray(v, np.float32)
            axes = tuple(range(1, v.ndim))
            g = np.sqrt((v * v).sum(axis=axes, keepdims=True))
            out[k[:-len(".weight")] + ".weight_g"] = g
            out[k[:-len(".weight")] + ".weight_v"] = v
        else:
            out[k] = v
    return out


def _save(sd, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)


@pytest.fixture()
def package(tmp_path):
    """Synthetic speech_sambert-hifigan package with the KAN-TTS layout."""
    root = tmp_path / "speech_sambert-hifigan_tts_zh-cn_16k"
    am_params = sambert.init_params(jax.random.PRNGKey(7), ACFG)
    am_rules = ckpt.sambert_rules(ACFG.encoder_layers, ACFG.pnca_layers,
                                  ACFG.postnet_layers)
    _save(ckpt.invert_to_state_dict(am_params, am_rules),
          str(root / "voices/zhitian_emo/am/ckpt/checkpoint_2400000.pth"))
    # the am config deliberately LIES about embedding_dim (999): the loader
    # must pin shape-derivable fields from the state dict, keeping only
    # n_heads (not derivable from shapes) from the config
    (root / "voices/zhitian_emo/am/config.yaml").write_text(yaml.safe_dump({
        "Model": {"KanTtsSAMBERT": {"params": {
            "embedding_dim": 999, "encoder_num_heads": ACFG.n_heads,
            "outputs_per_step": ACFG.outputs_per_step,
            "decoder_prenet_units": [64, ACFG.prenet_units],
        }}}}), encoding="utf-8")

    voc_params = hifigan.init_params(jax.random.PRNGKey(8), VCFG)
    voc_rules = ckpt.hifigan_rules(len(VCFG.upsample_rates),
                                   len(VCFG.resblock_kernels),
                                   len(VCFG.resblock_dilations[0]))
    _save(_weight_normed(ckpt.invert_to_state_dict(voc_params, voc_rules)),
          str(root / "voices/zhitian_emo/voc/ckpt/checkpoint_2400000.pth"))
    (root / "voices/zhitian_emo/voc/config.yaml").write_text(yaml.safe_dump({
        "Model": {"Generator": {"params": {
            "upsample_rates": list(VCFG.upsample_rates),
            "resblock_dilation_sizes": [list(d)
                                        for d in VCFG.resblock_dilations],
        }}}}), encoding="utf-8")
    return str(root), am_params, voc_params


def test_scan_prefers_voice_and_latest_step(package, tmp_path):
    root, _, _ = package
    # decoys: an older checkpoint and another voice
    _save({"x": np.zeros(1, np.float32)},
          os.path.join(root, "voices/zhitian_emo/am/ckpt/checkpoint_100.pth"))
    _save({"x": np.zeros(1, np.float32)},
          os.path.join(root, "voices/zhibei_emo/am/ckpt/checkpoint_999999999.pth"))
    am, voc = scan_tts_package(root, "zhitian_emo")
    assert am.endswith("zhitian_emo/am/ckpt/checkpoint_2400000.pth")
    assert voc.endswith("zhitian_emo/voc/ckpt/checkpoint_2400000.pth")


def test_from_model_dir_loads_converts_and_synthesizes(package, monkeypatch):
    monkeypatch.delenv("TTS_DECODER", raising=False)
    root, am_params, voc_params = package
    synth = Synthesizer.from_model_dir(root)
    # geometry: shape-pinned from the state dict, NOT the lying config
    assert synth.acfg.d_model == ACFG.d_model
    assert synth.acfg.vocab_size == ACFG.vocab_size
    assert synth.acfg.n_heads == ACFG.n_heads          # config-only field
    assert synth.acfg.prenet_units == ACFG.prenet_units
    assert synth.acfg.outputs_per_step == ACFG.outputs_per_step
    assert (synth.acfg.encoder_layers, synth.acfg.pnca_layers,
            synth.acfg.postnet_layers) == (2, 2, 2)
    assert synth.vcfg == VCFG
    assert synth.decoder_mode == "pnca"
    # weights: converted == source (spot-check one tensor per model,
    # including a weight-norm folded vocoder conv)
    np.testing.assert_allclose(np.asarray(synth.ap["ling"]["sy"]["table"]),
                               np.asarray(am_params["ling"]["sy"]["table"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(synth.vp["conv_pre"]["w"]),
                               np.asarray(voc_params["conv_pre"]["w"]),
                               atol=1e-5)
    # conversion cache written next to each checkpoint
    am, voc = scan_tts_package(root, "zhitian_emo")
    assert os.path.exists(am + ".jax.npz") and os.path.exists(voc + ".jax.npz")
    # synthesis runs on the converted weights
    wavs, durs = synth.synthesize_segments(["你好"], "zhitian_emo")
    assert wavs[0].ndim == 1 and len(wavs[0]) > 0 and durs[0] > 0


def test_from_model_dir_cache_roundtrip(package, monkeypatch):
    monkeypatch.delenv("TTS_DECODER", raising=False)
    root, _, _ = package
    first = Synthesizer.from_model_dir(root)
    # second load must come from the npz cache (delete the torch ckpts)
    am, voc = scan_tts_package(root, "zhitian_emo")
    os.unlink(am)
    os.unlink(voc)
    again = Synthesizer.from_model_dir(root)
    assert dataclasses.asdict(again.acfg) == dataclasses.asdict(first.acfg)
    np.testing.assert_array_equal(np.asarray(again.ap["ling"]["sy"]["table"]),
                                  np.asarray(first.ap["ling"]["sy"]["table"]))
    np.testing.assert_array_equal(np.asarray(again.vp["conv_pre"]["w"]),
                                  np.asarray(first.vp["conv_pre"]["w"]))


def test_from_model_dir_requires_both_checkpoints(tmp_path):
    with pytest.raises(FileNotFoundError):
        Synthesizer.from_model_dir(str(tmp_path))


def test_tts_service_serves_mounted_package(package, monkeypatch):
    """The SERVICE loads a mounted package (registry key 'tts') and serves a
    job through the converted weights — closing the round-1 gap where
    tts_app only ever built Synthesizer.random."""
    import threading
    import time

    import httpx

    from toolbox_for_asr_and_tts_tpu.runtime import registry
    from toolbox_for_asr_and_tts_tpu.service import tts_app

    root, _, _ = package
    monkeypatch.delenv("TTS_DECODER", raising=False)
    monkeypatch.setattr(registry, "resolve",
                        lambda key, model_root=None:
                        root if key == "tts" else None)
    calls = []
    orig = Synthesizer.from_model_dir.__func__
    monkeypatch.setattr(
        Synthesizer, "from_model_dir",
        classmethod(lambda cls, d, **kw:
                    calls.append(d) or orig(cls, d, **kw)))

    import asyncio
    app = tts_app.create_app()  # synthesizer=None → registry path
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0))
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(200):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)
    base = f"http://127.0.0.1:{app.port}"
    r = httpx.post(f"{base}/api/v1/tts/start",
                   json={"text": "你好", "voice": "zhitian_emo"})
    assert r.status_code == 200, r.text
    job_id = r.json()["job_id"]
    body = {}
    for _ in range(300):
        body = httpx.get(f"{base}/api/v1/tts/result/{job_id}").json()
        if body.get("status") in ("completed", "error"):
            break
        time.sleep(0.1)
    loop.call_soon_threadsafe(loop.stop)
    assert body.get("status") == "completed", body
    assert calls == [root]  # served from the mounted package, not random
