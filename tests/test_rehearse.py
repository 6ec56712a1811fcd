"""`cli rehearse <models_dir>` — the real-checkpoint mount rehearsal
(VERDICT round-2 #6): strict per-family conversion coverage, both services
booted on the converted weights, golden inputs through REST + WS + TTS, and
a JSON report artifact. Runs here against a synthetic model zoo laid out
exactly like the reference's mounted tree (voice_interface.py:593-618)."""
import json
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime.registry import MODELS  # noqa: E402


def _save_pt(sd, path):
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


@pytest.fixture(scope="module")
def zoo(tmp_path_factory):
    """Synthetic ModelScope tree: every registry family at tiny geometry,
    each dir carrying its own config.yaml (+tokens) like a real package."""
    root = tmp_path_factory.mktemp("modelzoo")

    from toolbox_for_asr_and_tts_tpu.models import (campplus, ct_transformer,
                                                    fsmn_vad, hifigan,
                                                    kws_ctc, paraformer,
                                                    sambert)

    # --- paraformer offline + online (same pytree family)
    pconf = {"encoder_conf": {"output_size": 32, "attention_heads": 2,
                              "linear_units": 64, "num_blocks": 2,
                              "kernel_size": 11},
             "decoder_conf": {"num_blocks": 1},
             "frontend_conf": {"n_mels": 80, "lfr_m": 7, "lfr_n": 6}}
    pcfg = paraformer.ParaformerConfig.from_funasr(pconf, vocab_size=32)
    p_sd = ckpt.invert_to_state_dict(
        paraformer.init_params(jax.random.PRNGKey(0), pcfg),
        ckpt.paraformer_rules(pcfg.encoder_layers, pcfg.decoder_layers))
    toks = ["<blank>", "<s>", "</s>"] + [chr(0x4E00 + i) for i in range(29)]
    for key in ("paraformer_offline", "paraformer_streaming"):
        d = root / MODELS[key].name
        d.mkdir()
        (d / "config.yaml").write_text(yaml.safe_dump(pconf),
                                       encoding="utf-8")
        (d / "tokens.txt").write_text("\n".join(toks), encoding="utf-8")
        _save_pt(p_sd, d / "model.pt")

    # --- fsmn_vad
    vconf = {"encoder_conf": {"input_dim": 400, "input_affine_dim": 20,
                              "linear_dim": 24, "proj_dim": 8,
                              "fsmn_layers": 2, "lorder": 5, "rorder": 0,
                              "output_affine_dim": 20, "output_dim": 6}}
    vcfg = fsmn_vad.FsmnVadConfig.from_funasr(vconf)
    d = root / MODELS["fsmn_vad"].name
    d.mkdir()
    (d / "config.yaml").write_text(yaml.safe_dump(vconf), encoding="utf-8")
    _save_pt(ckpt.invert_to_state_dict(
        fsmn_vad.init_params(jax.random.PRNGKey(1), vcfg),
        ckpt.fsmn_vad_rules(vcfg.fsmn_layers)), d / "model.pt")

    # --- sv (full default CAM++ geometry; loader has no config pinning)
    scfg = campplus.CampPlusConfig()
    d = root / MODELS["sv"].name
    d.mkdir()
    _save_pt(ckpt.invert_to_state_dict(
        campplus.init_params(jax.random.PRNGKey(2), scfg),
        ckpt.campplus_rules(scfg.block_layers)), d / "model.pt")

    # --- punc
    cconf = {"encoder_conf": {"attention_heads": 2, "linear_units": 64,
                              "num_blocks": 2, "output_size": 32,
                              "input_size": 16},
             "model_conf": {"punc_list": ["<unk>", "_", "，", "。", "？",
                                          "、"],
                            "vocab_size": 40}}
    ccfg = ct_transformer.CTTransformerConfig.from_funasr(cconf)
    d = root / MODELS["punc"].name
    d.mkdir()
    (d / "config.yaml").write_text(yaml.safe_dump(cconf), encoding="utf-8")
    (d / "tokens.json").write_text(json.dumps(
        ["<unk>"] + [chr(0x4E00 + i) for i in range(39)]), encoding="utf-8")
    _save_pt(ckpt.invert_to_state_dict(
        ct_transformer.init_params(jax.random.PRNGKey(3), ccfg),
        ckpt.ct_transformer_rules(ccfg.num_layers)), d / "model.pt")

    # --- kws
    kconf = {"encoder_conf": {"input_dim": 120, "linear_dim": 32,
                              "proj_dim": 16, "fsmn_layers": 2, "lorder": 5,
                              "rorder": 2, "output_dim": 32}}
    kcfg = kws_ctc.KwsConfig.from_funasr(kconf)
    d = root / MODELS["kws"].name
    d.mkdir()
    (d / "config.yaml").write_text(yaml.safe_dump(kconf), encoding="utf-8")
    (d / "tokens.txt").write_text(
        "\n".join(["<blank>", "小", "护"]
                  + [chr(0x4E00 + i) for i in range(29)]), encoding="utf-8")
    _save_pt(ckpt.invert_to_state_dict(
        kws_ctc.init_params(jax.random.PRNGKey(4), kcfg),
        ckpt.kws_rules(kcfg.num_layers, kcfg.rorder)), d / "model.pt")

    # --- tts package (KAN-TTS layout)
    acfg = sambert.SambertConfig(
        vocab_size=32, n_speakers=4, d_model=16, n_heads=2, ffn_dim=32,
        encoder_layers=2, decoder_layers=1, pnca_layers=2, postnet_layers=2,
        var_channels=16, prenet_units=12, outputs_per_step=3, n_mels=8,
        frames_per_phone=4)
    vocfg = hifigan.HifiGanConfig(
        n_mels=8, upsample_initial_channel=16, upsample_rates=(2, 2),
        upsample_kernels=(4, 4), resblock_kernels=(3,),
        resblock_dilations=((1, 2),))
    pkg = root / MODELS["tts"].name
    am_sd = ckpt.invert_to_state_dict(
        sambert.init_params(jax.random.PRNGKey(5), acfg),
        ckpt.sambert_rules(acfg.encoder_layers, acfg.pnca_layers,
                           acfg.postnet_layers))
    voc_sd = {}
    for k, v in ckpt.invert_to_state_dict(
            hifigan.init_params(jax.random.PRNGKey(6), vocfg),
            ckpt.hifigan_rules(len(vocfg.upsample_rates),
                               len(vocfg.resblock_kernels),
                               len(vocfg.resblock_dilations[0]))).items():
        if k.endswith(".weight") and np.ndim(v) >= 2:
            v = np.asarray(v, np.float32)
            axes = tuple(range(1, v.ndim))
            g = np.sqrt((v * v).sum(axis=axes, keepdims=True))
            voc_sd[k[:-len(".weight")] + ".weight_g"] = g
            voc_sd[k[:-len(".weight")] + ".weight_v"] = v
        else:
            voc_sd[k] = v
    am_dir = pkg / "voices" / "zhitian_emo" / "am" / "ckpt"
    voc_dir = pkg / "voices" / "zhitian_emo" / "voc" / "ckpt"
    _save_pt(am_sd, am_dir / "checkpoint_2400000.pth")
    _save_pt(voc_sd, voc_dir / "checkpoint_2400000.pth")
    import dataclasses as dc
    (am_dir.parent / "config.yaml").write_text(yaml.safe_dump(
        {"Model": {"KanTtsSAMBERT": {"params": dc.asdict(acfg)}}}),
        encoding="utf-8")
    (voc_dir.parent / "config.yaml").write_text(yaml.safe_dump(
        {"Model": {"Generator": {"params": {
            "upsample_rates": list(vocfg.upsample_rates),
            "upsample_kernel_sizes": list(vocfg.upsample_kernels),
            "upsample_initial_channel": vocfg.upsample_initial_channel,
            "resblock_kernel_sizes": list(vocfg.resblock_kernels),
            "resblock_dilation_sizes": [list(x) for x in
                                        vocfg.resblock_dilations],
            "num_mels": vocfg.n_mels}}}}), encoding="utf-8")
    return root


def test_rehearse_green_on_synthetic_zoo(zoo, monkeypatch, capsys):
    from toolbox_for_asr_and_tts_tpu.tools import rehearse as R
    monkeypatch.setenv("VOICE_DISABLE_LLM", "1")
    report = R.rehearse(str(zoo), serve=True)
    fams = report["families"]
    for key in ("paraformer_offline", "paraformer_streaming", "fsmn_vad",
                "sv", "punc", "kws", "tts"):
        assert fams[key]["status"] in ("converted", "cached"), fams[key]
        assert not fams[key].get("missing"), (key, fams[key]["missing"][:5])
        assert not fams[key].get("unmapped"), (key, fams[key]["unmapped"][:5])
    assert report["service"]["rest_asr"]["success"] is True
    assert report["service"]["ws_asr"]["ok"] is True
    assert "result" in report["service"]["ws_asr"]["frames"]
    assert report["service"]["tts"]["status"] == "completed"
    assert report["ok"], report["strict_failures"]


def test_rehearse_strict_fails_on_renamed_key(zoo, tmp_path, monkeypatch):
    """A deliberately renamed tensor must fail loudly with the bad family
    and the missing/unmapped names in the report."""
    import shutil

    from toolbox_for_asr_and_tts_tpu.tools import rehearse as R
    broken = tmp_path / "broken_zoo"
    shutil.copytree(zoo, broken)
    d = broken / MODELS["kws"].name
    sd = torch.load(d / "model.pt", weights_only=True)
    key = sorted(sd)[0]
    sd["totally_wrong_name"] = sd.pop(key)
    torch.save(sd, d / "model.pt")
    (d / "jax_params.npz").unlink(missing_ok=True)

    report = R.rehearse(str(broken), serve=False, reconvert=True)
    assert not report["ok"]
    assert "kws" in report["strict_failures"]
    entry = report["families"]["kws"]
    assert entry["status"] == "failed"
    assert key in entry.get("missing", [])
    assert "totally_wrong_name" in entry.get("unmapped", [])


def test_rehearse_cli_exit_codes(zoo, monkeypatch, capsys):
    from toolbox_for_asr_and_tts_tpu.tools import rehearse as R
    R.main([str(zoo), "--no-serve", "--report",
            str(zoo / "rehearsal_report.json")])
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert (zoo / "rehearsal_report.json").exists()
    assert report["ok"] is True
