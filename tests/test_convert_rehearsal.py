"""End-to-end conversion rehearsal through the REAL CLI for every family:
synthetic torch checkpoint dir → `convert_checkpoint --family X --diff
--config-json` → npz cache + zero unmapped tensors + exact round-trip.
Round-3 readiness: when real checkpoints get mounted, this exact command is
the workflow."""
import json
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402
from toolbox_for_asr_and_tts_tpu.tools import convert_checkpoint as cc  # noqa: E402

TINY = {
    "paraformer": {"input_dim": 24, "d_model": 16, "n_heads": 2,
                   "ffn_dim": 32, "encoder_layers": 2, "decoder_layers": 1,
                   "vocab_size": 32},
    "fsmn_vad": {"input_dim": 20, "input_affine_dim": 12, "linear_dim": 16,
                 "proj_dim": 8, "fsmn_layers": 2, "lorder": 5,
                 "output_affine_dim": 12, "output_dim": 6},
    "sambert": {"vocab_size": 32, "n_speakers": 2, "d_model": 16,
                "n_heads": 2, "ffn_dim": 32, "encoder_layers": 2,
                "decoder_layers": 1, "pnca_layers": 2, "postnet_layers": 2,
                "var_channels": 16},
    "hifigan": {"n_mels": 8, "upsample_initial_channel": 16,
                "upsample_rates": [2, 2], "upsample_kernels": [4, 4],
                "resblock_kernels": [3], "resblock_dilations": [[1, 2]]},
    "campplus": {"feat_dim": 16, "fcm_channels": 4, "init_channels": 8,
                 "growth_rate": 4, "bn_size": 2, "block_layers": [2, 2],
                 "block_dilations": [1, 2], "embedding_size": 12},
    "punc": {"vocab_size": 64, "num_layers": 2, "d_model": 16,
             "embed_dim": 24, "n_heads": 2, "ffn_dim": 32},
    "kws": {"vocab_size": 32, "hidden_dim": 16, "proj_dim": 8,
            "num_layers": 2},
}


def _fix(v):
    return tuple(tuple(x) if isinstance(x, list) else x for x in v) \
        if isinstance(v, list) else v


@pytest.mark.parametrize("family", sorted(TINY))
def test_cli_convert_and_diff_rehearsal(family, tmp_path, capsys, monkeypatch):
    overrides = TINY[family]
    template, rules, kwargs = cc._family_setup(family, overrides)
    sd = ckpt.invert_to_state_dict(template, rules)
    if kwargs.get("pre_transform") is ckpt.fold_weight_norm:
        # hifigan: the real checkpoint is weight-normed — synthesize that
        # form so the CLI's fold_weight_norm path is exercised
        normed = {}
        for k, v in sd.items():
            if k.endswith(".weight") and np.ndim(v) >= 2:
                v = np.asarray(v, np.float32)
                axes = tuple(range(1, v.ndim))
                g = np.sqrt((v * v).sum(axis=axes, keepdims=True))
                normed[k[:-len(".weight")] + ".weight_g"] = g
                normed[k[:-len(".weight")] + ".weight_v"] = v
            else:
                normed[k] = v
        sd = normed
    model_dir = tmp_path / family
    model_dir.mkdir()
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, model_dir / "model.pt")
    cfg_path = tmp_path / f"{family}.json"
    cfg_path.write_text(json.dumps(overrides))

    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint", "--family", family,
        "--model-dir", str(model_dir), "--diff",
        "--config-json", str(cfg_path)])
    cc.main()
    out = capsys.readouterr().out.strip().splitlines()
    convert_report = json.loads(out[0])
    diff_report = json.loads(out[-1])
    assert (model_dir / "jax_params.npz").exists()
    assert convert_report["n_params"] > 0
    assert diff_report["n_unmapped"] == 0, diff_report
    assert diff_report["worst_roundtrip_err"] <= 1e-5, diff_report


def test_cli_rejects_unknown_config_field(tmp_path, monkeypatch):
    cfg_path = tmp_path / "bad.json"
    cfg_path.write_text(json.dumps({"no_such_field": 1}))
    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint", "--family", "fsmn_vad",
        "--model-dir", str(tmp_path), "--config-json", str(cfg_path)])
    with pytest.raises(SystemExit):
        cc.main()
