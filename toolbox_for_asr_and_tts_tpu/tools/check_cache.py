"""Model cache diagnostic (reference `check_modelscope_cache.py` equivalent).

Reports which model directories resolve, which have converted `.npz` caches,
and the environment knobs that affect resolution.
"""
from __future__ import annotations

import json
import os

KNOWN_MODEL_DIRS = [
    "speech_paraformer-large_asr_nat-zh-cn-16k-common-vocab8404",
    "speech_paraformer-large_asr_nat-zh-cn-16k-common-vocab8404-online",
    "speech_fsmn_vad_zh-cn-16k-common-pytorch",
    "punc_ct-transformer_cn-en-common-vocab471067-large",
    "speech_campplus_sv_zh-cn_16k-common",
    "speech_charctc_kws_phone-xiaohu",
    "speech_sambert-hifigan_tts_zh-cn_16k",
]


def check(model_root: str = None) -> dict:
    model_root = model_root or os.getenv("VOICE_MODEL_DIR",
                                         "/workspace/models/damo")
    report = {"model_root": model_root,
              "root_exists": os.path.isdir(model_root),
              "env": {k: os.getenv(k) for k in
                      ("VOICE_MODEL_DIR", "TTS_MODEL_DIR", "MODELSCOPE_CACHE",
                       "HOTWORDS_FILE")},
              "models": {}}
    for name in KNOWN_MODEL_DIRS:
        d = os.path.join(model_root, name)
        entry = {"present": os.path.isdir(d)}
        if entry["present"]:
            entry["has_torch_ckpt"] = any(
                os.path.exists(os.path.join(d, f))
                for f in ("model.pt", "model.pb", "pytorch_model.bin"))
            entry["has_converted_npz"] = os.path.exists(
                os.path.join(d, "jax_params.npz"))
            entry["has_cmvn"] = os.path.exists(os.path.join(d, "am.mvn"))
        report["models"][name] = entry
    return report


def main() -> None:
    import sys
    root = sys.argv[1] if len(sys.argv) > 1 else None
    print(json.dumps(check(root), indent=2, ensure_ascii=False))


if __name__ == "__main__":
    main()
