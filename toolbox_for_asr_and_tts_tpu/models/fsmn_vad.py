"""FSMN-VAD: streaming voice activity detection model in JAX.

TPU-native re-implementation of the model behind ModelScope
`speech_fsmn_vad_zh-cn-16k-common-pytorch` ("fsmn-vad"), which the reference
loads for per-chunk VAD (reference voice-service/app/services/
voice_interface.py:621-626,796-809,1580-1602).

Architecture (FunASR FSMN encoder):
    fbank80 → LFR m=5,n=1 → CMVN → 400-dim @ 10 ms
    AffineTransform 400→140 → AffineTransform 140→250 → ReLU
    4 × [ LinearTransform 250→128 (no bias)
          FSMNBlock depthwise-conv lorder=20 (past only) + residual
          AffineTransform 128→250 → ReLU ]
    AffineTransform 250→140 → AffineTransform 140→248 → softmax
    P(speech) = 1 − P(silence pdf 0)

Streaming: the only stateful ops are the 4 depthwise FSMN convs; their state
is the last (lorder−1) input frames per layer, carried as an explicit cache
pytree threaded through `jit` (survey §7 "hard parts": ring-buffer pytrees).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.frontend import FrontendConfig


@dataclasses.dataclass(frozen=True)
class FsmnVadConfig:
    input_dim: int = 400          # 80 mel × LFR m=5
    input_affine_dim: int = 140
    linear_dim: int = 250
    proj_dim: int = 128
    fsmn_layers: int = 4
    lorder: int = 20
    rorder: int = 0
    output_affine_dim: int = 140
    output_dim: int = 248
    sil_pdf_ids: Tuple[int, ...] = (0,)

    @property
    def frontend(self) -> FrontendConfig:
        return FrontendConfig(lfr_m=5, lfr_n=1)

    @classmethod
    def from_funasr(cls, conf: dict, **overrides) -> "FsmnVadConfig":
        """Config from the checkpoint's own config.yaml (FunASR FSMN
        encoder_conf + model_conf.sil_pdf_ids)."""
        enc = conf.get("encoder_conf", {}) or {}
        kw = {}
        for srcs, dst in ((("input_dim",), "input_dim"),
                          (("input_affine_dim",), "input_affine_dim"),
                          (("linear_dim",), "linear_dim"),
                          (("proj_dim",), "proj_dim"),
                          (("fsmn_layers", "fsmn_layer_num"), "fsmn_layers"),
                          (("lorder",), "lorder"),
                          (("rorder",), "rorder"),
                          (("output_affine_dim",), "output_affine_dim"),
                          (("output_dim",), "output_dim")):
            for s in srcs:
                if s in enc:
                    kw[dst] = enc[s]
                    break
        mc = conf.get("model_conf", {}) or {}
        if "sil_pdf_ids" in mc:
            kw["sil_pdf_ids"] = tuple(mc["sil_pdf_ids"])
        kw.update(overrides)
        return cls(**kw)


def from_model_dir(model_dir: str, cfg: "FsmnVadConfig" = None):
    """Converted `speech_fsmn_vad_zh-cn-16k-common` checkpoint dir →
    (params, cfg, cmvn). Geometry from the dir's config.yaml, CMVN from
    am.mvn (FunASR applies it in the VAD frontend)."""
    import os
    from ..runtime import checkpoints as ckpt
    cfg = cfg or FsmnVadConfig.from_funasr(ckpt.load_model_config(model_dir))
    template = init_params(jax.random.PRNGKey(0), cfg)
    params = ckpt.convert_or_load_cached(model_dir, template,
                                         ckpt.fsmn_vad_rules(cfg.fsmn_layers))
    cmvn = None
    mvn = os.path.join(model_dir, "am.mvn")
    if os.path.exists(mvn):
        cmvn = ckpt.parse_kaldi_cmvn(mvn)
    return params, cfg, cmvn


def init_params(key, cfg: FsmnVadConfig = FsmnVadConfig()) -> nn.Params:
    keys = jax.random.split(key, 4 + 3 * cfg.fsmn_layers)
    p: Dict = {
        "in1": nn.linear_init(keys[0], cfg.input_dim, cfg.input_affine_dim),
        "in2": nn.linear_init(keys[1], cfg.input_affine_dim, cfg.linear_dim),
        "out1": nn.linear_init(keys[2], cfg.linear_dim, cfg.output_affine_dim),
        "out2": nn.linear_init(keys[3], cfg.output_affine_dim, cfg.output_dim),
        "blocks": [],
    }
    ki = 4
    for _ in range(cfg.fsmn_layers):
        p["blocks"].append({
            "proj": nn.linear_init(keys[ki], cfg.linear_dim, cfg.proj_dim, bias=False),
            "fsmn": nn.fsmn_block_init(keys[ki + 1], cfg.proj_dim, cfg.lorder, cfg.rorder),
            "affine": nn.linear_init(keys[ki + 2], cfg.proj_dim, cfg.linear_dim),
        })
        ki += 3
    return p


def apply(params: nn.Params, feats: jnp.ndarray,
          cfg: FsmnVadConfig = FsmnVadConfig()) -> jnp.ndarray:
    """feats: [B, T, 400] (LFR+CMVN) → pdf posteriors [B, T, 248]."""
    x = jax.nn.relu(nn.linear(params["in2"], nn.linear(params["in1"], feats)))
    pad = nn.fsmn_pad(cfg.lorder, cfg.rorder)
    for blk in params["blocks"]:
        h = nn.linear(blk["proj"], x)
        h = nn.fsmn_block(blk["fsmn"], h, pad)
        x = jax.nn.relu(nn.linear(blk["affine"], h))
    x = nn.linear(params["out2"], nn.linear(params["out1"], x))
    return jax.nn.softmax(x, axis=-1)


def speech_prob(posteriors: jnp.ndarray,
                cfg: FsmnVadConfig = FsmnVadConfig()) -> jnp.ndarray:
    """[B, T, 248] → P(speech) [B, T] = 1 − Σ P(sil pdfs)."""
    sil = posteriors[..., jnp.asarray(cfg.sil_pdf_ids)].sum(axis=-1)
    return 1.0 - sil


# ------------------------------------------------------------- streaming
def init_cache(batch: int, cfg: FsmnVadConfig = FsmnVadConfig()) -> list:
    """Per-layer FSMN conv left-context cache: last lorder−1 proj frames."""
    return [jnp.zeros((batch, cfg.lorder - 1, cfg.proj_dim))
            for _ in range(cfg.fsmn_layers)]


def apply_streaming(params: nn.Params, feats: jnp.ndarray, cache: list,
                    cfg: FsmnVadConfig = FsmnVadConfig()
                    ) -> Tuple[jnp.ndarray, list]:
    """One chunk with explicit conv state.

    feats: [B, T_chunk, 400]. Equivalent to running `apply` on the full
    stream and slicing this chunk (rorder must be 0 — causal).
    """
    assert cfg.rorder == 0, "streaming requires a causal FSMN"
    x = jax.nn.relu(nn.linear(params["in2"], nn.linear(params["in1"], feats)))
    new_cache = []
    ctx = cfg.lorder - 1
    for blk, c in zip(params["blocks"], cache):
        h = nn.linear(blk["proj"], x)
        hc = jnp.concatenate([c, h], axis=1)          # [B, ctx+T, proj]
        y = nn.conv1d({"w": blk["fsmn"]["w"]}, hc, padding=(0, 0),
                      groups=cfg.proj_dim)             # valid conv → [B, T, proj]
        h = h + y
        new_cache.append(hc[:, -ctx:, :])
        x = jax.nn.relu(nn.linear(blk["affine"], h))
    x = nn.linear(params["out2"], nn.linear(params["out1"], x))
    return jax.nn.softmax(x, axis=-1), new_cache
