"""Sambert-class acoustic model: phonemes → mel-spectrogram (NAR, static shapes).

TPU-native counterpart of the acoustic half of ModelScope
`damo/speech_sambert-hifigan_tts_zh-cn_16k` (reference tts-service/app/
services/tts_service.py:34-38,143-177). KAN-TTS's Sambert decodes mel
autoregressively with PNCA attention; an AR per-frame loop is hostile to the
MXU, so this re-design keeps Sambert's FastSpeech-family skeleton —

    phone embedding (+ speaker embedding) → self-attention encoder
    → variance adaptors (duration / pitch / energy, conv-ln-relu predictors)
    → length regulation (gather by searchsorted over duration cumsum —
      static shapes, no data-dependent loops)
    → self-attention decoder → linear mel projection → conv postnet residual

— which produces the whole mel in one fused XLA program per shape bucket.
Multi-voice ("zhitian_emo" etc., tts_service.py:964) maps to the speaker
embedding table.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn


@dataclasses.dataclass(frozen=True)
class SambertConfig:
    vocab_size: int = 4608          # phoneme inventory (tts/text_frontend.py)
    n_speakers: int = 8
    d_model: int = 256
    n_heads: int = 4
    ffn_dim: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    n_mels: int = 80
    max_duration: int = 20          # frames per phone cap (static shapes)
    frames_per_phone: int = 10      # mel bucket = phones × this (125 ms avg
                                    # per phone ≈ 2× typical Mandarin rate)
    postnet_layers: int = 5
    postnet_channels: int = 256
    postnet_kernel: int = 5
    var_kernel: int = 3
    var_channels: int = 256


def _var_predictor_init(key, d: int, channels: int, k: int) -> nn.Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "c1": nn.conv1d_init(k1, d, channels, k),
        "ln1": nn.layernorm_init(channels),
        "c2": nn.conv1d_init(k2, channels, channels, k),
        "ln2": nn.layernorm_init(channels),
        "out": nn.linear_init(k3, channels, 1),
    }


def _var_predictor(p: nn.Params, x: jnp.ndarray, k: int) -> jnp.ndarray:
    pad = ((k - 1) // 2, k // 2)
    h = jax.nn.relu(nn.conv1d(p["c1"], x, padding=pad))
    h = nn.layernorm(p["ln1"], h)
    h = jax.nn.relu(nn.conv1d(p["c2"], h, padding=pad))
    h = nn.layernorm(p["ln2"], h)
    return nn.linear(p["out"], h)[..., 0]


def _transformer_layer_init(key, d: int, heads: int, ffn: int) -> nn.Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm1": nn.layernorm_init(d),
        "attn": nn.mha_init(k1, d, heads),
        "norm2": nn.layernorm_init(d),
        "ffn": nn.ffn_init(k2, d, ffn),
    }


def _transformer_layer(p: nn.Params, x, heads: int, mask) -> jnp.ndarray:
    x = x + nn.mha(p["attn"], nn.layernorm(p["norm1"], x), heads, mask)
    x = x + nn.ffn(p["ffn"], nn.layernorm(p["norm2"], x))
    return x


def init_params(key, cfg: SambertConfig) -> nn.Params:
    n = cfg.encoder_layers + cfg.decoder_layers + cfg.postnet_layers + 10
    keys = jax.random.split(key, n)
    ki = iter(range(n))
    enc = [_transformer_layer_init(keys[next(ki)], cfg.d_model, cfg.n_heads,
                                   cfg.ffn_dim) for _ in range(cfg.encoder_layers)]
    dec = [_transformer_layer_init(keys[next(ki)], cfg.d_model, cfg.n_heads,
                                   cfg.ffn_dim) for _ in range(cfg.decoder_layers)]
    postnet = []
    for i in range(cfg.postnet_layers):
        c_in = cfg.n_mels if i == 0 else cfg.postnet_channels
        c_out = cfg.n_mels if i == cfg.postnet_layers - 1 else cfg.postnet_channels
        postnet.append({"conv": nn.conv1d_init(keys[next(ki)], c_in, c_out,
                                               cfg.postnet_kernel),
                        "ln": nn.layernorm_init(c_out)})
    return {
        "embed": nn.embedding_init(keys[next(ki)], cfg.vocab_size, cfg.d_model),
        "spk": nn.embedding_init(keys[next(ki)], cfg.n_speakers, cfg.d_model),
        "encoder": enc,
        "duration": _var_predictor_init(keys[next(ki)], cfg.d_model,
                                        cfg.var_channels, cfg.var_kernel),
        "pitch": _var_predictor_init(keys[next(ki)], cfg.d_model,
                                     cfg.var_channels, cfg.var_kernel),
        "energy": _var_predictor_init(keys[next(ki)], cfg.d_model,
                                      cfg.var_channels, cfg.var_kernel),
        "pitch_embed": nn.conv1d_init(keys[next(ki)], 1, cfg.d_model, 9),
        "energy_embed": nn.conv1d_init(keys[next(ki)], 1, cfg.d_model, 9),
        "decoder": dec,
        "mel_out": nn.linear_init(keys[next(ki)], cfg.d_model, cfg.n_mels),
        "postnet": postnet,
    }


def length_regulate(x: jnp.ndarray, durations: jnp.ndarray, t_mel: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand phone states by integer durations — static shapes.

    x: [B, L, D]; durations: [B, L] int32 (0 for padding phones).
    Frame t takes the phone whose duration-cumsum interval contains t:
    idx_t = Σ_l 1[t ≥ ends_l]. Returns ([B, t_mel, D], mel_mask [B, t_mel]).
    """
    ends = jnp.cumsum(durations, axis=1)                 # [B, L]
    t = jnp.arange(t_mel)[None, :, None]                  # [1, T, 1]
    idx = jnp.sum(t >= ends[:, None, :], axis=-1)         # [B, T]
    total = ends[:, -1:]
    mel_mask = (jnp.arange(t_mel)[None, :] < total).astype(x.dtype)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    expanded = jnp.take_along_axis(x, idx[..., None], axis=1)
    return expanded * mel_mask[..., None], mel_mask


def forward(params: nn.Params, phone_ids: jnp.ndarray, phone_lens: jnp.ndarray,
            speaker_ids: jnp.ndarray, cfg: SambertConfig,
            duration_override: Optional[jnp.ndarray] = None
            ) -> Dict[str, jnp.ndarray]:
    """phone_ids [B, L] → mel [B, T_mel, n_mels] with T_mel = L·frames_per_phone."""
    b, l = phone_ids.shape
    t_mel = l * cfg.frames_per_phone
    pmask = nn.length_mask(phone_lens, l)
    x = nn.embedding(params["embed"], phone_ids)
    x = x + nn.sinusoidal_posenc(l, cfg.d_model, dtype=x.dtype)[None]
    x = x + nn.embedding(params["spk"], speaker_ids)[:, None, :]
    for layer in params["encoder"]:
        x = _transformer_layer(layer, x, cfg.n_heads, pmask)
    x = x * pmask[..., None]

    log_dur = _var_predictor(params["duration"], x, cfg.var_kernel)
    if duration_override is not None:
        dur = duration_override
    else:
        dur = jnp.clip(jnp.round(jnp.exp(log_dur) - 1.0), 1, cfg.max_duration)
    dur = (dur * pmask).astype(jnp.int32)

    pitch = _var_predictor(params["pitch"], x, cfg.var_kernel) * pmask
    energy = _var_predictor(params["energy"], x, cfg.var_kernel) * pmask
    x = x + nn.conv1d(params["pitch_embed"], pitch[..., None], padding=(4, 4))
    x = x + nn.conv1d(params["energy_embed"], energy[..., None], padding=(4, 4))

    h, mel_mask = length_regulate(x, dur, t_mel)
    h = h + nn.sinusoidal_posenc(t_mel, cfg.d_model, dtype=h.dtype)[None]
    for layer in params["decoder"]:
        h = _transformer_layer(layer, h, cfg.n_heads, mel_mask)
    mel = nn.linear(params["mel_out"], h)

    r = mel
    pad = ((cfg.postnet_kernel - 1) // 2, cfg.postnet_kernel // 2)
    for i, pn in enumerate(params["postnet"]):
        r = nn.conv1d(pn["conv"], r, padding=pad)
        r = nn.layernorm(pn["ln"], r)
        if i < len(params["postnet"]) - 1:
            r = jnp.tanh(r)
    mel = (mel + r) * mel_mask[..., None]

    mel_lens = jnp.minimum(jnp.sum(dur, axis=1), t_mel)
    return {"mel": mel, "mel_lens": mel_lens, "durations": dur,
            "log_duration": log_dur, "pitch": pitch, "energy": energy}
