"""Speaker verification engine: CAM++ embeddings + cosine scoring.

Replaces the reference's ModelScope SV pipeline usage
(voice-service/app/services/voice_interface.py:2305-2633): enrollment needs
≥5 s of speech (min_enroll_seconds, :1137), verification compares an
enrollment sample with a segment at cosine threshold 0.40 (:1140; the local
demo uses 0.31, full_voice_demo.py:35).
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import campplus
from ..ops import frontend as fe
from ..runtime.bucketing import Bucketer

logger = logging.getLogger("toolbox.speaker")

SV_THRESHOLD = 0.40          # voice_interface.py:1140
MIN_ENROLL_SECONDS = 5.0     # voice_interface.py:1137


class SpeakerVerifier:
    def __init__(self, params, cfg: campplus.CampPlusConfig,
                 threshold: float = SV_THRESHOLD,
                 bucketer: Optional[Bucketer] = None):
        self.params = params
        self.cfg = cfg
        self.threshold = threshold
        self.fe_cfg = cfg.frontend
        self.bucketer = bucketer or Bucketer.for_audio()
        self._fns: Dict[Tuple[int, int], object] = {}

    @classmethod
    def random(cls, cfg: Optional[campplus.CampPlusConfig] = None,
               seed: int = 0, **kw) -> "SpeakerVerifier":
        cfg = cfg or campplus.CampPlusConfig(
            block_layers=(2, 2, 2), init_channels=64, embedding_size=64)
        params = campplus.init_params(jax.random.PRNGKey(seed), cfg)
        return cls(params, cfg, **kw)

    @classmethod
    def from_model_dir(cls, model_dir: str,
                       cfg: Optional[campplus.CampPlusConfig] = None,
                       **kw) -> "SpeakerVerifier":
        """Converted `speech_campplus_sv_zh-cn_16k-common` checkpoint dir."""
        import jax as _jax
        from ..runtime import checkpoints as ckpt
        cfg = cfg or campplus.CampPlusConfig()
        template = campplus.init_params(_jax.random.PRNGKey(0), cfg)
        params = ckpt.convert_or_load_cached(
            model_dir, template, ckpt.campplus_rules(cfg.block_layers))
        return cls(params, cfg, **kw)

    def _fn(self, b: int, n_samples: int):
        key = (b, n_samples)
        if key not in self._fns:
            t_fb = fe.num_fbank_frames(n_samples, self.fe_cfg)
            fcfg, cfg = self.fe_cfg, self.cfg

            def run(params, wavs, lens):
                feats = fe.fbank(wavs, fcfg, t_frames=t_fb)
                # SV front-end: per-utterance cepstral mean subtraction
                t_valid = jnp.maximum(
                    1 + (lens - fcfg.frame_length) // fcfg.frame_shift, 1)
                fmask = (jnp.arange(t_fb)[None, :] < t_valid[:, None])
                denom = jnp.maximum(fmask.sum(axis=1, keepdims=True), 1)
                mean = (feats * fmask[..., None]).sum(axis=1, keepdims=True) / denom[..., None]
                feats = (feats - mean) * fmask[..., None]
                return campplus.forward(params, feats, t_valid, cfg)

            self._fns[key] = jax.jit(run)
        return self._fns[key]

    def embed(self, wavs: List[np.ndarray]) -> np.ndarray:
        """float32 16 kHz waveforms → [N, embed_dim] embeddings."""
        batch, lens = self.bucketer.pad_batch([np.asarray(w) for w in wavs])
        fn = self._fn(batch.shape[0], batch.shape[1])
        out = fn(self.params, jnp.asarray(batch), jnp.asarray(lens))
        return np.asarray(out)[: len(wavs)]

    def verify(self, enroll_wav: np.ndarray, test_wav: np.ndarray
               ) -> Tuple[bool, float]:
        """(is_same_speaker, cosine_score) — reference `_verify_speaker_with_score`."""
        emb = self.embed([enroll_wav, test_wav])
        score = campplus.cosine_score(emb[0], emb[1])
        return score >= self.threshold, score

    def verify_embedding(self, enroll_emb: np.ndarray, test_wav: np.ndarray
                         ) -> Tuple[bool, float]:
        emb = self.embed([test_wav])[0]
        score = campplus.cosine_score(enroll_emb, emb)
        return score >= self.threshold, score
