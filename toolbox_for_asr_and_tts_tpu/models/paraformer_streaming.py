"""Streaming Paraformer: chunked online recognition with explicit state.

TPU-native counterpart of ModelScope
`speech_paraformer-large_asr_nat-zh-cn-16k-common-vocab8404-online`
("paraformer-zh-streaming"), which the reference loads with chunk config
[0,4,5] (240 ms chunks) and encoder/decoder look-back 4/1
(voice-service/app/services/voice_interface.py:629-634,651-653). The
reference disables mid-chunk decoding (voice_interface.py:1749-1809) and
uses its offline model at finalize; this implementation supports true
incremental partials as well.

Design (survey §7 "hard parts" — streaming state as explicit pytrees):

- **StreamingFrontend** (host + fixed-shape device calls): raw audio →
  fbank → LFR 7/6 → CMVN, emitted in fixed blocks so every device call has
  one compiled shape.
- **Encoder**: sliding-window re-encode — the newest chunk is encoded with
  `lookback` previous chunks of context in one static-shape program, and
  only the newest chunk's states are consumed. (FunASR caches k/v per layer
  instead; windowed re-encode trades ~(lookback+1)× encoder FLOPs — cheap on
  the MXU — for zero cache plumbing and full XLA fusion.)
- **CIF**: carried integration state (absolute fired-mass offset + partial
  token accumulator) so chunked firing matches the offline overlap-matrix
  `cif` exactly (tested token-for-token).
- **Decoder**: NAR re-decode of all fired tokens so far over the bounded
  encoder memory each emission — utterances are endpointed at 2 s silence,
  so the token count stays small (≤ ~64).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import frontend as fe
from ..ops import nn
from . import paraformer


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    chunk_frames: int = 4          # LFR frames per decode chunk (240 ms)
    encoder_lookback: int = 4      # chunks of left context (reference :652)
    max_memory_frames: int = 512   # bounded encoder memory (~30 s)
    max_tokens: int = 64           # static cap on per-utterance tokens
    tokens_per_chunk: int = 8      # static cap on per-chunk fires


# --------------------------------------------------------- streaming CIF
def cif_step(enc_chunk: jnp.ndarray, alphas: jnp.ndarray,
             mass_offset: jnp.ndarray, frame_acc: jnp.ndarray,
             k_cap: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One CIF chunk with carried state.

    enc_chunk [T, D]; alphas [T]; mass_offset: scalar absolute mass already
    integrated; frame_acc [D]: weighted sum accumulated toward the current
    (unfired) token. Returns (embeds [k_cap, D], n_fired, new_mass_offset,
    new_frame_acc). Token k (local) is absolute token floor(mass_offset)+k.
    """
    t, d = enc_chunk.shape
    k0 = jnp.floor(mass_offset)
    c = mass_offset + jnp.cumsum(alphas)              # [T] absolute mass
    lo = jnp.concatenate([mass_offset[None], c[:-1]])
    k = k0 + jnp.arange(k_cap, dtype=jnp.float32)     # absolute boundaries
    w = jnp.minimum(c[None, :], k[:, None] + 1.0) - \
        jnp.maximum(lo[None, :], k[:, None])
    w = jnp.maximum(w, 0.0)                           # [K, T]
    embeds = jnp.matmul(w, enc_chunk, preferred_element_type=jnp.float32)
    # token 0 continues the previous partial token
    embeds = embeds.at[0].add(frame_acc)
    n_fired = (jnp.floor(c[-1]) - k0).astype(jnp.int32)
    n_fired = jnp.minimum(n_fired, k_cap)
    # new partial accumulator: contribution beyond the last fired boundary.
    # If nothing fired this chunk, the old partial continues and already sits
    # inside embeds[0] (frame_acc + this chunk's token-k0 contribution).
    boundary = jnp.floor(c[-1])
    w_tail = jnp.maximum(
        jnp.minimum(c, boundary + 1.0) - jnp.maximum(lo, boundary), 0.0)
    tail = jnp.matmul(w_tail[None, :], enc_chunk,
                      preferred_element_type=jnp.float32)[0]
    new_acc = jnp.where(n_fired > 0, tail, embeds[0])
    return embeds, n_fired, c[-1], new_acc


# ------------------------------------------------------ streaming frontend
class StreamingFrontend:
    """Raw 16 kHz audio → LFR+CMVN features, incremental, fixed shapes.

    Emits LFR frame i when fbank frame 6i+3 is available (the centered LFR
    window needs 3 frames of lookahead), repeating the first frame for left
    context exactly like offline `apply_lfr`.
    """

    def __init__(self, cfg: fe.FrontendConfig,
                 cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        self.cfg = cfg
        self.cmvn = cmvn
        self._audio = np.zeros(0, np.float32)
        self._fbank: List[np.ndarray] = []     # per-frame vectors
        self._lfr_emitted = 0
        self._fns: Dict[int, object] = {}

    def _fbank_fn(self, n: int):
        if n not in self._fns:
            cfg = self.cfg
            self._fns[n] = jax.jit(lambda x: fe.fbank(x, cfg))
        return self._fns[n]

    def push(self, audio: np.ndarray) -> np.ndarray:
        """Returns newly available LFR+CMVN frames [n_new, lfr_m*n_mels]."""
        cfg = self.cfg
        self._audio = np.concatenate([self._audio, np.asarray(audio, np.float32)])
        n_frames = fe.num_fbank_frames(len(self._audio), cfg)
        if n_frames > 0:
            fb = np.asarray(self._fbank_fn(len(self._audio))(
                jnp.asarray(self._audio[None])))[0]
            self._fbank.extend(fb[:n_frames])
            consumed = n_frames * cfg.frame_shift
            self._audio = self._audio[consumed:]
        return self._drain_lfr()

    def push_fbank(self, frames: np.ndarray) -> np.ndarray:
        """Append precomputed fbank frames and drain LFR — the batched-
        frontend path (parallel/stream_batcher.py computes ONE fbank call
        for all sessions instead of one device dispatch per session)."""
        if len(frames):
            self._fbank.extend(np.asarray(frames, np.float32))
        return self._drain_lfr()

    def _drain_lfr(self) -> np.ndarray:
        cfg = self.cfg
        m, n = cfg.lfr_m, cfg.lfr_n
        left = (m - 1) // 2
        out = []
        while True:
            i = self._lfr_emitted
            need = i * n + (m - left)  # highest fbank index required + 1
            if len(self._fbank) < need:
                break
            idx = [max(0, min(i * n + j - left, len(self._fbank) - 1))
                   for j in range(m)]
            out.append(np.concatenate([self._fbank[k] for k in idx]))
            self._lfr_emitted += 1
        if not out:
            return np.zeros((0, m * cfg.n_mels), np.float32)
        feats = np.stack(out)
        if self.cmvn is not None:
            feats = (feats + self.cmvn[0]) * self.cmvn[1]
        return feats.astype(np.float32)

    def flush(self) -> np.ndarray:
        """Emit the trailing LFR frames that are still waiting for lookahead.

        Offline `apply_lfr` produces ceil(t_fb / n) frames, clamping indices
        to the last fbank frame; the incremental `_drain_lfr` only emits a
        frame once its (m − left) lookahead exists, so up to ~0.3 s of tail
        audio stays buffered. Called at finalize so streaming == offline
        frame-for-frame (round-1 ADVICE finding)."""
        cfg = self.cfg
        m, n = cfg.lfr_m, cfg.lfr_n
        left = (m - 1) // 2
        total = fe.num_lfr_frames(len(self._fbank), n)
        out = []
        while self._lfr_emitted < total:
            i = self._lfr_emitted
            idx = [max(0, min(i * n + j - left, len(self._fbank) - 1))
                   for j in range(m)]
            out.append(np.concatenate([self._fbank[k] for k in idx]))
            self._lfr_emitted += 1
        if not out:
            return np.zeros((0, m * cfg.n_mels), np.float32)
        feats = np.stack(out)
        if self.cmvn is not None:
            feats = (feats + self.cmvn[0]) * self.cmvn[1]
        return feats.astype(np.float32)

    def reset(self) -> None:
        self._audio = np.zeros(0, np.float32)
        self._fbank = []
        self._lfr_emitted = 0


# --------------------------------------------------- shared partial decode
def nar_redecode(params, cfg: paraformer.ParaformerConfig, fns: Dict,
                 embeds: List[np.ndarray], memory: np.ndarray) -> List[int]:
    """2-pass partials: NAR re-decode of all accumulated CIF embeddings over
    the bounded encoder memory — shared by StreamingRecognizer and
    OnlineRecognizer (round-2 review: previously duplicated)."""
    if not len(embeds):
        return []
    k = 8 * ((len(embeds) + 7) // 8)
    t_mem = 64 * ((max(len(memory), 1) + 63) // 64)
    key = f"dec{k}_{t_mem}"
    if key not in fns:
        def run(p, emb, n_tok, mem, n_mem, k=k, t_mem=t_mem):
            token_mask = nn.length_mask(n_tok[None], k)
            mem_mask = nn.length_mask(n_mem[None], t_mem)
            logits = paraformer.decode(p, emb[None], token_mask,
                                       mem[None], mem_mask, cfg)
            return jnp.argmax(logits[0], axis=-1)
        fns[key] = jax.jit(run)
    emb = np.zeros((k, cfg.d_model), np.float32)
    emb[: len(embeds)] = np.stack(embeds)
    mem = np.zeros((t_mem, cfg.d_model), np.float32)
    mem[: len(memory)] = memory
    ids = fns[key](params, jnp.asarray(emb),
                   jnp.asarray(len(embeds), np.int32), jnp.asarray(mem),
                   jnp.asarray(len(memory), np.int32))
    return np.asarray(ids)[: len(embeds)].tolist()


# ------------------------------------------------------ streaming recognizer
class StreamingRecognizer:
    """Incremental wav → partial/final text over a shared Paraformer."""

    def __init__(self, params, cfg: paraformer.ParaformerConfig,
                 tokenizer, scfg: StreamingConfig = StreamingConfig(),
                 cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        self.params = params
        self.cfg = cfg
        self.scfg = scfg
        self.tokenizer = tokenizer
        self.frontend = StreamingFrontend(cfg.frontend, cmvn)
        self._feat_queue = np.zeros((0, cfg.input_dim), np.float32)
        self._window = np.zeros((0, cfg.input_dim), np.float32)
        self._memory = np.zeros((0, cfg.d_model), np.float32)
        self._mass = jnp.zeros(())
        self._acc = jnp.zeros((cfg.d_model,))
        self._embeds: List[np.ndarray] = []
        self._fns: Dict[str, object] = {}

    # ---------------------------------------------------------- compiled
    def _encode_fn(self, t: int):
        key = f"enc{t}"
        if key not in self._fns:
            cfg = self.cfg

            def run(params, feats, n_valid):
                # the window is right-aligned: its first (t − n_valid) frames
                # are zero left-padding and must not serve as attention keys
                mask = (jnp.arange(t)[None, :] >= t - n_valid).astype(
                    jnp.float32)
                enc = paraformer.encode(params, feats, mask, cfg)
                alphas = paraformer.predictor_alphas(params, enc, mask, cfg)
                return enc[0], alphas[0]

            self._fns[key] = jax.jit(run)
        return self._fns[key]

    def _cif_fn(self):
        if "cif" not in self._fns:
            k_cap = self.scfg.tokens_per_chunk
            self._fns["cif"] = jax.jit(
                lambda e, a, m, acc: cif_step(e, a, m, acc, k_cap))
        return self._fns["cif"]

    # ------------------------------------------------------------ public
    def push_audio(self, audio: np.ndarray) -> str:
        """Feed a chunk; returns the current partial hypothesis."""
        feats = self.frontend.push(audio)
        if len(feats):
            self._feat_queue = np.concatenate([self._feat_queue, feats])
        cf = self.scfg.chunk_frames
        while len(self._feat_queue) >= cf:
            chunk, self._feat_queue = (self._feat_queue[:cf],
                                       self._feat_queue[cf:])
            self._process_chunk(chunk)
        return self.partial_text()

    def _process_chunk(self, chunk: np.ndarray, n_valid: int = -1) -> None:
        """n_valid: valid rows of `chunk` (rest is finalize zero-padding;
        pad rows must neither contribute CIF mass NOR enter the window as
        valid encoder keys — round-2/2d review findings: they previously
        joined self._window, so the final chunk's attention/FSMN saw
        raw-zero rows as real frames and deviated from offline)."""
        cf, lb = self.scfg.chunk_frames, self.scfg.encoder_lookback
        if n_valid < 0:
            n_valid = len(chunk)
        if n_valid == 0:
            return
        self._window = np.concatenate(
            [self._window, chunk[:n_valid]])[-cf * (lb + 1):]
        t_win = cf * (lb + 1)
        padded = np.zeros((t_win, self.cfg.input_dim), np.float32)
        padded[-len(self._window):] = self._window  # left-pad with zeros
        enc, alphas = self._encode_fn(t_win)(
            self.params, jnp.asarray(padded[None]),
            jnp.asarray(len(self._window), np.int32))
        # CIF over the last cf encoder rows; with a partial final chunk the
        # first cf − n_valid of those are OLDER frames already integrated in
        # previous chunks, so only the trailing n_valid alphas count
        enc_new = enc[-cf:]
        alpha_new = alphas[-cf:]
        if n_valid < cf:
            alpha_new = alpha_new * (jnp.arange(cf) >= cf - n_valid)
        embeds, n_fired, self._mass, self._acc = self._cif_fn()(
            enc_new, alpha_new, self._mass, self._acc)
        n = int(n_fired)
        if n > 0:
            self._embeds.extend(np.asarray(embeds[:n]))
            self._embeds = self._embeds[: self.scfg.max_tokens]
        self._memory = np.concatenate(
            [self._memory, np.asarray(enc)[-n_valid:]]
        )[-self.scfg.max_memory_frames:]

    def _decode_current(self) -> List[int]:
        return nar_redecode(self.params, self.cfg, self._fns, self._embeds,
                            self._memory)

    def partial_text(self) -> str:
        return self.tokenizer.ids_to_text(self._decode_current())

    def finalize(self) -> str:
        """Drain the frontend LFR lookahead and the partial feature queue,
        then fire any pending partial token mass ≥ (1 − tail).

        Round-1 ADVICE finding: finalize previously only fired pending CIF
        mass, silently dropping the <chunk_frames feature remainder and the
        frontend's buffered lookahead (~0.3–0.4 s of trailing speech)."""
        feats = self.frontend.flush()
        if len(feats):
            self._feat_queue = np.concatenate([self._feat_queue, feats])
        cf = self.scfg.chunk_frames
        while len(self._feat_queue) > 0:
            chunk = self._feat_queue[:cf]
            self._feat_queue = self._feat_queue[cf:]
            n_valid = len(chunk)
            if n_valid < cf:  # zero-pad the last partial chunk through
                pad = np.zeros((cf - n_valid, self.cfg.input_dim), np.float32)
                chunk = np.concatenate([chunk, pad])
            self._process_chunk(chunk, n_valid=n_valid)
        tail = self.cfg.predictor_tail_threshold
        frac = float(self._mass) - np.floor(float(self._mass))
        if frac > 0 and frac + tail >= 1.0 and \
                len(self._embeds) < self.scfg.max_tokens:
            self._embeds.append(np.asarray(self._acc))
        text = self.partial_text()
        self.reset()
        return text

    def reset(self) -> None:
        self.frontend.reset()
        self._feat_queue = np.zeros((0, self.cfg.input_dim), np.float32)
        self._window = np.zeros((0, self.cfg.input_dim), np.float32)
        self._memory = np.zeros((0, self.cfg.d_model), np.float32)
        self._mass = jnp.zeros(())
        self._acc = jnp.zeros((self.cfg.d_model,))
        self._embeds = []
