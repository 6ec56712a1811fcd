"""Chunked online Paraformer encoder — weight-compatible with the real
`speech_paraformer-large_..._online` checkpoint.

The reference configures streaming with chunk_size=[0,4,5] and
encoder/decoder look-back 4/1 (voice-service/app/services/
voice_interface.py:629-634,651-653). FunASR's online model (the
`paraformer_streaming` family) reuses the offline SAN-M/CIF parameter set and
changes only the inference mechanics, which this module reproduces:

- **window**: each step embeds (×√d + continuing sinusoidal PE) the c1 new
  LFR frames and prepends the cached last (c0+c2) embedded frames, giving a
  fixed window W = c0+c2+c1; the cache is initialised to zeros so W is
  static from the first chunk (FunASR init_cache does the same).
- **per-layer k/v caches**: attention queries are the window; keys/values are
  [cached k/v ‖ window k/v] where the cache accumulates the window's
  *strided* (non-lookahead, window[:-c2]) keys and keeps the newest
  look_back·c1 entries. The strided slices of consecutive windows tile the
  frame timeline exactly once.
- **FSMN memory**: window-local with zero edge padding, no mask — exactly
  FunASR's streaming `forward_fsmn(v, None)`.
- **CIF**: alphas outside the window's active region [c0, c0+c1) are zeroed
  (the lookahead tail re-enters the next window); integration carries
  (mass, partial-frame) state across chunks; finalize extends the active
  region over the remaining frames and applies the tail-threshold fire.

Deviation (documented): streaming *partials* are decoded by NAR re-decode of
all fired CIF embeddings over a bounded encoder memory (as in
paraformer_streaming.py) rather than FunASR's fsmn-cached incremental
decoder — partials are advisory (the reference disables mid-chunk decode
entirely, voice_interface.py:1749-1809) and full re-decode both converges
and uses the identical decoder weights. Encoder/CIF mechanics — the parts
that determine what the chunk-trained weights compute — are faithful.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from . import paraformer
from .paraformer_streaming import StreamingFrontend, cif_step


@dataclasses.dataclass(frozen=True)
class OnlineConfig:
    """FunASR streaming geometry: chunk_size=[c0, c1, c2], look-backs."""
    c0: int = 0                    # left margin inside the window
    c1: int = 4                    # new LFR frames per step (240 ms)
    c2: int = 5                    # lookahead frames (re-encoded next step)
    encoder_look_back: int = 4     # chunks of cached k/v (keys = lb*c1)
    decoder_look_back: int = 1     # chunks of encoder memory for partial decode
    max_memory_frames: int = 512   # bounded NAR re-decode memory
    max_tokens: int = 64           # static per-utterance token cap
    tokens_per_chunk: int = 8      # static per-chunk fire cap

    @property
    def window(self) -> int:
        return self.c0 + self.c2 + self.c1

    @property
    def kv_frames(self) -> int:
        return self.encoder_look_back * self.c1


# ------------------------------------------------------------------- state
def init_state(cfg: paraformer.ParaformerConfig, ocfg: OnlineConfig,
               b: int = 1) -> Dict:
    """Zero-initialised streaming state pytree (batched over streams)."""
    h = cfg.n_heads
    dk = cfg.d_model // h
    n_layers = cfg.encoder_layers
    return {
        "start_idx": jnp.zeros((b,), jnp.int32),
        "feats": jnp.zeros((b, ocfg.c0 + ocfg.c2, cfg.input_dim)),
        "kv": [{"k": jnp.zeros((b, h, ocfg.kv_frames, dk)),
                "v": jnp.zeros((b, h, ocfg.kv_frames, dk))}
               for _ in range(n_layers)],
        "kv_len": jnp.zeros((b,), jnp.int32),
        "cif_mass": jnp.zeros((b,)),
        "cif_acc": jnp.zeros((b, cfg.d_model)),
    }


# ----------------------------------------------------------------- encoder
def _posenc_rows(positions: jnp.ndarray, d: int) -> jnp.ndarray:
    """Sinusoidal PE for explicit (1-based) positions [B, T] → [B, T, d]."""
    half = d // 2
    inv = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                  * -(np.log(10000.0) / (half - 1)))
    ang = positions.astype(jnp.float32)[..., None] * inv
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _layer_chunk(layer: nn.Params, x: jnp.ndarray, kv: Dict,
                 kv_len: jnp.ndarray, cfg: paraformer.ParaformerConfig,
                 ocfg: OnlineConfig, first: bool) -> Tuple[jnp.ndarray, Dict]:
    """One SAN-M encoder layer on the window with cached keys/values.

    x: [B, W, d_in]; kv: {"k","v"} [B, H, L, dk] right-aligned (kv_len valid).
    Returns (layer output [B, W, d], updated kv cache).
    """
    h_heads, L, W = cfg.n_heads, ocfg.kv_frames, x.shape[1]
    residual = x
    hx = nn.layernorm(layer["norm1"], x)
    qkv = nn.linear(layer["attn"]["qkv"], hx)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # FSMN memory: window-local, zero edge pad, NO mask (FunASR streaming)
    mem = nn.fsmn_block(layer["attn"]["fsmn"], v,
                        nn.sanm_pad(cfg.kernel_size, cfg.sanm_shift))
    qh = _heads(q, h_heads)
    kh = _heads(k, h_heads)
    vh = _heads(v, h_heads)
    keys = jnp.concatenate([kv["k"], kh], axis=2)    # [B, H, L+W, dk]
    vals = jnp.concatenate([kv["v"], vh], axis=2)
    # valid keys: the last kv_len cache slots + the whole window
    pos = jnp.arange(L + W)[None, :]
    att_mask = (pos >= (L - kv_len)[:, None]).astype(jnp.float32)[:, None, :]
    out = nn.attend(qh, keys, vals, att_mask)
    att = nn.linear(layer["attn"]["out"], _merge(out)) + mem
    x = att if first else residual + att
    residual = x
    x = residual + nn.ffn(layer["ffn"], nn.layernorm(layer["norm2"], x))
    # cache update: the window advances c1 frames per step, so exactly
    # window[0:c1] DEPARTS each step — appending those keeps the cache equal
    # to the L frames immediately preceding the next window: exactly-once
    # tiling, no gap (round-2d review: slice(0, W−c2) duplicated c0 frames,
    # and slice(c0, c0+c1) dropped the first c0 departing frames, whenever
    # c0 > 0; all three agree for the reference's chunk_size [0,4,5])
    strided = slice(0, ocfg.c1)
    new_k = jnp.concatenate([kv["k"], kh[:, :, strided]], axis=2)[:, :, -L:]
    new_v = jnp.concatenate([kv["v"], vh[:, :, strided]], axis=2)[:, :, -L:]
    return x, {"k": new_k, "v": new_v}


def _heads(x: jnp.ndarray, h: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _merge(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def encode_chunk(params: nn.Params, state: Dict, new_feats: jnp.ndarray,
                 cfg: paraformer.ParaformerConfig, ocfg: OnlineConfig
                 ) -> Tuple[Dict, jnp.ndarray]:
    """One streaming encoder step.

    new_feats: [B, c1, input_dim] LFR+CMVN frames. Returns (state', window
    encoder output [B, W, d_model]).
    """
    b, c1, _ = new_feats.shape
    x = new_feats * (cfg.d_model ** 0.5)
    pos = state["start_idx"][:, None] + jnp.arange(c1)[None, :] + 1
    x = x + _posenc_rows(pos, cfg.input_dim)
    window = jnp.concatenate([state["feats"], x], axis=1)   # [B, W, Din]
    h = window
    new_kv: List[Dict] = []
    for i, layer in enumerate(params["encoder"]["layers"]):
        h, kv_i = _layer_chunk(layer, h, state["kv"][i], state["kv_len"],
                               cfg, ocfg, first=(i == 0))
        new_kv.append(kv_i)
    h = nn.layernorm(params["encoder"]["after_norm"], h)
    new_state = dict(state)
    new_state["feats"] = window[:, -(ocfg.c0 + ocfg.c2):]
    new_state["start_idx"] = state["start_idx"] + c1
    new_state["kv"] = new_kv
    new_state["kv_len"] = jnp.minimum(
        state["kv_len"] + ocfg.c1, ocfg.kv_frames)
    return new_state, h


def predictor_chunk(params: nn.Params, enc_win: jnp.ndarray,
                    active: jnp.ndarray, state: Dict,
                    cfg: paraformer.ParaformerConfig, k_cap: int
                    ) -> Tuple[Dict, jnp.ndarray, jnp.ndarray]:
    """CIF over the window's active region with carried integration state.

    active: [B, W] mask of positions whose alphas count this step.
    Returns (state', fired embeds [B, k_cap, d], n_fired [B]).
    """
    p = params["predictor"]
    lpad = paraformer.predictor_lpad(cfg)
    h = nn.conv1d(p["conv"], enc_win,
                  padding=(lpad, cfg.predictor_kernel - 1 - lpad)) + enc_win
    alphas = jax.nn.sigmoid(nn.linear(p["out"], jax.nn.relu(h)))[..., 0]
    alphas = alphas * active
    embeds, n_fired, mass, acc = jax.vmap(
        lambda e, a, m, c: cif_step(e, a, m, c, k_cap))(
        enc_win, alphas, state["cif_mass"], state["cif_acc"])
    new_state = dict(state)
    new_state["cif_mass"] = mass
    new_state["cif_acc"] = acc
    return new_state, embeds, n_fired


# ------------------------------------------------- fused device frontend
def fused_buf_len(cfg: paraformer.ParaformerConfig, ocfg: OnlineConfig) -> int:
    """Device audio ring size for `fused_step`: one step consumes A =
    c1·lfr_n·shift samples and the LFR left context reaches left·shift
    samples before the step's first frame."""
    fcfg = cfg.frontend
    left = (fcfg.lfr_m - 1) // 2
    return ocfg.c1 * fcfg.lfr_n * fcfg.frame_shift + left * fcfg.frame_shift


def init_fused_state(cfg: paraformer.ParaformerConfig, ocfg: OnlineConfig,
                     b: int = 1, decode_partials: bool = False) -> Dict:
    state = init_state(cfg, ocfg, b)
    state["abuf"] = jnp.zeros((b, fused_buf_len(cfg, ocfg)))
    state["step_idx"] = jnp.zeros((b,), jnp.int32)
    if decode_partials:
        state.update(init_decoder_state(cfg, ocfg, b))
    return state


def fused_step(params: nn.Params, state: Dict, new_audio: jnp.ndarray,
               cfg: paraformer.ParaformerConfig, ocfg: OnlineConfig,
               cmvn: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
               k_cap: int = 8, decode_partials: bool = False):
    """ONE device program per streaming tick: audio → fbank → LFR → CMVN →
    chunked encoder → CIF, with the audio tail resident on device.

    new_audio: [B, A] raw samples (A = c1·lfr_n·shift — exactly one encoder
    chunk's worth; the host buffers remainders). Returns (state', fired
    embeds [B, k_cap, d] (bf16), n_fired [B]).

    Numerically identical to StreamingFrontend+encode_chunk: LFR's
    replicate-first-frame left context is reproduced by clamping global
    fbank indices at 0 (only step 0 clamps, and frame 0 is still in the
    ring then). The win is round trips: the per-session frontend cost S
    device calls per tick, the batched frontend 2 — this is 1.
    """
    from ..ops import frontend as fe
    fcfg = cfg.frontend
    b, a = new_audio.shape
    m, n_lfr = fcfg.lfr_m, fcfg.lfr_n
    left = (m - 1) // 2
    shift, flen = fcfg.frame_shift, fcfg.frame_length
    assert a == ocfg.c1 * n_lfr * shift, "feed exactly one chunk of samples"
    buf = jnp.concatenate([state["abuf"], new_audio], axis=1)[:, -(a + left * shift):]
    # fbank frames this step: global k ∈ [F·s − left, F·s + F + m − 1 − left)
    # where F = c1·n_lfr; local frame k_l starts at sample 160·k_l in `buf`
    n_fb = (ocfg.c1 - 1) * n_lfr + m   # frames needed for c1 LFR outputs
    # frame the ring: [B, n_fb, flen] via static strided gather
    idx = (jnp.arange(n_fb)[:, None] * shift + jnp.arange(flen)[None, :])
    frames = buf[:, idx]
    if fcfg.int16_scale:
        frames = frames * 32768.0
    if fcfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if fcfg.preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - fcfg.preemphasis * prev
    frames = frames * jnp.asarray(fe._window_coeffs(fcfg))
    pad = fcfg.n_fft - flen
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    spec = jnp.fft.rfft(frames, axis=-1)[..., : fcfg.n_fft // 2]
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if not fcfg.use_power:
        power = jnp.sqrt(power)
    mel = jnp.einsum("btf,fm->btm", power,
                     jnp.asarray(fe._mel_banks_np(fcfg)),
                     preferred_element_type=jnp.float32)
    fb = jnp.log(jnp.maximum(mel, fe.EPSILON))           # [B, n_fb, n_mels]
    # LFR with replicate-first clamping (step 0 only): local fbank index of
    # LFR (j, d) = max(F·s + j·n + d − left, 0) − (F·s − left)
    f_per_step = ocfg.c1 * n_lfr
    base = state["step_idx"][:, None, None] * f_per_step   # [B,1,1]
    j = jnp.arange(ocfg.c1)[None, :, None]
    d = jnp.arange(m)[None, None, :]
    local = jnp.maximum(base + j * n_lfr + d - left, 0) - (base - left)
    local = jnp.clip(local, 0, n_fb - 1)                   # [B, c1, m]
    feats = jnp.take_along_axis(fb, local.reshape(b, -1)[..., None],
                                axis=1).reshape(b, ocfg.c1, m * fcfg.n_mels)
    if cmvn is not None:
        feats = fe.apply_cmvn(feats, cmvn[0], cmvn[1])
    new_state = dict(state)
    new_state["abuf"] = buf                    # buf is already the last BUF
    new_state["step_idx"] = state["step_idx"] + 1
    new_state, enc = encode_chunk(params, new_state, feats, cfg, ocfg)
    active = jnp.zeros((1, ocfg.window))
    active = active.at[:, ocfg.c0: ocfg.c0 + ocfg.c1].set(1.0)
    active = jnp.broadcast_to(active, (b, ocfg.window))
    new_state, embeds, n = predictor_chunk(params, enc, active, new_state,
                                           cfg, k_cap)
    if not decode_partials:
        return new_state, embeds.astype(jnp.bfloat16), n
    # one-program partials: push this tick's settled frames into the decoder
    # memory ring and incrementally decode the fired tokens (state must come
    # from init_fused_state(..., decode_partials=True))
    dstate = {k: new_state[k] for k in ("fsmn", "hist_len", "mem", "mem_len")}
    settled = enc[:, ocfg.c0: ocfg.c0 + ocfg.c1]
    dstate = decoder_push_memory(dstate, settled,
                                 jnp.full((b,), ocfg.c1, jnp.int32))
    dstate, ids = decode_chunk(params, dstate, embeds, n, cfg)
    new_state.update(dstate)
    return new_state, embeds.astype(jnp.bfloat16), n, ids


# ------------------------------------------------- incremental NAR decoder
def init_decoder_state(cfg: paraformer.ParaformerConfig, ocfg: OnlineConfig,
                       b: int = 1) -> Dict:
    """FunASR-style streaming decoder caches: per-layer FSMN token history
    (the last kernel−1 post-norm2 hiddens) + a bounded encoder-memory ring
    of the last decoder_look_back·c1 + window settled frames."""
    kc = cfg.kernel_size - 1
    mem = ocfg.decoder_look_back * ocfg.c1 + ocfg.window
    return {
        "fsmn": [jnp.zeros((b, kc, cfg.d_model))
                 for _ in range(cfg.decoder_layers)],
        "hist_len": jnp.zeros((b,), jnp.int32),      # tokens decoded so far
        "mem": jnp.zeros((b, mem, cfg.d_model)),
        "mem_len": jnp.zeros((b,), jnp.int32),
    }


def decoder_push_memory(dstate: Dict, enc_frames: jnp.ndarray,
                        n_valid: jnp.ndarray) -> Dict:
    """Append settled encoder frames to the bounded cross-attention ring.

    enc_frames: [B, F, D] (F static, e.g. the chunk's active region);
    n_valid: [B] valid rows of enc_frames this step (usually F)."""
    b, f, d = enc_frames.shape
    m = dstate["mem"].shape[1]
    mem = jnp.concatenate([dstate["mem"], enc_frames], axis=1)[:, -m:]
    out = dict(dstate)
    out["mem"] = mem
    out["mem_len"] = jnp.minimum(dstate["mem_len"] + n_valid, m)
    return out


def decode_chunk(params: nn.Params, dstate: Dict, new_embeds: jnp.ndarray,
                 n_new: jnp.ndarray, cfg: paraformer.ParaformerConfig
                 ) -> Tuple[Dict, jnp.ndarray]:
    """Incrementally decode newly fired CIF tokens (FunASR's streaming
    decoder shape: per-layer FSMN caches + bounded cross-attention).

    new_embeds: [B, K, D] (K static cap); n_new: [B] fired this chunk.
    Returns (dstate', token ids [B, K]). The FSMN's future taps see zeros
    (future tokens unknown) — identical to FunASR's online decode, and the
    reason streaming partials can differ from the offline NAR decode.
    """
    b, k, d = new_embeds.shape
    kc = cfg.kernel_size - 1
    left = (cfg.kernel_size - 1) // 2 + cfg.sanm_shift
    new_mask = nn.length_mask(n_new, k)
    x = new_embeds * new_mask[..., None]
    # the ring keeps valid frames RIGHT-aligned (concat+[-m:]) — mask the
    # left zero rows, not the right (round-2 review finding: a left-aligned
    # mask hid the real memory until the ring filled)
    m_ring = dstate["mem"].shape[1]
    mem_mask = (jnp.arange(m_ring)[None, :]
                >= (m_ring - dstate["mem_len"])[:, None]).astype(jnp.float32)
    new_fsmn = []
    for li, layer in enumerate(params["decoder"]["layers"]):
        residual = x
        h = nn.layernorm(layer["norm1"], x)
        h = nn.dec_ffn(layer["ffn"], h)
        h = nn.layernorm(layer["norm2"], h) * new_mask[..., None]
        # FSMN over [cache ‖ new tokens]: left taps see real history, right
        # taps see zeros beyond the fired tokens
        seq = jnp.concatenate([dstate["fsmn"][li], h], axis=1)  # [B, kc+K, D]
        # valid-history mask for the cache region (right-aligned)
        cpos = jnp.arange(kc)[None, :]
        cmask = (cpos >= kc - jnp.minimum(dstate["hist_len"], kc)[:, None])
        seq_mask = jnp.concatenate([cmask.astype(jnp.float32), new_mask], 1)
        seq = seq * seq_mask[..., None]
        # conv over [cache ‖ new] with only right zero-pad; new token i's
        # window [kc+i−left, kc+i−left+k−1] lands at output index kc+i−left
        conv = nn.conv1d({"w": layer["fsmn"]["w"]}, seq,
                         padding=(0, cfg.kernel_size - 1 - left), groups=d)
        conv = conv[:, kc - left: kc - left + k]
        fs = (conv + h) * new_mask[..., None]
        x = residual + fs
        residual = x
        h2 = nn.layernorm(layer["norm3"], x)
        x = residual + nn.cross_attention(layer["src_attn"], h2,
                                          dstate["mem"], cfg.n_heads,
                                          mem_mask)
        # cache update: last kc hiddens among [cache ‖ new valid tokens] —
        # shift by n_new (static-shape roll via gather)
        idx = (jnp.arange(kc)[None, :] + n_new[:, None])  # [B, kc]
        gathered = jnp.take_along_axis(
            jnp.concatenate([dstate["fsmn"][li], h], axis=1),
            jnp.minimum(idx, kc + k - 1)[..., None], axis=1)
        new_fsmn.append(gathered)
    fin = params["decoder"]["final"]
    x = nn.dec_ffn(fin["ffn"], nn.layernorm(fin["norm1"], x))
    x = nn.layernorm(params["decoder"]["after_norm"], x)
    logits = nn.linear(params["decoder"]["out"], x)
    ids = jnp.argmax(logits, axis=-1) * new_mask.astype(jnp.int32)
    out = dict(dstate)
    out["fsmn"] = new_fsmn
    out["hist_len"] = dstate["hist_len"] + n_new
    return out, ids


def flush_tail(state: Dict, tail_threshold: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Final tail fire (FunASR forward_chunk is_final): a virtual frame with
    α = tail_threshold and zero hidden. Returns (embed [B, d], fired [B])."""
    frac = state["cif_mass"] - jnp.floor(state["cif_mass"])
    fired = (frac + tail_threshold >= 1.0) & (frac > 0)
    return state["cif_acc"], fired


# ------------------------------------------------------------- recognizer
class OnlineRecognizer:
    """Incremental wav → partial/final text with FunASR streaming mechanics.

    Weight-compatible: `params` is the same pytree the offline converter
    produces (the online checkpoint shares the offline parameter structure).
    """

    def __init__(self, params, cfg: paraformer.ParaformerConfig, tokenizer,
                 ocfg: OnlineConfig = OnlineConfig(),
                 cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 partial_mode: str = "redecode",
                 fns: Optional[Dict[str, object]] = None):
        """partial_mode: "redecode" (default — NAR re-decode of all fired
        tokens over the bounded memory, O(K²)/utterance, converges) or
        "incremental" (FunASR-style fsmn-cached decode_chunk — O(K), each
        token decoded once with its chunk-time context).
        fns: optional SHARED jit-program cache. Instances created with the
        same dict (and equal cfg/ocfg) reuse one set of compiled programs
        instead of re-tracing per instance — the serving layer passes one
        module-level dict for hub-overflow sessions so a new overflow
        connection never traces in a serving thread (service/engines.py)."""
        self.params = params
        self.cfg = cfg
        self.ocfg = ocfg
        self.tokenizer = tokenizer
        self.partial_mode = partial_mode
        self.frontend = StreamingFrontend(cfg.frontend, cmvn)
        self._feat_queue = np.zeros((0, cfg.input_dim), np.float32)
        self._state = init_state(cfg, ocfg, b=1)
        self._dstate = init_decoder_state(cfg, ocfg, b=1)
        self._inc_ids: List[int] = []
        self._embeds: List[np.ndarray] = []
        self._memory = np.zeros((0, cfg.d_model), np.float32)
        self._fns: Dict[str, object] = {} if fns is None else fns

    # ---------------------------------------------------------- compiled
    def _step_fn(self):
        if "step" not in self._fns:
            cfg, ocfg = self.cfg, self.ocfg
            k_cap = ocfg.tokens_per_chunk

            def run(params, state, new_feats, active):
                state, enc = encode_chunk(params, state, new_feats, cfg, ocfg)
                state, embeds, n = predictor_chunk(params, enc, active, state,
                                                   cfg, k_cap)
                return state, enc, embeds, n

            self._fns["step"] = jax.jit(run)
        return self._fns["step"]

    # ------------------------------------------------------------ public
    def push_audio(self, audio: np.ndarray) -> str:
        feats = self.frontend.push(audio)
        if len(feats):
            self._feat_queue = np.concatenate([self._feat_queue, feats])
        c1 = self.ocfg.c1
        while len(self._feat_queue) >= c1:
            chunk, self._feat_queue = (self._feat_queue[:c1],
                                       self._feat_queue[c1:])
            self._run_chunk(chunk, n_valid=c1, final=False)
        return self.partial_text()

    def _active_mask(self, n_valid: int, final: bool) -> np.ndarray:
        ocfg = self.ocfg
        w = ocfg.window
        active = np.zeros((1, w), np.float32)
        if final:
            # drain: the cached lookahead frames + all valid new frames
            active[0, ocfg.c0: ocfg.c0 + ocfg.c2 + n_valid] = 1.0
        else:
            active[0, ocfg.c0: ocfg.c0 + ocfg.c1] = 1.0
        return active

    def _run_chunk(self, chunk: np.ndarray, n_valid: int, final: bool) -> None:
        c1 = self.ocfg.c1
        padded = np.zeros((1, c1, self.cfg.input_dim), np.float32)
        padded[0, :len(chunk)] = chunk
        self._state, enc, embeds, n_fired = self._step_fn()(
            self.params, self._state, jnp.asarray(padded),
            jnp.asarray(self._active_mask(n_valid, final)))
        n = int(n_fired[0])
        if n > 0:
            self._embeds.extend(np.asarray(embeds[0, :n]))
            self._embeds = self._embeds[: self.ocfg.max_tokens]
        # settled frames for the decoder memory: this window's active region
        # (each frame enters exactly once)
        enc_np = np.asarray(enc[0])
        if final:
            settled = enc_np[self.ocfg.c0: self.ocfg.c0 + self.ocfg.c2 + n_valid]
        else:
            settled = enc_np[self.ocfg.c0: self.ocfg.c0 + self.ocfg.c1]
        self._memory = np.concatenate(
            [self._memory, settled])[-self.ocfg.max_memory_frames:]
        if self.partial_mode == "incremental":
            self._dstate = decoder_push_memory(
                self._dstate, jnp.asarray(settled[None]),
                jnp.asarray([len(settled)], jnp.int32))
            if n > 0:
                self._decode_incremental(embeds, n)

    def _decode_incremental(self, embeds, n: int) -> None:
        self._dstate, ids = self._inc_fn()(
            self.params, self._dstate, embeds,
            jnp.asarray([n], jnp.int32))
        self._inc_ids.extend(np.asarray(ids)[0, :n].tolist())

    def _inc_fn(self):
        if "inc" not in self._fns:
            cfg = self.cfg
            self._fns["inc"] = jax.jit(
                lambda p, d, e, m: decode_chunk(p, d, e, m, cfg))
        return self._fns["inc"]

    def _decode_current(self) -> List[int]:
        from .paraformer_streaming import nar_redecode
        return nar_redecode(self.params, self.cfg, self._fns, self._embeds,
                            self._memory)

    def partial_text(self) -> str:
        if self.partial_mode == "incremental":
            return self.tokenizer.ids_to_text(self._inc_ids)
        return self.tokenizer.ids_to_text(self._decode_current())

    def finalize(self) -> str:
        """Drain the frontend lookahead, the partial feature queue and the
        encoder lookahead, then apply the tail-threshold fire (fixes the
        round-1 ADVICE finding: finalize previously dropped up to ~0.4 s)."""
        feats = self.frontend.flush()
        if len(feats):
            self._feat_queue = np.concatenate([self._feat_queue, feats])
        c1 = self.ocfg.c1
        while len(self._feat_queue) > c1:
            chunk, self._feat_queue = (self._feat_queue[:c1],
                                       self._feat_queue[c1:])
            self._run_chunk(chunk, n_valid=c1, final=False)
        # final (possibly partial) chunk drains the cached lookahead too
        self._run_chunk(self._feat_queue, n_valid=len(self._feat_queue),
                        final=True)
        self._feat_queue = np.zeros((0, self.cfg.input_dim), np.float32)
        acc, fired = flush_tail(self._state, self.cfg.predictor_tail_threshold)
        if bool(fired[0]) and len(self._embeds) < self.ocfg.max_tokens:
            self._embeds.append(np.asarray(acc[0]))
            if self.partial_mode == "incremental":
                buf = np.zeros((1, self.ocfg.tokens_per_chunk,
                                self.cfg.d_model), np.float32)
                buf[0, 0] = np.asarray(acc[0])
                self._decode_incremental(jnp.asarray(buf), 1)
        text = self.partial_text()
        self.reset()
        return text

    def reset(self) -> None:
        self.frontend.reset()
        self._feat_queue = np.zeros((0, self.cfg.input_dim), np.float32)
        self._state = init_state(self.cfg, self.ocfg, b=1)
        self._dstate = init_decoder_state(self.cfg, self.ocfg, b=1)
        self._inc_ids = []
        self._embeds = []
        self._memory = np.zeros((0, self.cfg.d_model), np.float32)
