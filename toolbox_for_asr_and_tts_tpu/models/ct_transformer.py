"""CT-Transformer: controllable time-delay transformer for punctuation.

TPU-native re-implementation of the model behind ModelScope
`punc_ct-transformer_cn-en-common-vocab471067-large`, which the reference
loads as its punctuation restorer (voice-service/app/services/
voice_interface.py:637-642,812-825).

Structure (FunASR CT_Transformer):
    token embedding (word vocab, 471067 for the large model)
    → SAN-M encoder stack (same layer as models/paraformer.py's encoder)
    → linear → punctuation-class logits per token.

Punctuation classes follow FunASR's convention:
    0 <unk>   1 _ (none)   2 ，   3 。   4 ？   5 、
(up to `punc_size`; class 1 = no punctuation after this token).

Prediction is per input token: the service inserts `punc_list[c]` after token
i when c > 1. Inference is offline on the finalized utterance (the reference
applies punctuation only at finalize through its diarization pipeline).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

DEFAULT_PUNC_LIST = ("<unk>", "_", "，", "。", "？", "、")


@dataclasses.dataclass(frozen=True)
class CTTransformerConfig:
    vocab_size: int = 471067
    embed_dim: int = 256
    d_model: int = 512
    n_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 12
    kernel_size: int = 11
    sanm_shift: int = 0
    punc_size: int = 6
    punc_list: Tuple[str, ...] = DEFAULT_PUNC_LIST
    # the "controllable time-delay": each position attends at most this many
    # future tokens (−1 = unlimited, offline). Bounding it gives the
    # fixed-latency streaming-punctuation behavior the CT in the model's
    # name refers to.
    right_context: int = -1

    @classmethod
    def from_funasr(cls, conf: dict, **overrides) -> "CTTransformerConfig":
        """Build the config from a FunASR checkpoint's own config.yaml
        (`encoder_conf` geometry + `model_conf.punc_list`), so a mounted
        real `punc_ct-transformer_..._large` dir pins layer count / dims
        instead of this file's defaults."""
        kw = {}
        enc = conf.get("encoder_conf", {}) or {}
        for src, dst in (("attention_heads", "n_heads"),
                         ("linear_units", "ffn_dim"),
                         ("num_blocks", "num_layers"),
                         ("output_size", "d_model"),
                         ("input_size", "embed_dim"),
                         ("kernel_size", "kernel_size"),
                         ("sanm_shift", "sanm_shift")):
            if src in enc:
                kw[dst] = enc[src]
        mc = conf.get("model_conf", {}) or {}
        punc = mc.get("punc_list") or conf.get("punc_list")
        if punc:
            kw["punc_list"] = tuple(punc)
            kw["punc_size"] = len(punc)
        if "vocab_size" in mc:
            kw["vocab_size"] = mc["vocab_size"]
        kw.update(overrides)
        return cls(**kw)


def init_params(key, cfg: CTTransformerConfig) -> nn.Params:
    keys = jax.random.split(key, 2 * cfg.num_layers + 3)
    layers = []
    ki = 0
    for i in range(cfg.num_layers):
        d_in = cfg.embed_dim if i == 0 else cfg.d_model
        layers.append({
            "norm1": nn.layernorm_init(d_in),
            "attn": nn.sanm_attention_init(keys[ki], d_in, cfg.d_model,
                                           cfg.n_heads, cfg.kernel_size),
            "norm2": nn.layernorm_init(cfg.d_model),
            "ffn": nn.ffn_init(keys[ki + 1], cfg.d_model, cfg.ffn_dim),
        })
        ki += 2
    return {
        "embed": nn.embedding_init(keys[ki], cfg.vocab_size, cfg.embed_dim),
        "encoder": {"layers": layers, "after_norm": nn.layernorm_init(cfg.d_model)},
        "out": nn.linear_init(keys[ki + 1], cfg.d_model, cfg.punc_size),
    }


def forward(params: nn.Params, token_ids: jnp.ndarray, lengths: jnp.ndarray,
            cfg: CTTransformerConfig) -> jnp.ndarray:
    """token_ids [B, T] int32 → punct logits [B, T, punc_size]."""
    t = token_ids.shape[1]
    mask = nn.length_mask(lengths, t)
    att_mask = None
    if cfg.right_context >= 0:
        # [B, Tq, Tk]: key visible iff valid AND k ≤ q + right_context
        q = jnp.arange(t)[:, None]
        k = jnp.arange(t)[None, :]
        delay = (k <= q + cfg.right_context).astype(jnp.float32)
        att_mask = mask[:, None, :] * delay[None]
    # the FSMN memory conv must honor the delay bound too: shift its window
    # so it reads at most right_context future frames
    shift = cfg.sanm_shift
    if cfg.right_context >= 0:
        half = (cfg.kernel_size - 1) // 2
        shift = max(shift, half - min(cfg.right_context, half))
    x = nn.embedding(params["embed"], token_ids)
    x = x * (cfg.d_model ** 0.5)
    x = x + nn.sinusoidal_posenc(t, x.shape[-1])[None]
    for i, layer in enumerate(params["encoder"]["layers"]):
        residual = x
        h = nn.layernorm(layer["norm1"], x)
        h = nn.sanm_attention(layer["attn"], h, cfg.n_heads, mask,
                              cfg.kernel_size, shift,
                              att_mask=att_mask)
        x = h if (i == 0 and cfg.embed_dim != cfg.d_model) else residual + h
        residual = x
        x = residual + nn.ffn(layer["ffn"], nn.layernorm(layer["norm2"], x))
    x = nn.layernorm(params["encoder"]["after_norm"], x)
    return nn.linear(params["out"], x)


# ---------------------------------------------------------------- service
class PuncVocab:
    """Word/char → id mapping for the punctuation model's own vocab."""

    def __init__(self, tokens: Sequence[str], unk: str = "<unk>"):
        self.tokens = list(tokens)
        self.token_to_id = {t: i for i, t in enumerate(self.tokens)}
        self.unk_id = self.token_to_id.get(unk, 0)

    @classmethod
    def dummy(cls, size: int = 4096) -> "PuncVocab":
        toks = ["<unk>"] + [chr(0x4E00 + i) for i in range(size - 1)]
        return cls(toks)

    @classmethod
    def load(cls, path: str) -> "PuncVocab":
        import json
        if path.endswith(".json"):
            with open(path, encoding="utf-8") as f:
                return cls(json.load(f))
        with open(path, encoding="utf-8") as f:
            return cls([ln.rstrip("\n").split()[0] for ln in f if ln.strip()])

    def encode(self, words: Sequence[str]) -> List[int]:
        return [self.token_to_id.get(w, self.unk_id) for w in words]


def split_words(text: str) -> List[str]:
    """CJK chars as single tokens; latin/digit runs as words (FunASR
    split_words equivalent for mixed zh/en text)."""
    words: List[str] = []
    buf = ""
    for ch in text:
        if ch.isascii() and (ch.isalnum() or ch in "'-"):
            buf += ch
        else:
            if buf:
                words.append(buf)
                buf = ""
            if not ch.isspace():
                words.append(ch)
    if buf:
        words.append(buf)
    return words


class Punctuator:
    """Text → punctuated text, one compiled program per length bucket."""

    def __init__(self, params, cfg: CTTransformerConfig, vocab: PuncVocab,
                 buckets: Sequence[int] = (16, 32, 64, 128, 256, 512)):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        from ..runtime.bucketing import Bucketer
        self.bucketer = Bucketer(tuple(buckets))
        self._fns: Dict[int, object] = {}

    @classmethod
    def random(cls, cfg: Optional[CTTransformerConfig] = None, seed: int = 0,
               vocab: Optional[PuncVocab] = None) -> "Punctuator":
        cfg = cfg or CTTransformerConfig(vocab_size=4096, num_layers=2,
                                         d_model=64, embed_dim=64,
                                         n_heads=2, ffn_dim=128)
        params = init_params(jax.random.PRNGKey(seed), cfg)
        return cls(params, cfg, vocab or PuncVocab.dummy(cfg.vocab_size))

    @classmethod
    def from_model_dir(cls, model_dir: str,
                       cfg: Optional[CTTransformerConfig] = None
                       ) -> "Punctuator":
        """Converted `punc_ct-transformer_...-large` checkpoint dir. With no
        explicit cfg, geometry comes from the dir's own config.yaml."""
        import os
        import jax as _jax
        from ..runtime import checkpoints as ckpt
        cfg = cfg or CTTransformerConfig.from_funasr(
            ckpt.load_model_config(model_dir))
        template = init_params(_jax.random.PRNGKey(0), cfg)
        params = ckpt.convert_or_load_cached(
            model_dir, template, ckpt.ct_transformer_rules(cfg.num_layers))
        vocab = None
        for cand in ("tokens.json", "tokens.txt"):
            p = os.path.join(model_dir, cand)
            if os.path.exists(p):
                vocab = PuncVocab.load(p)
                break
        return cls(params, cfg, vocab or PuncVocab.dummy(cfg.vocab_size))

    def _fn(self, b: int, t: int):
        if (b, t) not in self._fns:
            self._fns[(b, t)] = jax.jit(
                lambda p, ids, ln: forward(p, ids, ln, self.cfg))
        return self._fns[(b, t)]

    def classify(self, words: Sequence[str]) -> "np.ndarray":
        """Per-word punctuation class ids (0 <unk>, 1 none, 2 ，, 3 。, …) —
        the raw decision the diarizer uses for sentence boundaries."""
        if not words:
            return np.zeros((0,), np.int64)
        ids = self.vocab.encode(list(words))
        t = self.bucketer.bucket(len(ids))
        arr = np.zeros((1, t), np.int32)
        n = min(len(ids), t)
        arr[0, :n] = ids[:n]
        logits = self._fn(1, t)(self.params, jnp.asarray(arr),
                                jnp.asarray([n], np.int32))
        cls = np.asarray(jnp.argmax(logits[0, :n], axis=-1))
        out = np.ones((len(words),), np.int64)
        out[:n] = cls
        return out

    def punctuate(self, text: str) -> str:
        return self.punctuate_many([text])[0]

    def punctuate_many(self, texts: Sequence[str]) -> List[str]:
        """Punctuate a BATCH of utterances with one device call per
        (batch-bucket, length-bucket) pair — the finalize hub pushes every
        concurrent session's sentences through here instead of one
        round trip per sentence (cross-session batching, round 3)."""
        words_list = [split_words(t) for t in texts]
        out_texts = list(texts)
        groups: Dict[int, list] = {}
        for i, words in enumerate(words_list):
            if not words:
                continue
            ids = self.vocab.encode(words)
            groups.setdefault(self.bucketer.bucket(len(ids)),
                              []).append((i, ids))
        for t, items in sorted(groups.items()):
            b = 1 << max(len(items) - 1, 0).bit_length()  # pow-2 batch
            arr = np.zeros((b, t), np.int32)
            lens = np.zeros((b,), np.int32)
            for r, (i, ids) in enumerate(items):
                n = min(len(ids), t)
                arr[r, :n] = ids[:n]
                lens[r] = n
            logits = self._fn(b, t)(self.params, jnp.asarray(arr),
                                    jnp.asarray(lens))
            cls = np.asarray(jnp.argmax(logits, axis=-1))
            for r, (i, ids) in enumerate(items):
                out_texts[i] = self._render(words_list[i],
                                            cls[r, : int(lens[r])])
        return out_texts

    def _render(self, words, cls_ids) -> str:
        n = len(cls_ids)
        out = []
        for w, c in zip(words[:n], cls_ids):
            out.append(w)
            if c > 1 and int(c) < len(self.cfg.punc_list):
                out.append(self.cfg.punc_list[int(c)])
        out.extend(words[n:])
        # rejoin with latin-aware spacing (split_words discarded whitespace;
        # plain "".join fused English words — round-2 review finding)
        s = ""
        prev_latin = False
        for p in out:
            latin = p[:1].isascii() and p[:1].isalnum()
            if s and prev_latin and latin:
                s += " "
            s += p
            prev_latin = latin
        # sentence-final normalization: ensure terminal punctuation
        if s and s[-1] not in "。？！，、":
            s += "。"
        return s
