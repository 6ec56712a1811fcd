"""TTS synthesis pipeline: text → segments → phonemes → mel → waveform.

TPU-native replacement for the reference's per-segment ModelScope pipeline
calls (tts-service/app/services/tts_service.py:507-936). Design differences,
per the survey §7 build plan:

- Sambert acoustic model + HiFi-GAN vocoder run as ONE fused jitted program
  per phoneme-length bucket (`acoustic → length-regulate → vocoder`).
- Segments of a job are synthesized as a single padded batch on the mesh
  (replacing the reference's serial loop / optional thread fan-out,
  tts_service.py:563-585) — real batching instead of Python threads.
- Crossfade/pause concatenation stays on host (tts/concat.py).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import hifigan, sambert
from ..runtime.bucketing import Bucketer
from ..runtime.config import TTSConfig
from ..runtime.metrics import RTFMeter, timing_log
from .concat import StreamingConcat, concat_segments
from .text_frontend import (G2P, LingVocab, pause_after, split_text_for_tts,
                            text_to_ling_ids)

logger = logging.getLogger("toolbox.tts")

PHONE_BUCKETS = (16, 32, 48, 64, 96, 128)

VOICES = ("zhitian_emo", "zhizhe_emo", "zhiyan_emo", "zhibei_emo")


def scan_tts_package(model_dir: str, voice: str
                     ) -> Tuple[Optional[str], Optional[str]]:
    """Locate the (acoustic, vocoder) torch checkpoints in a mounted
    ModelScope sambert-hifigan package.

    KAN-TTS packages keep per-voice checkpoints under e.g.
    `voices/<voice>/am/ckpt/checkpoint_*.pth` and `…/voc/ckpt/…`, with base
    models under `basemodel_16k/{sambert,hifigan}` — the exact nesting
    varies by package revision, so this scans by path tokens: a path segment
    equal to `voc`/containing `hifigan|vocoder` marks the vocoder, one equal
    to `am`/containing `sambert|acoustic` the acoustic model. Among
    candidates, the requested voice's path wins, then the highest checkpoint
    step number."""
    import os
    import re

    am, voc = [], []
    for root, _, files in os.walk(model_dir):
        for f in files:
            if f.endswith(".jax.npz"):
                # converted cache without its source ckpt still loads: report
                # the (possibly deleted) source path the cache sits next to
                f = f[:-len(".jax.npz")]
                if f in files:
                    continue
            elif not f.endswith((".pth", ".pt", ".bin")):
                continue
            p = os.path.join(root, f)
            segs = [s.lower() for s in
                    os.path.relpath(p, model_dir).split(os.sep)]
            if any(s == "voc" or "hifigan" in s or "vocoder" in s
                   for s in segs):
                voc.append(p)
            elif any(s == "am" or "sambert" in s or "acoustic" in s
                     for s in segs):
                am.append(p)

    def pick(cands):
        if not cands:
            return None

        def score(p):
            nums = re.findall(r"(\d+)", os.path.basename(p))
            return (voice.lower() in p.lower(),
                    int(nums[-1]) if nums else -1)

        return max(cands, key=score)

    return pick(am), pick(voc)


def _nearest_config(ckpt_path: str, model_dir: str) -> dict:
    """The config file closest to a checkpoint, walking up to the package
    root (KAN-TTS keeps `config.yaml` next to each ckpt dir)."""
    import os

    from ..runtime import checkpoints as ckpt
    d = os.path.dirname(os.path.abspath(ckpt_path))
    top = os.path.abspath(model_dir)
    while True:
        conf = ckpt.load_model_config(d)
        if conf:
            return conf
        if d == top:
            return {}
        parent = os.path.dirname(d)
        if parent == d:
            return {}
        d = parent


@dataclasses.dataclass
class SynthesisResult:
    wav: np.ndarray
    sample_rate: int
    segments: List[str]
    seg_times_ms: List[float]
    seg_durations_s: List[float]
    rtf: float


class Synthesizer:
    def __init__(self, acoustic_params, acoustic_cfg: sambert.SambertConfig,
                 vocoder_params, vocoder_cfg: hifigan.HifiGanConfig,
                 g2p: Optional[G2P] = None,
                 vocab: Optional[LingVocab] = None,
                 tts_cfg: Optional[TTSConfig] = None,
                 voices: Sequence[str] = VOICES,
                 param_dtype=None,
                 use_mesh: bool = False):
        if param_dtype is not None:
            cast = lambda a: jnp.asarray(a, param_dtype)  # noqa: E731
            acoustic_params = jax.tree.map(cast, acoustic_params)
            vocoder_params = jax.tree.map(cast, vocoder_params)
        self.mesh = None
        if use_mesh:
            from ..runtime.mesh import replicated_sharding, serving_mesh
            self.mesh = serving_mesh()
            if self.mesh is not None:
                rep = replicated_sharding(self.mesh)
                put = lambda a: jax.device_put(a, rep)  # noqa: E731
                acoustic_params = jax.tree.map(put, acoustic_params)
                vocoder_params = jax.tree.map(put, vocoder_params)
        self.ap, self.acfg = acoustic_params, acoustic_cfg
        self.vp, self.vcfg = vocoder_params, vocoder_cfg
        self.g2p = g2p or G2P()
        self.vocab = vocab or LingVocab.default()
        self.cfg = tts_cfg or TTSConfig()
        self.voice_to_id = {v: i % acoustic_cfg.n_speakers
                            for i, v in enumerate(voices)}
        import os

        # dispatch-bound knobs: explicit env wins, else the startup RTT
        # probe picks the profile (tunnel → fewest round trips, local →
        # least padding; runtime/autotune.py)
        from ..runtime.autotune import env_or_profile
        self.group_by_length = env_or_profile("TTS_GROUP_BY_LENGTH",
                                              "tts_group_by_length")
        # "nar" (fast mode, default) or "pnca" (KAN-TTS AR decoder — the
        # weight-compatible path for real zhitian_emo checkpoints)
        self.decoder_mode = os.getenv("TTS_DECODER", "nar")
        self.two_phase = os.getenv("TTS_TWO_PHASE", "1") in ("1", "true")
        self.mel_group = env_or_profile("TTS_MEL_GROUP", "tts_mel_group")
        self.bucketer = Bucketer(PHONE_BUCKETS)
        self._fns: Dict[Tuple[int, int], object] = {}
        self.rtf = RTFMeter()
        self.sample_rate = self.cfg.sampling_rate

    @classmethod
    def from_model_dir(cls, model_dir: str, voice: str = "zhitian_emo",
                       **kw) -> "Synthesizer":
        """Load a mounted `speech_sambert-hifigan_tts_zh-cn_16k` package
        (reference tts_service.py:34-38,143-177): scan the KAN-TTS layout for
        the voice's acoustic + vocoder checkpoints, pin geometry from each
        checkpoint's own config file AND its tensor shapes, convert through
        runtime/checkpoints name maps (npz-cached next to each checkpoint),
        and default to the weight-compatible PNCA decoder.
        """
        import dataclasses as _dc
        import json
        import os

        from ..runtime import checkpoints as ckpt

        am_path, voc_path = scan_tts_package(model_dir, voice)
        if am_path is None or voc_path is None:
            raise FileNotFoundError(
                f"no acoustic/vocoder checkpoint pair under {model_dir} "
                f"(am={am_path}, voc={voc_path})")

        def load(path, cfg_cls, from_conf, pin_from_sd, build, rules_for,
                 **conv_kw):
            cache, cfg_f = path + ".jax.npz", path + ".jax.cfg.json"
            if os.path.exists(cache) and os.path.exists(cfg_f):
                with open(cfg_f, encoding="utf-8") as f:
                    raw = json.load(f)
                fixed = {k: tuple(tuple(x) if isinstance(x, list) else x
                                  for x in v) if isinstance(v, list) else v
                         for k, v in raw.items()}
                cfg = cfg_cls(**fixed)
                return cfg, ckpt.load_converted(cache, build(cfg))
            sd = ckpt.load_torch_state_dict(path)
            if conv_kw.get("pre_transform") is not None:
                sd = conv_kw.pop("pre_transform")(sd)
            cfg = pin_from_sd(sd, from_conf(_nearest_config(path, model_dir)))
            params = ckpt.convert_state_dict(sd, rules_for(cfg), build(cfg),
                                             **conv_kw)
            try:
                ckpt.save_converted(cache, params)
                with open(cfg_f, "w", encoding="utf-8") as f:
                    json.dump(_dc.asdict(cfg), f)
            except OSError:
                logger.warning("could not cache converted TTS params at %s",
                               cache)
            return cfg, params

        acfg, ap = load(
            am_path, sambert.SambertConfig, sambert.SambertConfig.from_kantts,
            sambert.config_from_state_dict,
            lambda c: sambert.init_params(jax.random.PRNGKey(0), c),
            lambda c: ckpt.sambert_rules(c.encoder_layers, c.pnca_layers,
                                         c.postnet_layers),
            keep_missing=True,  # NAR fast-mode decoder is framework-only
            pre_transform=ckpt.fold_batch_norm)  # real postnet is BN
        vcfg, vp = load(
            voc_path, hifigan.HifiGanConfig, hifigan.HifiGanConfig.from_config,
            hifigan.config_from_state_dict,
            lambda c: hifigan.init_params(jax.random.PRNGKey(1), c),
            lambda c: ckpt.hifigan_rules(len(c.upsample_rates),
                                         len(c.resblock_kernels),
                                         len(c.resblock_dilations[0])),
            pre_transform=ckpt.fold_weight_norm)
        logger.info("TTS checkpoints loaded: am=%s (%d phones, %dL enc/%dL "
                    "pnca) voc=%s (hop %d)", am_path, acfg.vocab_size,
                    acfg.encoder_layers, acfg.pnca_layers, voc_path,
                    vcfg.hop_length)
        synth = cls(ap, acfg, vp, vcfg, **kw)
        if len(synth.vocab) != acfg.vocab_size:
            # the package's phone inventory (inside its resource bundle) and
            # our frontend's must be reconciled symbol-by-symbol; size drift
            # means ids would address the wrong embedding rows
            logger.warning(
                "frontend phone vocab (%d) != checkpoint embedding rows (%d)"
                " — map the package's phone list onto tts/pinyin_data.py or "
                "pass vocab= explicitly", len(synth.vocab), acfg.vocab_size)
        if "TTS_DECODER" not in os.environ:
            # real checkpoints only map onto the PNCA AR decoder
            synth.decoder_mode = "pnca"
        return synth

    @classmethod
    def random(cls, seed: int = 0, tiny: bool = True, **kw) -> "Synthesizer":
        vocab = LingVocab.default()
        if tiny:
            acfg = sambert.SambertConfig(
                vocab_size=len(vocab), d_model=32, n_heads=2, ffn_dim=64,
                encoder_layers=1, decoder_layers=1, var_channels=32,
                postnet_channels=32, frames_per_phone=8)
            vcfg = hifigan.HifiGanConfig(
                upsample_initial_channel=32, upsample_rates=(5, 5, 4, 2),
                upsample_kernels=(11, 11, 8, 4), resblock_kernels=(3,),
                resblock_dilations=((1, 3),))
        else:
            acfg = sambert.SambertConfig(vocab_size=len(vocab))
            vcfg = hifigan.HifiGanConfig()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return cls(sambert.init_params(k1, acfg), acfg,
                   hifigan.init_params(k2, vcfg), vcfg, vocab=vocab, **kw)

    # ---------------------------------------------------------- compiled
    MEL_BUCKET = 64  # static t_mel granularity for the two-phase path

    def _fn(self, b: int, l: int, t_mel: Optional[int] = None):
        key = (b, l, t_mel)
        if key not in self._fns:
            acfg, vcfg = self.acfg, self.vcfg
            acoustic = (sambert.forward_ar if self.decoder_mode == "pnca"
                        else sambert.forward)

            def run(ap, vp, ids, lens, spk):
                out = acoustic(ap, ids, lens, spk, acfg, t_mel=t_mel)
                wav = hifigan.forward(vp, out["mel"], vcfg)
                # int16 on device: 4× less host-transfer than f32, and it is
                # the final PCM format anyway
                pcm = jnp.clip(jnp.round(wav * 32767.0), -32768, 32767
                               ).astype(jnp.int16)
                return pcm, out["mel_lens"]

            if self.mesh is not None:
                from ..runtime.mesh import batch_sharding, replicated_sharding
                rep = replicated_sharding(self.mesh)
                sh = batch_sharding(self.mesh)
                self._fns[key] = jax.jit(
                    run, in_shardings=(rep, rep, sh, sh, sh))
            else:
                self._fns[key] = jax.jit(run)
        return self._fns[key]

    def _dur_fn(self, b: int, l: int):
        key = ("dur", b, l)
        if key not in self._fns:
            acfg = self.acfg
            self._fns[key] = jax.jit(
                lambda ap, ids, lens, spk: sambert.predict_mel_lens(
                    ap, ids, lens, spk, acfg))
        return self._fns[key]

    # ------------------------------------------------------------ public
    def synthesize_segments(self, segments: Sequence[str], voice: str
                            ) -> Tuple[List[np.ndarray], List[float]]:
        """Batch-synthesize text segments → per-segment waveforms.

        Segments are grouped by phone-length bucket so short segments don't
        pad (and transfer) at the longest segment's mel length; original
        order is restored on return."""
        spk_id = self.voice_to_id.get(voice, 0)
        ids_list = [text_to_ling_ids(s, self.g2p, self.vocab)
                    for s in segments]
        groups: Dict[int, List[int]] = {}
        if self.group_by_length:
            # one device call per length bucket: less padding compute, more
            # round trips — wins on direct-attached TPUs
            for idx, seq in enumerate(ids_list):
                groups.setdefault(self.bucketer.bucket(max(len(seq), 1)),
                                  []).append(idx)
        else:
            # one device call for the whole batch: fewest round trips — wins
            # when host↔device latency dominates (measured on the dev tunnel:
            # 0.086 vs 0.106 RTF for grouped)
            l_all = self.bucketer.bucket(
                max(max((len(s) for s in ids_list), default=1), 1))
            groups[l_all] = list(range(len(ids_list)))
        hop = self.vcfg.hop_length
        wavs: List[Optional[np.ndarray]] = [None] * len(segments)
        durs: List[float] = [0.0] * len(segments)
        t0 = time.perf_counter()
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        for l, idxs in sorted(groups.items()):
            # exact batch rows: b ≤ cfg.batch_size and l has ~6 buckets, so
            # the compiled-program space stays small without padding rows
            # (padded rows would synthesize full-length garbage mels); on a
            # mesh, rows pad up to the device count so the batch axis shards
            b = -(-len(idxs) // n_dev) * n_dev
            ids = np.zeros((b, l, 4), np.int32)
            lens = np.ones((b,), np.int32)
            for row, idx in enumerate(idxs):
                seq = ids_list[idx]
                n = min(len(seq), l)
                if n:
                    ids[row, :n] = np.asarray(seq[:n], np.int32)
                lens[row] = max(n, 1)
            spk = np.full((b,), spk_id, np.int32)
            # two-phase: a cheap duration probe picks tight static t_mel
            # buckets, so the decoder/vocoder neither compute nor transfer
            # the ~2× padding of the frames_per_phone worst case; rows are
            # re-grouped by PREDICTED mel bucket so short segments don't pad
            # (and transfer) at the longest row's length
            t_cap = l * self.acfg.frames_per_phone
            mb = self.MEL_BUCKET
            if self.two_phase:
                probe = np.asarray(self._dur_fn(b, l)(
                    self.ap, jnp.asarray(ids), jnp.asarray(lens),
                    jnp.asarray(spk)))
                t_rows = np.minimum(-(-probe // mb) * mb, t_cap)
                t_rows = np.maximum(t_rows, mb).astype(int)
                mel_groups: Dict[int, List[int]] = {}
                if self.mel_group and self.mesh is None:
                    # per-mel-bucket calls: least padding, more round trips —
                    # wins on direct-attached TPUs (tunnel: 0.070 vs 0.061)
                    for row in range(b):
                        mel_groups.setdefault(int(t_rows[row]), []).append(row)
                else:
                    mel_groups[int(t_rows.max())] = list(range(b))
            else:
                mel_groups = {t_cap: list(range(b))}
            for t_mel, rows in sorted(mel_groups.items()):
                bg = len(rows)
                pcm, mel_lens = self._fn(bg, l, t_mel)(
                    self.ap, self.vp, jnp.asarray(ids[rows]),
                    jnp.asarray(lens[rows]), jnp.asarray(spk[rows]))
                mel_lens = np.asarray(mel_lens)
                pcm = np.asarray(pcm)
                for g_row, row in enumerate(rows):
                    if row >= len(idxs):
                        continue  # mesh padding row — no segment behind it
                    idx = idxs[row]
                    n = int(mel_lens[g_row]) * hop
                    wavs[idx] = pcm[g_row, :n].astype(np.float32) / 32767.0
                    durs[idx] = n / self.sample_rate
        timing_log("tts_batch_synthesis", (time.perf_counter() - t0) * 1000)
        return wavs, durs

    def synthesize(self, text: str, voice: str = "zhitian_emo",
                   cancelled=lambda: False) -> Optional[SynthesisResult]:
        """Full job: split → batch synth → pause/crossfade concat.

        `cancelled` is polled between stages (cooperative cancel, reference
        tts_service.py:590-591,692-694)."""
        segments = split_text_for_tts(text, self.cfg.seg_target,
                                      self.cfg.seg_first, self.cfg.seg_hard_max)
        if not segments:
            return SynthesisResult(np.zeros(0, np.float32), self.sample_rate,
                                   [], [], [], 0.0)
        if cancelled():
            return None
        t0 = time.perf_counter()
        seg_wavs: List[np.ndarray] = []
        seg_durs: List[float] = []
        seg_times: List[float] = []
        bs = max(1, self.cfg.batch_size)
        for i in range(0, len(segments), bs):
            if cancelled():
                return None
            ts = time.perf_counter()
            wavs, durs = self.synthesize_segments(segments[i:i + bs], voice)
            dt = (time.perf_counter() - ts) * 1000 / max(len(wavs), 1)
            seg_wavs += wavs
            seg_durs += durs
            seg_times += [dt] * len(wavs)
        pauses = [pause_after(s, self.cfg.pause_soft_ms, self.cfg.pause_hard_ms)
                  for s in segments[:-1]]
        wav = concat_segments(seg_wavs, pauses, self.sample_rate,
                              self.cfg.crossfade_ms)
        proc_s = time.perf_counter() - t0
        audio_s = len(wav) / self.sample_rate
        rtf = self.rtf.record(proc_s, max(audio_s, 1e-6), label="tts_job")
        return SynthesisResult(wav, self.sample_rate, segments,
                               seg_times, seg_durs, rtf)

    def synthesize_stream(self, text: str, voice: str = "zhitian_emo",
                          cancelled=lambda: False):
        """Streaming job: yield audio chunks as segments finish, instead of
        holding the whole waveform until the job completes.

        The reference has no streaming TTS — its job API returns one base64
        WAV after the full pipeline (tts_service.py:507-936), so time-to-
        first-audio equals whole-job latency. Here the FIRST segment is
        synthesized alone (one small fast program) and the remaining segments
        in normal batches, with an incremental crossfade/pause concatenator
        (`StreamingConcat`) emitting every sample as soon as the next
        boundary can no longer change it. Concatenating all yielded chunks
        reproduces `synthesize()` — bit-exact under per-segment grouping
        (TTS_GROUP_BY_LENGTH/TTS_MEL_GROUP, the direct-attached profile,
        locked by tests/test_tts_stream.py); under whole-batch grouping the
        first segment runs at its own (smaller) padded bucket, which can
        differ in float low bits only.

        Yields dicts:
          {"event": "chunk", "audio": float32[n], "segment_index": i,
           "n_segments": N, "text": <segment>}        — per finished segment
          {"event": "done", "audio": <held tail>, "rtf": …,
           "duration_s": …, "segments": […], "seg_times_ms": […],
           "seg_durations_s": […]}                    — exactly once, last
        Returns early (no "done" event) when `cancelled()` turns true.
        """
        segments = split_text_for_tts(text, self.cfg.seg_target,
                                      self.cfg.seg_first,
                                      self.cfg.seg_hard_max)
        if not segments:
            yield {"event": "done", "audio": np.zeros(0, np.float32),
                   "rtf": 0.0, "duration_s": 0.0, "segments": [],
                   "seg_times_ms": [], "seg_durations_s": []}
            return
        pauses = [pause_after(s, self.cfg.pause_soft_ms,
                              self.cfg.pause_hard_ms)
                  for s in segments[:-1]]
        stream = StreamingConcat(self.sample_rate, self.cfg.crossfade_ms)
        t0 = time.perf_counter()
        emitted = 0
        seg_times: List[float] = []
        seg_durs: List[float] = []
        bs = max(1, self.cfg.batch_size)
        # first segment alone: its (1, shortest-bucket) program is the
        # cheapest possible first dispatch → minimal time-to-first-audio
        batches = [[segments[0]]]
        batches += [segments[i:i + bs] for i in range(1, len(segments), bs)]
        done = 0
        for batch in batches:
            if cancelled():
                return
            ts = time.perf_counter()
            wavs, durs = self.synthesize_segments(batch, voice)
            dt = (time.perf_counter() - ts) * 1000 / max(len(wavs), 1)
            seg_times += [dt] * len(wavs)
            seg_durs += durs
            for seg_text, w in zip(batch, wavs):
                fed = stream.segments_fed
                chunk = stream.feed(
                    w, pauses[fed - 1] if fed >= 1 and fed - 1 < len(pauses)
                    else 0)
                idx = done
                done += 1
                if len(chunk):
                    emitted += len(chunk)
                    yield {"event": "chunk", "audio": chunk,
                           "segment_index": idx, "n_segments": len(segments),
                           "text": seg_text}
        tail = stream.flush()
        emitted += len(tail)
        proc_s = time.perf_counter() - t0
        audio_s = emitted / self.sample_rate
        rtf = self.rtf.record(proc_s, max(audio_s, 1e-6), label="tts_job")
        yield {"event": "done", "audio": tail, "rtf": rtf,
               "duration_s": audio_s, "segments": segments,
               "seg_times_ms": seg_times, "seg_durations_s": seg_durs}
