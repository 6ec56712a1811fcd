"""Fine-tune the Paraformer on (wav, text) pairs, with checkpoint/resume.

    python -m toolbox_for_asr_and_tts_tpu.tools.finetune \
        --manifest data.jsonl --model-dir models/damo/… \
        --ckpt-dir runs/ft1 --steps 1000 [--batch 8] [--save-every 100]

The reference adapts to a domain with hotword lists + LLM correction only;
weight adaptation is the TPU-native upgrade (parallel/trainstep.py, dp+tp
over the serving mesh). `--manifest` is JSONL {"wav": path, "text": str};
omit it to run a synthetic smoke batch (CI / dry runs). Resume is
automatic from the newest step under --ckpt-dir; `--export` writes the
final params as a serving `jax_params.npz`.
"""
from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

logger = logging.getLogger("toolbox.finetune")


def _load_manifest(path, tokenizer, fe_cfg, k_max: int, t_cap_s: float):
    from ..ops import frontend as fe
    from ..utils.audio import ensure_mono_16k, read_wav
    items = []
    with open(path, encoding="utf-8") as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            row = json.loads(ln)
            x, sr = read_wav(row["wav"])
            wav = ensure_mono_16k(x, sr, fe_cfg.sample_rate)
            wav = wav[: int(t_cap_s * fe_cfg.sample_rate)]
            ids = [tokenizer.token_to_id[t] for t in row["text"]
                   if t in tokenizer.token_to_id][:k_max]
            if len(wav) and ids:
                items.append((wav, ids))
    if not items:
        raise SystemExit(f"no usable rows in {path}")
    logger.info("manifest: %d utterances", len(items))
    del fe
    return items


def _batch(items, batch, fe_cfg, k_max, rng):
    """Pad a random batch to fixed (T, K) and compute features on host
    lengths; feature extraction itself runs inside the jitted step via the
    recognizer path? No — fine-tuning feeds precomputed LFR features, so
    compute them here with the same frontend ops (on the default device)."""
    import jax.numpy as jnp

    from ..ops import frontend as fe
    sel = [items[i] for i in rng.integers(0, len(items), batch)]
    n_max = max(len(w) for w, _ in sel)
    t_fb = fe.num_fbank_frames(n_max, fe_cfg)
    t_lfr = fe.num_lfr_frames(t_fb, fe_cfg.lfr_n)
    wavs = np.zeros((batch, n_max), np.float32)
    lens = np.zeros((batch,), np.int32)
    targets = np.zeros((batch, k_max), np.int32)
    tlens = np.zeros((batch,), np.int32)
    for i, (w, ids) in enumerate(sel):
        wavs[i, :len(w)] = w
        lens[i] = len(w)
        targets[i, :len(ids)] = ids
        tlens[i] = len(ids)
    feats = fe.fbank(jnp.asarray(wavs), fe_cfg, t_frames=t_fb)
    feats = fe.apply_lfr(feats, fe_cfg.lfr_m, fe_cfg.lfr_n, t_out=t_lfr)
    feat_lens = fe.frontend_valid_frames(jnp.asarray(lens), fe_cfg)
    return {"feats": feats, "feat_lens": feat_lens,
            "targets": jnp.asarray(targets),
            "target_lens": jnp.asarray(tlens)}


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--model-dir", default=None,
                    help="start from a converted checkpoint dir (else "
                         "random init)")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--k-max", type=int, default=32)
    ap.add_argument("--max-secs", type=float, default=20.0)
    ap.add_argument("--export", default=None,
                    help="write final params as a serving jax_params.npz")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (smoke tests)")
    args = ap.parse_args(argv)

    import jax
    import optax

    from ..asr.recognizer import Recognizer
    from ..models import paraformer
    from ..parallel.trainstep import make_train_step
    from ..runtime import train_ckpt as tc

    if args.model_dir:
        reco = Recognizer.from_model_dir(args.model_dir, use_mesh=False)
        cfg, params, tokenizer = reco.cfg, reco.params, reco.tokenizer
    else:
        cfg = (paraformer.ParaformerConfig(
            d_model=32, n_heads=2, ffn_dim=64, encoder_layers=2,
            decoder_layers=1, vocab_size=64) if args.tiny
            else paraformer.ParaformerConfig())
        reco = Recognizer.random(cfg=cfg, use_mesh=False)
        params, tokenizer = reco.params, reco.tokenizer
    fe_cfg = cfg.frontend

    init_opt, train_step = make_train_step(
        cfg, optimizer=optax.adamw(args.lr))
    opt_state = init_opt(params)
    start = 0
    restored = tc.restore_train_state(args.ckpt_dir, params, opt_state)
    if restored is not None:
        start, params, opt_state = restored
        logger.info("resuming from step %d", start)
    step_fn = jax.jit(train_step, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    if args.manifest:
        items = _load_manifest(args.manifest, tokenizer, fe_cfg,
                               args.k_max, args.max_secs)
    else:
        logger.warning("no --manifest: SYNTHETIC smoke data")
        items = [(0.1 * rng.standard_normal(fe_cfg.sample_rate).astype(
            np.float32), list(range(3, 10))) for _ in range(8)]

    for step in range(start, args.steps):
        batch = _batch(items, args.batch, fe_cfg, args.k_max, rng)
        t0 = time.perf_counter()
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            raise SystemExit(f"non-finite loss at step {step}")
        if step % 10 == 0 or step == args.steps - 1:
            logger.info("step %d loss %.4f (%.0f ms)", step, loss,
                        (time.perf_counter() - t0) * 1000)
        if (step + 1) % args.save_every == 0 or step == args.steps - 1:
            tc.save_train_state(args.ckpt_dir, step + 1, params, opt_state)
    if args.export:
        tc.export_params_npz(params, args.export)
        logger.info("exported serving params to %s", args.export)


if __name__ == "__main__":
    main()
