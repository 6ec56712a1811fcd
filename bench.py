"""Benchmark: offline ASR real-time factor per chip (BASELINE config #1).

Runs the full-size Paraformer-large recognition path (fbank → LFR/CMVN →
50-layer SAN-M encoder → CIF → 16-layer NAR decoder → greedy) on batches of
10 s 16 kHz audio on the local accelerator, and prints ONE JSON line:

    {"metric": "offline_asr_rtf", "value": <rtf>, "unit": "rtf",
     "vs_baseline": <north_star 0.05 / rtf>}

vs_baseline > 1.0 means faster than the driver's per-chip target
(BASELINE.json north_star: offline ASR RTF ≤ 0.05 per v5e chip). The
reference publishes no numbers of its own (BASELINE.md).
"""
import json
import sys
import time

import numpy as np


def serving_main(batch: int = 8):
    """--serving: the PRODUCTION decode path (VERDICT round-1 item #9) —
    Recognizer with hotword biasing + ARPA n-gram LM fusion enabled, so the
    [B, K, vocab] logits fetch, log-softmax and both rescoring passes are all
    inside the measured loop. Prints one JSON line (serving_asr_rtf)."""
    import os
    import tempfile

    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.asr.hotwords import load_hotwords_from_file
    from toolbox_for_asr_and_tts_tpu.asr.ngram_lm import ArpaLM
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer

    secs = 10.0
    reco = Recognizer.random(use_mesh=False, param_dtype=jnp.bfloat16)
    # hotwords: the shipped production list (weights incl. negatives)
    hw_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "toolbox_for_asr_and_tts_tpu", "assets",
                           "hotwords.txt")
    hotwords = load_hotwords_from_file(hw_path)
    # LM: synthetic trigram ARPA over the tokenizer vocab (the real
    # speech_ngram_lm_zh-cn-ai-wesp-fst mounts the same way in production)
    toks = [t for t in reco.tokenizer.tokens[3:403]]
    lines = ["\\data\\", f"ngram 1={len(toks) + 2}", f"ngram 2={len(toks)}",
             "", "\\1-grams:", "-99\t<s>\t-1", "-2.0\t</s>"]
    lines += [f"-2.3\t{t}\t-0.5" for t in toks]
    lines += ["", "\\2-grams:"]
    lines += [f"-1.5\t{a} {b}" for a, b in zip(toks, toks[1:] + toks[:1])]
    lines += ["", "\\end\\"]
    with tempfile.NamedTemporaryFile("w", suffix=".arpa", delete=False) as f:
        f.write("\n".join(lines))
        lm_path = f.name
    reco.lm = ArpaLM.load(lm_path)

    rng = np.random.default_rng(0)
    wavs = [0.1 * rng.standard_normal(int(16000 * secs)).astype(np.float32)
            for _ in range(batch)]
    reco.transcribe(wavs, hotwords=hotwords)   # compile + param upload
    reco.transcribe(wavs, hotwords=hotwords)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        res = reco.transcribe(wavs, hotwords=hotwords)
    proc_s = (time.perf_counter() - t0) / iters
    assert all(isinstance(r.text, str) for r in res)
    rtf = proc_s / (batch * secs)
    print(json.dumps({
        "metric": "serving_asr_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(0.05 / rtf, 3),
    }))
    os.unlink(lm_path)


def main(int8: bool = False):
    import jax
    import jax.numpy as jnp
    from toolbox_for_asr_and_tts_tpu.models import paraformer
    from toolbox_for_asr_and_tts_tpu.ops import frontend as fe

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    secs = 10.0
    cfg = paraformer.ParaformerConfig()
    fcfg = cfg.frontend
    dtype = jnp.bfloat16

    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    if int8:  # --int8: W8A8 encoder (PARAFORMER_QUANT=int8 serving mode)
        params = paraformer.quantize_encoder_int8(params)

    n_samples = int(16000 * secs)
    t_fb = fe.num_fbank_frames(n_samples, fcfg)
    t_lfr = fe.num_lfr_frames(t_fb, fcfg.lfr_n)
    k_max = paraformer.max_tokens_for(t_lfr)

    def run(p, wavs, wav_lens):
        feats = fe.fbank(wavs, fcfg, t_frames=t_fb)
        feats = fe.apply_lfr(feats, fcfg.lfr_m, fcfg.lfr_n, t_out=t_lfr)
        feat_lens = fe.frontend_valid_frames(wav_lens, fcfg)
        out = paraformer.forward(p, feats.astype(dtype), feat_lens, k_max, cfg)
        return out["tokens"], out["token_count"]

    fn = jax.jit(run)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(0.1 * rng.standard_normal((batch, n_samples)), jnp.float32)
    lens = jnp.full((batch,), n_samples, jnp.int32)

    # Warmup: compile, upload params, run twice. Synchronize by fetching a
    # small output to host — under the axon/tunnel runtime block_until_ready
    # does not actually wait, and the first fetch pays the one-time param
    # upload; neither belongs in the steady-state measurement.
    np.asarray(fn(params, wavs, lens)[1])
    np.asarray(fn(params, wavs, lens)[1])

    # 25 chained dispatches with ONE final fetch: the device queue is
    # sequential, so per-iter time is compute + its share of the single
    # ~33 ms tunnel round trip. At 5 iters the fetch alone added
    # ~6.6 ms/iter (>2x the ~2.6 ms compute floor); production serving
    # chains dispatches continuously, so amortizing it IS steady state.
    iters = 25
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, wavs, lens)
    np.asarray(out[1])  # sync: device queue is sequential
    proc_s = (time.perf_counter() - t0) / iters

    audio_s = batch * secs
    rtf = proc_s / audio_s
    print(json.dumps({
        "metric": "offline_asr_rtf" + ("_int8" if int8 else ""),
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(0.05 / rtf, 3),
    }))


if __name__ == "__main__":
    if "--serving" in sys.argv:
        sys.argv.remove("--serving")
        serving_main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
    else:
        int8 = "--int8" in sys.argv
        if int8:
            sys.argv.remove("--int8")
        main(int8=int8)
