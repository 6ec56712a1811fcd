"""Golden-transcript rehearsal THROUGH THE SERVING PATH: a torch Paraformer
(real FunASR state-dict names), converted by the real rules, must produce the
IDENTICAL transcript over the live REST API that the torch model produces on
the same WAV — locking frontend framing, bucket padding, masks, tokenizer
and service plumbing, not just model math (which test_full_layer_parity
already locks at the feats level). This is the offline rehearsal of the
north-star check "identical transcripts" (BASELINE.md) pending real weights.
"""
import asyncio
import base64
import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
httpx = pytest.importorskip("httpx")

import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops import frontend as fe  # noqa: E402
from toolbox_for_asr_and_tts_tpu.ops import nn  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.asr.tokenizer import CharTokenizer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.utils.audio import encode_wav_bytes  # noqa: E402

from test_full_layer_parity import TorchParaformer  # noqa: E402

CFG = paraformer.ParaformerConfig(
    input_dim=560, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=2, decoder_layers=2, vocab_size=48)


@pytest.fixture(scope="module")
def pair():
    tmodel = TorchParaformer(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    template = paraformer.init_params(jax.random.PRNGKey(0), CFG)
    rules = ckpt.paraformer_rules(CFG.encoder_layers, CFG.decoder_layers)
    params = ckpt.convert_state_dict(sd, rules, template, strict=True)
    tok = CharTokenizer.dummy(CFG.vocab_size)
    return tmodel, params, tok


def _torch_transcript(tmodel, tok, wav: np.ndarray) -> str:
    """Reference-side decode: OUR validated frontend features (golden-tested
    vs kaldi in test_frontend) + the TORCH model + the same tokenizer."""
    fcfg = CFG.frontend
    feats = fe.fbank(jnp.asarray(wav[None]), fcfg)
    feats = np.asarray(fe.apply_lfr(feats, fcfg.lfr_m, fcfg.lfr_n))
    t = feats.shape[1]
    mask_t = torch.ones((1, t))
    with torch.no_grad():
        enc = tmodel.encode(torch.from_numpy(feats), mask_t)
        embeds, num, _ = tmodel.predictor(enc, mask_t)
        k = int(num[0])
        kt = embeds.shape[1]
        tok_mask = torch.from_numpy(
            (np.arange(kt)[None] < np.array([[k]])).astype(np.float32))
        logits = tmodel.decode(embeds, tok_mask, enc, mask_t)
        ids = logits[0, :k].argmax(-1).tolist()
    return tok.ids_to_text(ids)


def _wav(secs=1.3, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * secs)) / 16000
    return (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(len(t))).astype(np.float32)


def test_recognizer_transcript_identical(pair):
    """Library surface: Recognizer.transcribe (bucketed, padded, masked)
    == torch greedy decode, transcript-for-transcript, over several WAV
    lengths that land in different padding buckets."""
    tmodel, params, tok = pair
    reco = Recognizer(params, CFG, tok, use_mesh=False)
    for secs, seed in ((0.61, 2), (1.3, 5), (2.07, 9)):
        wav = _wav(secs, seed)
        want = _torch_transcript(tmodel, tok, wav)
        got = reco.transcribe([wav])[0].text
        assert got == want, (secs, got, want)
        assert len(want) > 0


def test_rest_transcript_identical(pair):
    """Service surface: POST /api/v1/voice/asr returns the torch transcript
    byte-for-byte (diarizer composition with punctuator/SV off)."""
    tmodel, params, tok = pair
    from toolbox_for_asr_and_tts_tpu.asr.diarization import Diarizer
    from toolbox_for_asr_and_tts_tpu.asr.session import VoiceEngines
    from toolbox_for_asr_and_tts_tpu.asr.speaker import SpeakerVerifier
    from toolbox_for_asr_and_tts_tpu.service.voice_app import create_app

    reco = Recognizer(params, CFG, tok, use_mesh=False)
    sv = SpeakerVerifier.random()
    # punctuator None: no punctuation inserted, transcripts compare raw;
    # gap_split may split sentences but text joins in token order
    diar = Diarizer(reco, sv, punctuator=None)
    engines = VoiceEngines(diarizer=diar, kws=None, verifier=sv)
    app = create_app(engines=engines)
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.create_task(app.serve("127.0.0.1", 0, ready=asyncio.Event()))
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(200):
        if getattr(app, "port", None):
            break
        time.sleep(0.05)
    try:
        wav = _wav(1.3, seed=5)
        want = _torch_transcript(tmodel, tok, wav)
        b64 = base64.b64encode(encode_wav_bytes(wav, 16000)).decode()
        r = httpx.post(f"http://127.0.0.1:{app.port}/api/v1/voice/asr",
                       json={"audio_data": b64, "use_wake": False,
                             "use_llm": False}, timeout=300)
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["success"] is True
        assert body["text"] == want, (body["text"], want)
    finally:
        loop.call_soon_threadsafe(loop.stop)
