"""BiCIF timestamp predictor (paraformer-large-vad-punc-spk's CifPredictorV3
branch): torch layout parity through the converter rules, fire-frame
alignment quality, and loader auto-detection."""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer as pf  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402

CFG = pf.ParaformerConfig(input_dim=560, d_model=16, n_heads=2, ffn_dim=32,
                          encoder_layers=2, decoder_layers=1, vocab_size=32,
                          bicif=True)


class TorchBiCif(torch.nn.Module):
    """The upsample branch of FunASR's CifPredictorV3 with the REAL
    state-dict names (upsample_cnn / blstm / cif_output2)."""

    def __init__(self, d, u=3):
        super().__init__()
        self.upsample_cnn = torch.nn.ConvTranspose1d(d, d, u, u)
        self.blstm = torch.nn.LSTM(d, d, 1, bias=True, batch_first=True,
                                   bidirectional=True)
        self.cif_output2 = torch.nn.Linear(2 * d, 1)

    def forward(self, h):                       # [B, T, d]
        x = self.upsample_cnn(h.transpose(1, 2)).transpose(1, 2)
        x, _ = self.blstm(x)
        return torch.sigmoid(self.cif_output2(x)).squeeze(-1)


def test_upsample_alphas_torch_parity():
    """JAX upsample_alphas == torch CifPredictorV3 branch on weights that
    flow through the actual bicif converter rules (locks the ConvTranspose
    [in,out,k] layout and torch's i,f,g,o LSTM gate order)."""
    params = pf.init_params(jax.random.PRNGKey(5), CFG)
    sd = ckpt.invert_to_state_dict({"predictor": params["predictor"]},
                                   ckpt.bicif_rules())
    tm = TorchBiCif(CFG.d_model, CFG.upsample_times)
    tm.load_state_dict({k[len("predictor."):]: torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in sd.items()}, strict=True)
    tm.eval()

    rng = np.random.default_rng(0)
    h = rng.standard_normal((2, 7, CFG.d_model)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(h)).numpy()
    mask = jnp.ones((2, 7))
    got = np.asarray(pf.upsample_alphas(params, jnp.asarray(h), mask, CFG))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_alphas_masking():
    params = pf.init_params(jax.random.PRNGKey(5), CFG)
    rng = np.random.default_rng(1)
    h = rng.standard_normal((1, 6, CFG.d_model)).astype(np.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)
    us = np.asarray(pf.upsample_alphas(params, jnp.asarray(h), mask, CFG))
    assert us.shape == (1, 18)
    assert (us[0, 12:] == 0).all()          # padded frames carry no mass
    assert (us[0, :12] > 0).any()


def test_upsample_fire_frames_alignment():
    """Concentrated synthetic mass: token k's boundaries must land exactly
    on its alpha support (monotonic, non-overlapping, 20 ms-accurate)."""
    us = np.zeros((1, 30), np.float32)
    # token 0 occupies us-frames 2..4, token 1 frames 10..12, token 2 20..25
    us[0, 2:5] = 1.0 / 3
    us[0, 10:13] = 1.0 / 3
    us[0, 20:26] = 1.0 / 6
    start, end = pf.upsample_fire_frames(jnp.asarray(us),
                                         jnp.asarray([3]), k_max=4)
    start, end = np.asarray(start)[0], np.asarray(end)[0]
    assert (start[:3].tolist(), end[:3].tolist()) == ([2, 10, 20], [4, 12, 25])
    # monotonic + non-overlapping
    assert all(end[i] < start[i + 1] for i in range(2))


def test_recognizer_bicif_spans_end_to_end():
    """Random bicif recognizer: refined spans are monotonic non-negative
    [start, end] at 20 ms resolution, one per decoded token."""
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    reco = Recognizer.random(CFG, use_mesh=False)
    assert reco.has_bicif
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    res = reco.transcribe([wav])[0]
    assert len(res.timestamp) == len(res.token_ids)
    for s, e in res.timestamp:
        assert 0 <= s <= e
        assert e - s <= 600  # FunASR MAX_TOKEN_DURATION cap
    starts = [s for s, _ in res.timestamp]
    assert starts == sorted(starts)


def test_from_model_dir_autodetect(tmp_path):
    """A checkpoint WITH bicif tensors loads the timestamp branch; one
    WITHOUT falls back to the plain predictor."""
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    for bicif in (True, False):
        cfg = dataclasses.replace(CFG, bicif=bicif)
        params = pf.init_params(jax.random.PRNGKey(7), cfg)
        rules = ckpt.paraformer_rules(cfg.encoder_layers, cfg.decoder_layers,
                                      bicif=bicif)
        sd = ckpt.invert_to_state_dict(params, rules)
        d = tmp_path / ("with_bicif" if bicif else "plain")
        d.mkdir()
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, d / "model.pt")
        reco = Recognizer.from_model_dir(str(d), cfg=dataclasses.replace(
            cfg, bicif=False), use_mesh=False)
        assert reco.has_bicif is bicif, f"bicif={bicif} not detected"
