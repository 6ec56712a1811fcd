"""Checkpoint-dir config autoloading: model geometry comes from the mounted
dir's own config.yaml (FunASR convention) instead of hardcoded guesses —
closes the round-1 'hyperparams unconfirmed vs real checkpoint' gap for
every family with a from_funasr mapper."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

from toolbox_for_asr_and_tts_tpu.models.ct_transformer import (  # noqa: E402
    CTTransformerConfig)
from toolbox_for_asr_and_tts_tpu.models.kws_ctc import KwsConfig  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models.fsmn_vad import FsmnVadConfig  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models.paraformer import (  # noqa: E402
    ParaformerConfig)
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402


def test_ct_transformer_from_funasr():
    conf = {"encoder_conf": {"attention_heads": 4, "linear_units": 1024,
                             "num_blocks": 6, "output_size": 256,
                             "input_size": 128},
            "model_conf": {"punc_list": ["<unk>", "_", "，", "。"],
                           "vocab_size": 272727}}
    cfg = CTTransformerConfig.from_funasr(conf)
    assert (cfg.n_heads, cfg.ffn_dim, cfg.num_layers, cfg.d_model,
            cfg.embed_dim) == (4, 1024, 6, 256, 128)
    assert cfg.vocab_size == 272727
    assert cfg.punc_size == 4 and cfg.punc_list[-1] == "。"


def test_kws_and_vad_from_funasr():
    kcfg = KwsConfig.from_funasr({"encoder_conf": {
        "input_dim": 120, "linear_dim": 96, "proj_dim": 48,
        "fsmn_layers": 3, "lorder": 8, "output_dim": 1300}})
    assert (kcfg.input_dim, kcfg.hidden_dim, kcfg.proj_dim, kcfg.num_layers,
            kcfg.lorder, kcfg.vocab_size) == (120, 96, 48, 3, 8, 1300)
    vcfg = FsmnVadConfig.from_funasr({
        "encoder_conf": {"input_dim": 400, "input_affine_dim": 140,
                         "linear_dim": 250, "proj_dim": 128,
                         "fsmn_layers": 4, "lorder": 20, "rorder": 0,
                         "output_affine_dim": 140, "output_dim": 248},
        "model_conf": {"sil_pdf_ids": [0]}})
    assert vcfg == FsmnVadConfig()   # real FunASR dims == our defaults


def test_paraformer_from_funasr():
    conf = {"model": "BicifParaformer",
            "encoder_conf": {"output_size": 320, "attention_heads": 4,
                             "linear_units": 1280, "num_blocks": 30,
                             "kernel_size": 11, "sanm_shfit": 0},
            "decoder_conf": {"num_blocks": 12},
            "predictor_conf": {"l_order": 1, "r_order": 1,
                               "tail_threshold": 0.45,
                               "upsample_times": 3},
            "frontend_conf": {"n_mels": 80, "lfr_m": 7, "lfr_n": 6}}
    cfg = ParaformerConfig.from_funasr(conf)
    assert (cfg.d_model, cfg.n_heads, cfg.ffn_dim, cfg.encoder_layers,
            cfg.decoder_layers) == (320, 4, 1280, 30, 12)
    assert cfg.sanm_shift == 0 and cfg.predictor_kernel == 3
    assert cfg.input_dim == 560 and cfg.frontend.lfr_m == 7
    assert cfg.bicif and cfg.upsample_times == 3
    # empty config keeps defaults
    assert ParaformerConfig.from_funasr({}).d_model == 512


def test_load_model_config(tmp_path):
    assert ckpt.load_model_config(str(tmp_path)) == {}
    (tmp_path / "config.yaml").write_text(
        "encoder_conf:\n  num_blocks: 5\n", encoding="utf-8")
    assert ckpt.load_model_config(str(tmp_path)) == {
        "encoder_conf": {"num_blocks": 5}}


def test_punctuator_geometry_from_dir(tmp_path):
    """End-to-end: a dir with non-default config.yaml + matching model.pt
    builds a Punctuator at that geometry."""
    from toolbox_for_asr_and_tts_tpu.models import ct_transformer as ctm
    conf = {"encoder_conf": {"attention_heads": 2, "linear_units": 64,
                             "num_blocks": 2, "output_size": 32,
                             "input_size": 16},
            "model_conf": {"punc_list": ["<unk>", "_", "，", "。", "？", "、"],
                           "vocab_size": 50}}
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(conf),
                                          encoding="utf-8")
    cfg = ctm.CTTransformerConfig.from_funasr(conf)
    params = ctm.init_params(jax.random.PRNGKey(0), cfg)
    sd = ckpt.invert_to_state_dict(
        params, ckpt.ct_transformer_rules(cfg.num_layers))
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, tmp_path / "model.pt")
    punc = ctm.Punctuator.from_model_dir(str(tmp_path))
    assert punc.cfg.d_model == 32 and punc.cfg.num_layers == 2
    out = punc.punctuate("你好吗")
    assert isinstance(out, str) and len(out) >= 3


def test_streaming_factory_prefers_online_checkpoint(tmp_path, monkeypatch):
    """The reference loads a separate chunk-trained online model
    (paraformer-zh-streaming, voice_interface.py:629-634): with one mounted,
    partials must use ITS weights, not the offline model's."""
    from toolbox_for_asr_and_tts_tpu.models import paraformer as pf
    from toolbox_for_asr_and_tts_tpu.asr.recognizer import Recognizer
    from toolbox_for_asr_and_tts_tpu.service.engines import _streaming_factory
    d = tmp_path / ("speech_paraformer-large_asr_nat-zh-cn-16k-common-"
                    "vocab8404-online")
    d.mkdir()
    conf = {"encoder_conf": {"output_size": 16, "attention_heads": 2,
                             "linear_units": 32, "num_blocks": 2,
                             "kernel_size": 11, "sanm_shfit": 0},
            "decoder_conf": {"num_blocks": 2},
            "frontend_conf": {"n_mels": 80, "lfr_m": 7, "lfr_n": 6}}
    (d / "config.yaml").write_text(yaml.safe_dump(conf), encoding="utf-8")
    # vocab comes from the dir's token list (tokens.json), like real dirs
    import json
    toks = ["<blank>", "<s>", "</s>"] + [chr(0x4E00 + i) for i in range(45)]
    (d / "tokens.json").write_text(json.dumps(toks), encoding="utf-8")
    ocfg = pf.ParaformerConfig.from_funasr(conf, vocab_size=48)
    params = pf.init_params(jax.random.PRNGKey(2), ocfg)
    sd = ckpt.invert_to_state_dict(params, ckpt.paraformer_rules(2, 2))
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, d / "model.pt")
    monkeypatch.setenv("VOICE_ENABLE_PARTIALS", "1")
    offline = Recognizer.random(
        pf.ParaformerConfig(input_dim=560, d_model=32, n_heads=2, ffn_dim=64,
                            encoder_layers=2, decoder_layers=2,
                            vocab_size=64), use_mesh=False)
    factory = _streaming_factory(offline, model_dir=str(tmp_path))
    st = factory()
    # online dir's geometry (d_model 16 from its config.yaml), not offline's
    assert st.cfg.d_model == 16, st.cfg


def test_vad_from_model_dir(tmp_path):
    """fsmn_vad.from_model_dir: geometry from config.yaml, CMVN from am.mvn,
    weights through the converter; the stepper then applies CMVN."""
    from toolbox_for_asr_and_tts_tpu.models import fsmn_vad
    from toolbox_for_asr_and_tts_tpu.asr.vad import StreamingVadStepper
    conf = {"encoder_conf": {"input_dim": 400, "input_affine_dim": 32,
                             "linear_dim": 48, "proj_dim": 16,
                             "fsmn_layers": 2, "lorder": 5, "rorder": 0,
                             "output_affine_dim": 32, "output_dim": 12}}
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(conf),
                                          encoding="utf-8")
    cfg = fsmn_vad.FsmnVadConfig.from_funasr(conf)
    params = fsmn_vad.init_params(jax.random.PRNGKey(1), cfg)
    sd = ckpt.invert_to_state_dict(params,
                                   ckpt.fsmn_vad_rules(cfg.fsmn_layers))
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, tmp_path / "model.pt")
    means = " ".join(["0.5"] * 400)
    scales = " ".join(["2.0"] * 400)
    (tmp_path / "am.mvn").write_text(
        f"<Nnet>\n<AddShift> 400 400\n<LearnRateCoef> 0 [ {means} ]\n"
        f"<Rescale> 400 400\n<LearnRateCoef> 0 [ {scales} ]\n</Nnet>\n",
        encoding="utf-8")
    p, c, cmvn = fsmn_vad.from_model_dir(str(tmp_path))
    assert c.linear_dim == 48 and c.fsmn_layers == 2
    assert cmvn is not None and np.allclose(cmvn[0], 0.5)
    st = StreamingVadStepper(p, c, cmvn=cmvn)
    out = st((np.random.default_rng(0).standard_normal(6400) * 0.1)
             .astype(np.float32))
    assert isinstance(out, bool)
