import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt  # noqa: E402

TINY = paraformer.ParaformerConfig(
    input_dim=24, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=2, decoder_layers=1, vocab_size=32)


def test_convert_from_real_torch_file(tmp_path):
    """Full path: torch.save a FunASR-named state dict → convert → npz cache
    → reload → identical pytree."""
    params = paraformer.init_params(jax.random.PRNGKey(0), TINY)
    rules = ckpt.paraformer_rules(TINY.encoder_layers, TINY.decoder_layers)
    sd = ckpt.invert_to_state_dict(params, rules)
    torch_sd = {k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    torch.save(torch_sd, model_dir / "model.pt")

    template = paraformer.init_params(jax.random.PRNGKey(1), TINY)
    out = ckpt.convert_or_load_cached(str(model_dir), template, rules)
    flat_orig = ckpt.flatten_params(params)
    for k, v in ckpt.flatten_params(out).items():
        np.testing.assert_allclose(np.asarray(flat_orig[k]), v, rtol=1e-6,
                                   err_msg=k)
    # second load comes from the npz cache
    assert (model_dir / "jax_params.npz").exists()
    out2 = ckpt.convert_or_load_cached(str(model_dir), template, rules)
    for k, v in ckpt.flatten_params(out2).items():
        np.testing.assert_array_equal(ckpt.flatten_params(out)[k], v)


def test_convert_rejects_shape_mismatch(tmp_path):
    params = paraformer.init_params(jax.random.PRNGKey(0), TINY)
    rules = ckpt.paraformer_rules(TINY.encoder_layers, TINY.decoder_layers)
    sd = ckpt.invert_to_state_dict(params, rules)
    sd["decoder.output_layer.weight"] = np.zeros((7, 7), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.convert_state_dict(sd, rules, params)


def test_convert_missing_strict(tmp_path):
    params = paraformer.init_params(jax.random.PRNGKey(0), TINY)
    rules = ckpt.paraformer_rules(TINY.encoder_layers, TINY.decoder_layers)
    sd = ckpt.invert_to_state_dict(params, rules)
    del sd["decoder.output_layer.weight"]
    with pytest.raises(KeyError):
        ckpt.convert_state_dict(sd, rules, params, strict=True)


def test_check_cache_tool(tmp_path):
    from toolbox_for_asr_and_tts_tpu.tools.check_cache import check
    root = tmp_path / "damo"
    (root / "speech_campplus_sv_zh-cn_16k-common").mkdir(parents=True)
    report = check(str(root))
    assert report["root_exists"]
    assert report["models"]["speech_campplus_sv_zh-cn_16k-common"]["present"]
    assert not report["models"][
        "speech_sambert-hifigan_tts_zh-cn_16k"]["present"]


# ------------------------------------------------- round-2 family rules
def _roundtrip(family_mod, init_fn, cfg, rules, keep_missing=False):
    params = init_fn(jax.random.PRNGKey(0), cfg)
    sd = ckpt.invert_to_state_dict(params, rules)
    template = init_fn(jax.random.PRNGKey(1), cfg)
    out = ckpt.convert_state_dict(sd, rules, template, strict=True,
                                  keep_missing=keep_missing)
    flat_in = ckpt.flatten_params(params)
    mapped = {p for p, _ in rules}
    for k, v in ckpt.flatten_params(out).items():
        if k in mapped:
            np.testing.assert_allclose(np.asarray(flat_in[k]), v, rtol=1e-6,
                                       err_msg=k)
    return mapped, set(ckpt.flatten_params(params))


def test_campplus_rules_roundtrip_and_complete():
    """Every CAM++ leaf is mapped (speakerlab module tree) — strict
    conversion of a real campplus checkpoint cannot miss tensors."""
    from toolbox_for_asr_and_tts_tpu.models import campplus
    cfg = campplus.CampPlusConfig(block_layers=(2, 3), block_dilations=(1, 2),
                                  init_channels=32, growth_rate=8,
                                  embedding_size=16)
    mapped, leaves = _roundtrip(campplus, campplus.init_params, cfg,
                                ckpt.campplus_rules(cfg.block_layers))
    assert mapped == leaves, (sorted(leaves - mapped)[:5],
                              sorted(mapped - leaves)[:5])


def test_ct_transformer_rules_roundtrip_and_complete():
    from toolbox_for_asr_and_tts_tpu.models import ct_transformer as ctm
    cfg = ctm.CTTransformerConfig(vocab_size=64, num_layers=3, d_model=16,
                                  embed_dim=24, n_heads=2, ffn_dim=32)
    mapped, leaves = _roundtrip(ctm, ctm.init_params, cfg,
                                ckpt.ct_transformer_rules(cfg.num_layers))
    assert mapped == leaves


def test_kws_rules_roundtrip_and_complete():
    from toolbox_for_asr_and_tts_tpu.models import kws_ctc
    cfg = kws_ctc.KwsConfig(vocab_size=32, hidden_dim=16, proj_dim=8,
                            num_layers=2)
    mapped, leaves = _roundtrip(kws_ctc, kws_ctc.init_params, cfg,
                                ckpt.kws_rules(cfg.num_layers, cfg.rorder))
    assert mapped == leaves
