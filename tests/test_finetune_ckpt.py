"""Fine-tune checkpoint/resume (orbax) + the finetune CLI smoke path."""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
pytest.importorskip("orbax.checkpoint")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.models import paraformer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel.trainstep import make_train_step  # noqa: E402
from toolbox_for_asr_and_tts_tpu.runtime import train_ckpt as tc  # noqa: E402

CFG = paraformer.ParaformerConfig(
    input_dim=24, d_model=16, n_heads=2, ffn_dim=32,
    encoder_layers=2, decoder_layers=1, vocab_size=32)


def _state():
    params = paraformer.init_params(jax.random.PRNGKey(0), CFG)
    init_opt, step = make_train_step(CFG)
    return params, init_opt(params), step


def test_save_restore_roundtrip(tmp_path):
    params, opt_state, _ = _state()
    d = str(tmp_path / "ckpts")
    tc.save_train_state(d, 7, params, opt_state)
    tc.save_train_state(d, 30, params, opt_state)
    assert tc.latest_step(d) == 30
    tpl_p = jax.tree.map(jnp.zeros_like, params)
    tpl_o = jax.tree.map(
        lambda a: jnp.zeros_like(a) if hasattr(a, "dtype") else a, opt_state)
    step, p2, o2 = tc.restore_train_state(d, tpl_p, tpl_o)
    assert step == 30
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_none_when_empty(tmp_path):
    params, opt_state, _ = _state()
    assert tc.restore_train_state(str(tmp_path / "nope"), params,
                                  opt_state) is None


def test_training_resumes_equivalently(tmp_path):
    """save at step k, resume, continue → same params as uninterrupted."""
    params, opt_state, step_fn = _state()
    jit_step = jax.jit(step_fn)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(4):
        batches.append({
            "feats": jnp.asarray(rng.standard_normal((2, 12, CFG.input_dim)),
                                 jnp.float32),
            "feat_lens": jnp.asarray([12, 9], jnp.int32),
            "targets": jnp.asarray(rng.integers(3, 32, (2, 5)), jnp.int32),
            "target_lens": jnp.asarray([5, 3], jnp.int32)})
    # uninterrupted
    p, o = params, opt_state
    for b in batches:
        p, o, _ = jit_step(p, o, b)
    # interrupted at 2
    d = str(tmp_path / "ck")
    p2, o2 = params, opt_state
    for b in batches[:2]:
        p2, o2, _ = jit_step(p2, o2, b)
    tc.save_train_state(d, 2, p2, o2)
    _, p3, o3 = tc.restore_train_state(
        d, jax.tree.map(jnp.zeros_like, p2),
        jax.tree.map(lambda a: jnp.zeros_like(a) if hasattr(a, "dtype")
                     else a, o2))
    for b in batches[2:]:
        p3, o3, _ = jit_step(p3, o3, b)
    for a, b_ in zip(jax.tree.leaves(p), jax.tree.leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-6)


def test_export_params_npz_loads_into_serving(tmp_path):
    from toolbox_for_asr_and_tts_tpu.runtime import checkpoints as ckpt
    params, _, _ = _state()
    out = str(tmp_path / "jax_params.npz")
    tc.export_params_npz(params, out)
    loaded = ckpt.load_converted(out, jax.tree.map(jnp.zeros_like, params))
    np.testing.assert_array_equal(
        np.asarray(loaded["decoder"]["out"]["w"]),
        np.asarray(params["decoder"]["out"]["w"]))


def test_finetune_cli_smoke_and_resume(tmp_path):
    from toolbox_for_asr_and_tts_tpu.tools import finetune
    d = str(tmp_path / "run1")
    out = str(tmp_path / "jax_params.npz")
    finetune.main(["--ckpt-dir", d, "--steps", "4", "--batch", "2",
                   "--save-every", "2", "--tiny", "--k-max", "8",
                   "--export", out])
    assert tc.latest_step(d) == 4
    assert os.path.exists(out)
    # resume: start > saved steps → no further training, but restores fine
    finetune.main(["--ckpt-dir", d, "--steps", "4", "--batch", "2",
                   "--tiny", "--k-max", "8"])
