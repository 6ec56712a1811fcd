"""Paraformer fine-tuning step (dp + tp over a 2-D mesh).

The reference is inference-only (survey §2.4), but the framework supports
fine-tuning its flagship ASR model so deployments can adapt to domain data
(the reference's domain adaptation is hotword lists + LLM correction; weight
adaptation is the TPU-native upgrade). Loss = masked token cross-entropy +
CIF quantity loss (MAE between Σα and target length), as in the Paraformer
paper/FunASR.

All parallelism is pjit-style: parameters carry tensor-parallel
NamedShardings (parallel/sharding.py), the batch is sharded over the data
axis, and XLA inserts the ICI collectives.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import paraformer
from ..ops import nn


def paraformer_loss(params, feats, feat_lens, targets, target_lens,
                    cfg: paraformer.ParaformerConfig,
                    quantity_weight: float = 1.0):
    """feats [B,T,D], targets [B,K] int32 (0-padded), target_lens [B]."""
    t = feats.shape[1]
    k_max = targets.shape[1]
    mask = nn.length_mask(feat_lens, t)
    enc = paraformer.encode(params, feats, mask, cfg)
    alphas = paraformer.predictor_alphas(params, enc, mask, cfg)
    # teacher-forced CIF: scale α so Σα == target length (FunASR training path)
    total = jnp.sum(alphas, axis=1, keepdims=True)
    alphas_scaled = alphas * (target_lens[:, None] / jnp.maximum(total, 1e-6))
    embeds, _, _, _, _ = paraformer.cif(enc, alphas_scaled, k_max, tail_threshold=0.0)
    tok_mask = nn.length_mask(target_lens, k_max)
    logits = paraformer.decode(params, embeds, tok_mask, enc, mask, cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.sum(ce * tok_mask) / jnp.maximum(jnp.sum(tok_mask), 1.0)
    quantity = jnp.mean(jnp.abs(total[:, 0] - target_lens))
    return ce + quantity_weight * quantity, {"ce": ce, "quantity": quantity}


def make_train_step(cfg: paraformer.ParaformerConfig,
                    optimizer: Optional[optax.GradientTransformation] = None):
    opt = optimizer or optax.adamw(1e-4)

    def init_opt(params):
        return opt.init(params)

    def train_step(params, opt_state, batch) -> Tuple[Any, Any, Dict]:
        def loss_fn(p):
            return paraformer_loss(p, batch["feats"], batch["feat_lens"],
                                   batch["targets"], batch["target_lens"], cfg)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **aux}

    return init_opt, train_step
