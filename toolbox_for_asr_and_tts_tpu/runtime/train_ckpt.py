"""Fine-tuning checkpoint/resume (orbax-backed).

The reference's "checkpointing" is inference-weight resolution only (survey
§5); this framework also carries a fine-tune step (`parallel/trainstep.py`),
so training state — params, optimizer state, step counter — needs durable
save/resume. Orbax handles sharded arrays transparently: on a mesh, each
host saves its shards and `restore` lays them back onto the same sharding,
so the API below works for single-chip and dp+tp runs alike.

Layout: <dir>/<step>/ with orbax's own atomicity (tmp dir + rename), plus a
`latest` convenience resolver. Serving-side conversion (`checkpoints.py`)
stays npz — the two formats meet at `export_params_npz`.
"""
from __future__ import annotations

import logging
import os
import re
from typing import Any, Optional, Tuple

logger = logging.getLogger("toolbox.train_ckpt")


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_train_state(ckpt_dir: str, step: int, params: Any,
                     opt_state: Any) -> str:
    """Write <ckpt_dir>/<step>/{params,opt_state}. Returns the step dir."""
    path = os.path.join(os.path.abspath(ckpt_dir), str(int(step)))
    cp = _checkpointer()
    cp.save(os.path.join(path, "params"), params, force=True)
    cp.save(os.path.join(path, "opt_state"), opt_state, force=True)
    logger.info("saved training state step=%d at %s", step, path)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Newest step whose save is COMPLETE (both params and opt_state —
    save_train_state writes them sequentially, so a crash in between leaves
    a half step dir that must not be selected for resume)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if not re.fullmatch(r"\d+", d):
            continue
        if os.path.isdir(os.path.join(ckpt_dir, d, "params")) \
                and os.path.isdir(os.path.join(ckpt_dir, d, "opt_state")):
            steps.append(int(d))
        elif os.path.isdir(os.path.join(ckpt_dir, d)):
            logger.warning("ignoring incomplete checkpoint step dir %s "
                           "(interrupted save)", os.path.join(ckpt_dir, d))
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, params_template: Any,
                        opt_template: Any,
                        step: Optional[int] = None
                        ) -> Optional[Tuple[int, Any, Any]]:
    """Restore (step, params, opt_state); None when no checkpoint exists.

    Templates pin structure/dtypes (and shardings, when their leaves are
    sharded jax.Arrays)."""
    import orbax.checkpoint as ocp
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        return None
    path = os.path.join(os.path.abspath(ckpt_dir), str(int(step)))
    cp = _checkpointer()
    restore_args = ocp.checkpoint_utils.construct_restore_args
    params = cp.restore(os.path.join(path, "params"), item=params_template,
                        restore_args=restore_args(params_template))
    opt_state = cp.restore(os.path.join(path, "opt_state"),
                           item=opt_template,
                           restore_args=restore_args(opt_template))
    logger.info("restored training state step=%d from %s", step, path)
    return int(step), params, opt_state


def export_params_npz(params: Any, out_path: str) -> str:
    """Training params → the serving `.npz` format (runtime/checkpoints.py)
    so a fine-tuned model drops into the engines' loaders directly."""
    import jax

    from . import checkpoints as ckpt
    ckpt.save_converted(out_path, jax.device_get(params))
    return out_path
