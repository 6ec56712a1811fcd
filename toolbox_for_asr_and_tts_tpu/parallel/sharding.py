"""Parameter/batch sharding rules over a (data, model) mesh.

The reference has no parallelism to port (survey §2.4: thread pools only);
the TPU-native design still makes multi-chip first-class:

- **data axis**: concurrent streams / batch rows — always sharded.
- **model axis**: tensor-parallel sharding of the big matmuls (FFN hidden,
  attention heads, vocab projection), pjit-style: parameters carry
  `NamedSharding`s and XLA inserts the all-reduces over ICI.

Rules are name-based on the flat param path, so they apply to every model
family in models/ uniformly.
"""
from __future__ import annotations

import re
from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex on flat path, PartitionSpec factory given array ndim)
_RULES = [
    # FFN: first projection column-parallel, second row-parallel
    (re.compile(r"\bffn\.w1\.w$"), lambda nd: P(None, "model")),
    (re.compile(r"\bffn\.w1\.b$"), lambda nd: P("model")),
    (re.compile(r"\bffn\.w2\.w$"), lambda nd: P("model", None)),
    # attention: qkv column-parallel, out row-parallel
    (re.compile(r"\b(qkv|kv)\.w$"), lambda nd: P(None, "model")),
    (re.compile(r"\b(qkv|kv)\.b$"), lambda nd: P("model")),
    (re.compile(r"\battn\.out\.w$|\bsrc_attn\.out\.w$"), lambda nd: P("model", None)),
    # vocab projection column-parallel
    (re.compile(r"\bdecoder\.out\.w$|\bout_vocab\.w$"), lambda nd: P(None, "model")),
    (re.compile(r"\bdecoder\.out\.b$|\bout_vocab\.b$"), lambda nd: P("model")),
    # embeddings row-parallel over vocab
    (re.compile(r"\bembed\.table$"), lambda nd: P("model", None)),
]


def spec_for_path(path: str, ndim: int) -> P:
    for rx, fn in _RULES:
        if rx.search(path):
            spec = fn(ndim)
            if len(spec) <= ndim:
                return spec
    return P()  # replicate


def _flat_paths(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_paths(v, f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flat_paths(v, f"{prefix}{i}.")
    else:
        yield prefix[:-1], tree


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `params` (tp rules + replicate)."""
    flat = dict(_flat_paths(params))
    specs = {p: spec_for_path(p, np.ndim(a)) for p, a in flat.items()}

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}{k}.") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [build(v, f"{prefix}{i}.") for i, v in enumerate(tree)]
        return NamedSharding(mesh, specs[prefix[:-1]])

    return build(params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def make_2d_mesh(n_devices: int, model_parallel: int = 2) -> Mesh:
    """(data, model) mesh; model axis capped by divisibility."""
    avail = jax.devices()
    if len(avail) < n_devices:
        raise ValueError(
            f"make_2d_mesh: requested {n_devices} devices but only "
            f"{len(avail)} available ({avail[0].platform} backend). Force a "
            "larger backend first, e.g. jax.config.update('jax_platforms', "
            "'cpu') + jax.config.update('jax_num_cpu_devices', N).")
    devices = np.array(avail[:n_devices])
    mp = model_parallel
    while n_devices % mp != 0 and mp > 1:
        mp -= 1
    return Mesh(devices.reshape(n_devices // mp, mp), ("data", "model"))
