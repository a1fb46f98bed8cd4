"""Device mesh + parameter sharding.

This module is the TPU-native replacement for the reference's entire
"distributed backend" (survey §2.6): the regex→device layer-placement
pipeline parallelism of `Emu2/emu/mixin.py:12-65` and the NCCL data-parallel
eval of `Emu1/mm_eval/__init__.py:56-90` both collapse into one
`jax.sharding.Mesh` with ("data", "model") axes. Weights are tensor-parallel
sharded over "model" (attention heads / MLP hidden / vocab), activations are
batch-sharded over "data", and XLA's GSPMD partitioner inserts the ICI
collectives — there are no hand-written communication calls on the forward
path.

Sharding rules are (regex, PartitionSpec) pairs matched against the
'/'-joined parameter path; each model module exports its own rule table
(e.g. `emu_tpu.models.llama.sharding_rules`).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_AXES = ("data", "model")


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = DEFAULT_AXES,
              devices=None) -> Mesh:
    """Create a Mesh over all (or the given) devices.

    Default: put every device on the "model" axis — inference of 13B/37B
    models is memory-bound per chip, so TP-first is the right default on a
    v5e-8 slice; callers doing batch eval pass e.g. shape=(n, 1).
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (1, len(devices))
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def _spec_for(path: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()  # replicate by default


def tree_paths_and_leaves(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        out.append(("/".join(parts), leaf))
    return out


def sharding_tree(params, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """Build a pytree of NamedShardings matching `params` by rule table."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for keypath, leaf in flat:
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        spec = _spec_for(path, rules)
        # Drop axis annotations that don't divide the dim (tiny test models).
        fixed = []
        for dim, axis in zip(leaf.shape, spec + (None,) * (len(leaf.shape) - len(spec))):
            if axis is None:
                fixed.append(None)
            else:
                size = mesh.shape[axis] if isinstance(axis, str) else int(
                    np.prod([mesh.shape[a] for a in axis]))
                fixed.append(axis if dim % size == 0 else None)
        shardings.append(NamedSharding(mesh, P(*fixed)))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_params(params, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """Place a parameter pytree onto the mesh according to the rule table."""
    return jax.device_put(params, sharding_tree(params, mesh, rules))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def data_sharding(mesh: Mesh, *batch_axis_first: int) -> NamedSharding:
    """Sharding for activations/batches: batch dim over the "data" axis."""
    return NamedSharding(mesh, P("data"))
