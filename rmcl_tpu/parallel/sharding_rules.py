"""Parameter sharding rules: data-parallel + optional tensor parallel.

The reference is pure DDP (SURVEY.md §2.4) — replicated params are all
parity requires.  This module adds the idiomatic-TPU headroom: a 2-D
``(data, model)`` mesh where the transformer's fat matmuls are Megatron-
sharded over the ``model`` axis:

    attn.qkv  kernel (C, 3C)   -> shard OUT dim  (column parallel)
    attn.proj kernel (C, C)    -> shard IN dim   (row parallel)
    mlp.fc1   kernel (C, 4C)   -> shard OUT dim
    mlp.fc2   kernel (4C, C)   -> shard IN dim
    mlm decoder (C, V)         -> shard OUT (vocab) dim

Everything else (embeddings, norms, heads, momentum twins of the above
by the same rule) stays replicated.  With `jax.jit` the rules are just
`NamedSharding` constraints on the param pytree — XLA inserts the
all-reduces after proj/fc2, exactly the Megatron pattern, and the train
step code does not change.

Biases of column-parallel layers are sharded with their kernel's out
dim; row-parallel biases stay replicated (added after the reduce).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# (path-suffix match, PartitionSpec factory) — first hit wins.
# Paths are tuples of dict keys from the root of the param tree.


def _spec_for(path_names, leaf) -> P:
    names = list(path_names)
    # strip momentum-twin prefix: k_transformer shards like transformer
    if names and names[0].startswith("k_"):
        names[0] = names[0][2:]

    def tail(*suffix):
        return tuple(names[-len(suffix):]) == suffix

    nd = getattr(leaf, "ndim", 0)
    if "transformer" in names[:1]:
        if tail("attn", "qkv", "kernel"):
            return P(None, None, MODEL_AXIS) if nd == 3 else P(None, MODEL_AXIS)
        if tail("attn", "qkv", "bias"):
            return P(None, MODEL_AXIS) if nd == 2 else P(MODEL_AXIS)
        if tail("attn", "proj", "kernel"):
            return P(None, MODEL_AXIS, None) if nd == 3 else P(MODEL_AXIS, None)
        if tail("mlp", "fc1", "kernel"):
            return P(None, None, MODEL_AXIS) if nd == 3 else P(None, MODEL_AXIS)
        if tail("mlp", "fc1", "bias"):
            return P(None, MODEL_AXIS) if nd == 2 else P(MODEL_AXIS)
        if tail("mlp", "fc2", "kernel"):
            return P(None, MODEL_AXIS, None) if nd == 3 else P(MODEL_AXIS, None)
    if tail("mlm_score", "decoder", "kernel") or (
            "mlm_score" in names and tail("decoder", "kernel")):
        return P(None, MODEL_AXIS)
    if "mlm_score" in names and names[-1] == "bias" and len(names) == 2:
        return P(MODEL_AXIS)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings implementing the rules above.  On a mesh
    without a ``model`` axis everything is replicated (pure DP)."""
    has_model = MODEL_AXIS in mesh.axis_names

    def one(path, leaf):
        if not has_model:
            return NamedSharding(mesh, P())
        names = tuple(
            str(p.key) if isinstance(p, jax.tree_util.DictKey)
            else getattr(p, "name", str(p)) for p in path)
        return NamedSharding(mesh, _spec_for(names, leaf))

    return jax.tree_util.tree_map_with_path(one, params)


def apply_param_shardings(params: Any, mesh: Mesh) -> Any:
    """device_put the params with their rule shardings."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


# ----------------------------------------------------------------- ZeRO-1
DATA_AXIS = "data"


def zero1_shardings(opt_state: Any, mesh: Mesh) -> Any:
    """ZeRO-1 optimizer-state partitioning over the ``data`` axis.

    The reference replicates optimizer state across DDP ranks (plain
    PyTorch AdamW under PL, SURVEY.md §2.4 "ZeRO/FSDP: No").  On TPU the
    idiomatic upgrade is free with SPMD: shard every AdamW m/v (and
    grad-accumulation) leaf's dim-0 over ``data`` and let XLA turn the
    gradient all-reduce into reduce-scatter + the parameter update's
    all-gather — the classic ZeRO-1 schedule, no step-code changes.
    Params stay replicated (fwd/bwd unchanged); per-chip optimizer
    memory drops ~(ndata-1)/ndata · 2 · 113M·4B ≈ 0.79 GB at ndata=8.

    Leaves whose dim-0 is not divisible by the axis size (scalars,
    odd-shaped heads) stay replicated.  Meshes with a ``model`` axis are
    rejected: m/v there inherit the Megatron layout from ``tx.init`` and
    re-sharding dim-0 would clobber it.
    """
    if MODEL_AXIS in mesh.axis_names:
        raise ValueError("zero1 requires a pure-data mesh; optimizer "
                         "state on model-axis meshes already inherits "
                         "the tensor-parallel layout")
    ndp = mesh.shape[DATA_AXIS]

    def one(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] >= ndp and shape[0] % ndp == 0:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(one, opt_state)


def apply_zero1_shardings(opt_state: Any, mesh: Mesh) -> Any:
    sh = zero1_shardings(opt_state, mesh)
    return jax.tree.map(jax.device_put, opt_state, sh)
