"""Device mesh + sharding layout for RMCL.

Replaces the reference's NCCL DDP plumbing (reference run.py:92-112,
vilt/modules/dist_utils.py): instead of per-process replicas exchanging
gradients through NCCL all_reduce, we lay the global batch out over a
1-D ``data`` mesh axis with ``jax.sharding`` and let XLA insert the
collectives (psum for gradient reduction, all_gather where a global view
is needed — e.g. the MoCo queue enqueue, reference objectives.py:226-248).

ViLT-B is ~113M params, so parameters and optimizer state stay replicated
(the reference's plain-DDP layout, SURVEY.md §2.4); the mesh is built with
room for extra axes (``model``) so tensor-parallel shardings can be added
without changing call sites.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    """Build a Mesh over `devices` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; all other dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: str = DATA_AXIS) -> Dict[str, Any]:
    """Device-put every batch leaf with its dim-0 sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_local_to_global(batch: Dict[str, Any], mesh: Mesh,
                         axis: str = DATA_AXIS) -> Dict[str, Any]:
    """Multi-host: assemble per-host batch shards into global arrays
    (replaces the reference's DistributedSampler per-rank split,
    reference vilt/datamodules/multitask_datamodule.py:44-47)."""
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, P(axis)), batch)


def global_to_host_local(tree: Any, mesh: Mesh) -> Any:
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: multihost_utils.global_array_to_host_local_array(
            x, mesh, P()), tree)
