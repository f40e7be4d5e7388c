"""Host-level collective utilities (reference vilt/modules/dist_utils.py).

The reference pickles arbitrary python objects into byte tensors and
all_gathers them over a Gloo side-group (dist_utils.py:84-180) to avoid
NCCL deadlocks.  Under single-controller JAX none of that machinery is
needed: tensor collectives live INSIDE jitted programs (lax.psum /
all_gather inserted by sharding), and the few host-side object gathers
(eval score lists, VQA submissions) ride multihost_utils.

Single-process fallbacks make every function a no-op-like identity so
the same code runs in tests and on one host.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    """reference dist_utils.py:23-28"""
    return jax.process_count()


def get_rank() -> int:
    """reference dist_utils.py:31-36"""
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize():
    """Barrier across hosts (reference dist_utils.py:69-81)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("rmcl_sync")


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable objects from every host
    (reference dist_utils.py:144-180).  Pickle -> uint8 array ->
    process_allgather with per-host padding, exactly the reference's
    byte-tensor scheme but over DCN."""
    world = jax.process_count()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(bytes(gathered[i][: int(sizes[i][0])]))
            for i in range(world)]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """reference dist_utils.py:183-224 — gather to one host.  JAX has no
    point-to-point host gather; all hosts pay the allgather and non-dst
    hosts drop the result (sizes here are tiny eval artifacts)."""
    out = all_gather(data)
    return out if get_rank() == dst else []


def reduce_dict(d: Dict[str, Any], average: bool = True) -> Dict[str, Any]:
    """Mean/sum scalar dicts across hosts (reference dist_utils.py:241-270)."""
    world = jax.process_count()
    if world == 1:
        return dict(d)
    from jax.experimental import multihost_utils
    keys = sorted(d.keys())
    vec = np.asarray([float(np.asarray(d[k])) for k in keys], np.float64)
    summed = np.asarray(
        multihost_utils.process_allgather(vec)).sum(axis=0)
    if average:
        summed = summed / world
    return dict(zip(keys, summed))


def shared_random_seed() -> int:
    """All hosts agree on one seed (reference dist_utils.py:227-238)."""
    seed = np.random.randint(2 ** 31)
    return int(all_gather(seed)[0])
