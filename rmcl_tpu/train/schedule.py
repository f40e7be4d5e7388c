"""Optimizer + LR schedule (reference vilt/modules/vilt_utils.py:331-437).

Four parameter groups — (±weight-decay) × (±head lr_mult) — built as an
``optax.multi_transform`` over path-derived labels instead of the
reference's four torch param-group dicts.  Schedules follow HuggingFace
``get_polynomial_decay_schedule_with_warmup`` /
``get_cosine_schedule_with_warmup`` semantics exactly.

Faithful quirk: the reference's ``head_names`` list contains
``"barlowtwinshead"`` (vilt_utils.py:347) while the module attribute is
``barlowtwins_head`` — the substring never matches, so the BarlowTwins
head trains at base LR.  We mirror that by omitting it from HEAD_NAMES.

Non-parameters (momentum twins ``k_*``, reference vilt_module.py:68-94
sets requires_grad=False; BatchNorm running stats, torch buffers) are
labelled ``frozen`` and receive zero updates — their values are advanced
functionally by the train step instead.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rmcl_tpu.core.config import RMCLConfig

NO_DECAY_SUBSTRINGS = ("norm", "LayerNorm")  # + leaf name "bias"
HEAD_NAMES = ("vqa_classifier", "nlvr2_classifier", "moco_head")
FROZEN_LEAVES = ("running_mean", "running_var")

BASE_DECAY = "base_decay"
BASE_NO_DECAY = "base_no_decay"
HEAD_DECAY = "head_decay"
HEAD_NO_DECAY = "head_no_decay"
FROZEN = "frozen"


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            names.append(str(p.key))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            names.append(p.name)
        else:
            names.append(str(p))
    return tuple(names)


def _label_for(path) -> str:
    names = _path_names(path)
    if names[0].startswith("k_"):
        return FROZEN
    if names[-1] in FROZEN_LEAVES:
        return FROZEN
    is_head = any(any(h in n for h in HEAD_NAMES) for n in names)
    no_decay = (names[-1] == "bias"
                or any(any(s in n for s in NO_DECAY_SUBSTRINGS)
                       for n in names))
    if is_head:
        return HEAD_NO_DECAY if no_decay else HEAD_DECAY
    return BASE_NO_DECAY if no_decay else BASE_DECAY


def param_group_labels(params) -> Any:
    """Pytree of group labels, same structure as `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _label_for(path), params)


# ------------------------------------------------------------- schedules
def make_lr_schedule(cfg: RMCLConfig, max_steps: int,
                     lr: float = None) -> optax.Schedule:
    """HF-compatible warmup + (polynomial | cosine) decay, per-step."""
    base_lr = cfg.learning_rate if lr is None else lr
    warmup = cfg.warmup_steps
    if isinstance(warmup, float):
        warmup = int(max_steps * warmup)
    warmup = max(int(warmup), 0)

    if cfg.decay_power == "cosine":
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            warm = step / jnp.maximum(warmup, 1)
            progress = (step - warmup) / jnp.maximum(max_steps - warmup, 1)
            cos = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
            return base_lr * jnp.where(step < warmup, warm, cos)
        return sched

    power = float(cfg.decay_power)
    lr_end = cfg.end_lr

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup, 1)
        remaining = 1.0 - (step - warmup) / jnp.maximum(max_steps - warmup, 1)
        remaining = jnp.clip(remaining, 0.0, 1.0)
        decay = ((base_lr - lr_end) * remaining ** power + lr_end) / base_lr
        return base_lr * jnp.where(step < warmup, warm, decay)
    return sched


# ------------------------------------------------------------- optimizer
def _group_tx(cfg: RMCLConfig, max_steps: int, lr_scale: float, wd: float):
    sched = make_lr_schedule(cfg, max_steps, lr=cfg.learning_rate * lr_scale)
    if cfg.optim_type == "adamw":
        return optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8,
                           weight_decay=wd)
    if cfg.optim_type == "adam":
        return optax.adam(sched)
    if cfg.optim_type == "sgd":
        return optax.sgd(sched, momentum=0.9)
    raise ValueError(f"unknown optim_type {cfg.optim_type!r}")


def make_optimizer(cfg: RMCLConfig, params, max_steps: int,
                   accum: int = 1) -> Tuple[optax.GradientTransformation, Any]:
    """Returns (tx, labels).  tx.init expects the full param pytree.

    ``accum`` > 1 wraps the optimizer in ``optax.MultiSteps``: gradients
    of `accum` consecutive micro-batches are averaged before one real
    update (the reference's ``accumulate_grad_batches`` fed to
    pl.Trainer, run.py:86-88,105).  The inner per-group LR schedules
    advance once per REAL update, exactly like PL steps its scheduler
    once per optimizer step.  ``max_steps`` is therefore counted in
    optimizer steps, not micro-batches."""
    labels = param_group_labels(params)
    wd = cfg.weight_decay
    tx = optax.multi_transform(
        {
            BASE_DECAY: _group_tx(cfg, max_steps, 1.0, wd),
            BASE_NO_DECAY: _group_tx(cfg, max_steps, 1.0, 0.0),
            HEAD_DECAY: _group_tx(cfg, max_steps, cfg.lr_mult, wd),
            HEAD_NO_DECAY: _group_tx(cfg, max_steps, cfg.lr_mult, 0.0),
            FROZEN: optax.set_to_zero(),
        },
        labels,
    )
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum))
    return tx, labels
