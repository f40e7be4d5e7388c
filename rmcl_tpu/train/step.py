"""Jittable train/eval steps with task dispatch + pjit sharding.

Re-designs the reference's PL training_step path (reference
vilt/modules/vilt_module.py:420-477: forward dispatches on current_tasks,
total loss = sum of the per-task losses) as a single pure function
``(TrainState, batch, rng) -> (TrainState, metrics)`` compiled once.
Everything that the reference runs as separate eager phases — the PGD
inner loop, the momentum (EMA) update, the MoCo queue enqueue, the
optimizer step — fuses into this one XLA program; only the greedy text
attack's tokenizer work stays on host and enters through
``batch["attacked_text_ids"]``.

Loss summation note: the reference sums every output key containing
"loss" (vilt_module.py:475), which double-counts BarlowTwins'
``barlowtwins_loss_invariance_*`` / ``_redundancy_*`` diagnostics
(objectives.py:485-486 — they re-add terms already inside
``barlowtwins_loss``).  We sum exactly the canonical per-task losses
(documented divergence; the scale of the BT loss differs by the
diagnostic double-count).

Parallelism: data-parallel over a 1-D ``data`` mesh axis.  Params,
optimizer state, and the MoCo queue are replicated; the batch is sharded
on dim 0.  XLA inserts psum for the gradient reduction (the reference's
NCCL all_reduce under DDP) and all_gather where the global batch view is
needed (queue enqueue — reference objectives.py:226-248 — and the
BarlowTwins global correlation matrix, objectives.py:476-478).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from rmcl_tpu.core.config import RMCLConfig, active_tasks
from rmcl_tpu.models.vilt import ViLTModel, init_vilt
from rmcl_tpu.objectives import contrastive, downstream, pretrain
from rmcl_tpu.parallel.mesh import batch_sharding, replicated_sharding
from rmcl_tpu.train.schedule import make_lr_schedule, make_optimizer
from rmcl_tpu import attacks


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    state: Dict[str, Any]     # MoCo queue/ptr, BT BN stats, ...
    step: jax.Array           # int32 scalar


def resolve_max_steps(cfg: RMCLConfig, steps_per_epoch: int = 1000) -> int:
    if cfg.max_steps:
        return int(cfg.max_steps)
    return int(cfg.max_epoch * steps_per_epoch)


def create_train_state(rng, cfg: RMCLConfig,
                       max_steps: Optional[int] = None,
                       params=None, state=None, mesh=None,
                       accum: int = 1):
    """Returns (model, TrainState, tx).

    With a mesh that has a ``model`` axis, parameters are laid out with
    the Megatron tensor-parallel rules (parallel/sharding_rules.py);
    optimizer state inherits the layout through ``tx.init``.

    ``accum`` > 1 enables gradient accumulation (reference
    `accumulate_grad_batches`, run.py:86-88,105): the optimizer applies
    one averaged update every `accum` micro-batches; `max_steps` counts
    optimizer steps."""
    model = ViLTModel(cfg, mesh=mesh)
    if params is None:
        params, init_state = init_vilt(rng, cfg)
        state = init_state if state is None else state
    state = state or {}
    if mesh is not None:
        from rmcl_tpu.parallel.sharding_rules import apply_param_shardings
        params = apply_param_shardings(params, mesh)
        state = jax.tree.map(
            lambda x: jax.device_put(x, replicated_sharding(mesh)), state)
    tx, _ = make_optimizer(cfg, params, max_steps or resolve_max_steps(cfg),
                           accum=accum)
    opt_state = tx.init(params)
    if mesh is not None and getattr(cfg, "zero1", False):
        from rmcl_tpu.parallel.sharding_rules import apply_zero1_shardings
        opt_state = apply_zero1_shardings(opt_state, mesh)
    ts = TrainState(params=params, opt_state=opt_state, state=state,
                    step=jnp.zeros((), jnp.int32))
    return model, ts, tx


# ---------------------------------------------------------------- helpers
def _merge_stats(params_branch: Dict, stats: Dict) -> Dict:
    """Recursively overwrite running-stat leaves inside a head param dict."""
    out = dict(params_branch)
    for k, v in stats.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_stats(out[k], v)
        else:
            out[k] = v
    return out


def _attacked_text_of(batch) -> Optional[Dict[str, Any]]:
    if "attacked_text_ids" in batch:
        return {"text_ids": batch["attacked_text_ids"],
                "text_masks": batch["attacked_text_masks"]}
    return None


def _build_pgd(cfg: RMCLConfig, model: ViLTModel, task: str):
    a = cfg
    if task == "moco":
        return attacks.make_pgd_moco(model, a.adv_steps_img, a.adv_lr_img,
                                     a.adv_max_norm_img, a.temperature)
    if task == "barlowtwins":
        return attacks.make_pgd_barlowtwins(model, a.adv_steps_img,
                                            a.adv_lr_img, a.adv_max_norm_img,
                                            a.adv_lr)
    if task == "nlvr2_attacked":
        return attacks.make_pgd_nlvr2(model, a.adv_steps_img, a.adv_lr_img,
                                      a.adv_max_norm_img, a.attack_idx)
    if task == "vqa_attacked":
        return attacks.make_pgd_vqa(model, a.adv_steps_img, a.adv_lr_img,
                                    a.adv_max_norm_img, a.vqav2_label_size)
    if task == "irtr_attacked":
        return attacks.make_pgd_irtr(model, a.adv_steps_img, a.adv_lr_img,
                                     a.adv_max_norm_img, a.temperature)
    return None


# canonical loss keys per task (see module docstring)
_TASK_LOSS_KEYS = {
    "mlm": ("mlm_loss",),
    "mpp": ("mpp_loss",),
    "mppd": ("mppd_loss",),
    "mpfr": ("mpfr_loss",),
    "itm": ("itm_loss", "itm_wpa_loss"),
    "vqa": ("vqa_loss",),
    "nlvr2": ("nlvr2_loss",),
    "irtr": ("irtr_loss",),
    "moco": ("moco_loss",),
    "barlowtwins": ("barlowtwins_loss",),
    "vqa_attacked": ("vqa_attacked_loss",),
    "nlvr2_attacked": ("nlvr2_original_loss", "nlvr2_attacked_loss"),
    "irtr_attacked": ("irtr_original_loss", "irtr_attacked_loss"),
}


def compute_all_tasks(cfg: RMCLConfig, model: ViLTModel, params, state,
                      batch, rng, *, train: bool) -> Tuple[Any, Dict, Any, Dict]:
    """Run every active task (reference forward vilt_module.py:420-469).
    Returns (total_loss, ret, new_params, new_state)."""
    from rmcl_tpu.models.vit import normalize_image_inputs
    batch = normalize_image_inputs(batch, grid_hw=cfg.grid_hw,
                                   patch_size=cfg.patch_size)
    tasks = active_tasks(cfg)
    ret: Dict[str, Any] = {}
    new_params, new_state = params, dict(state)
    attacked_text = _attacked_text_of(batch) if cfg.text_view else None
    rngs = dict(zip(tasks, jax.random.split(rng, max(len(tasks), 1))))

    if "mlm" in tasks:
        ret.update(pretrain.compute_mlm(model, params, batch,
                                        rng=rngs["mlm"], train=train))
    if "mpp" in tasks:
        ret.update(pretrain.compute_mpp(model, params, batch,
                                        rng=rngs["mpp"], train=train))
    if "mppd" in tasks:
        ret.update(pretrain.compute_mppd(model, params, batch,
                                         rng=rngs["mppd"], train=train))
    if "mpfr" in tasks:
        ret.update(pretrain.compute_mpfr(model, params, batch,
                                         rng=rngs["mpfr"], train=train))
    if "itm" in tasks:
        ret.update(pretrain.compute_itm_wpa(model, params, batch,
                                            rng=rngs["itm"], train=train))
    aug_image = batch.get("augmented_image") if cfg.augmentation else None
    if "moco" in tasks:
        r, new_params, new_state = contrastive.compute_moco_contrastive(
            model, params, state, batch, rng=rngs["moco"], train=train,
            text_view=cfg.text_view, image_view=cfg.image_view,
            attacked_text=attacked_text,
            pgd_fn=(_build_pgd(cfg, model, "moco")
                    if cfg.image_view and not cfg.augmentation else None),
            temperature=cfg.temperature, momentum=cfg.momentum,
            per_step_bs=batch["text_ids"].shape[0],
            fuse_views=cfg.fuse_moco_views,
            attacked_image=aug_image, augmentation=cfg.augmentation)
        ret.update(r)
    if "barlowtwins" in tasks:
        r, _, new_state = contrastive.compute_barlowtwins_contrastive(
            model, params, new_state, batch, rng=rngs["barlowtwins"],
            train=train, text_view=cfg.text_view, image_view=cfg.image_view,
            attacked_text=attacked_text,
            pgd_fn=(_build_pgd(cfg, model, "barlowtwins")
                    if cfg.image_view and not cfg.augmentation else None),
            adv_lr=cfg.adv_lr, per_step_bs=batch["text_ids"].shape[0],
            attacked_image=aug_image, augmentation=cfg.augmentation)
        ret.update(r)
    if "vqa" in tasks:
        ret.update(downstream.compute_vqa(model, params, batch,
                                          rng=rngs["vqa"], train=train))
    if "vqa_attacked" in tasks:
        ret.update(downstream.compute_vqa_attack(
            model, params, batch, rng=rngs["vqa_attacked"], train=train,
            image_view=cfg.image_view, attacked_text=attacked_text,
            pgd_fn=(_build_pgd(cfg, model, "vqa_attacked")
                    if cfg.image_view else None)))
    if "nlvr2" in tasks:
        ret.update(downstream.compute_nlvr2(model, params, batch,
                                            rng=rngs["nlvr2"], train=train))
    if "nlvr2_attacked" in tasks:
        ret.update(downstream.compute_nlvr2_attack(
            model, params, batch, rng=rngs["nlvr2_attacked"], train=train,
            image_view=cfg.image_view, attacked_text=attacked_text,
            pgd_fn=(_build_pgd(cfg, model, "nlvr2_attacked")
                    if cfg.image_view else None)))
    if "irtr" in tasks:
        ret.update(downstream.compute_irtr(
            model, params, batch, rng=rngs["irtr"], train=train,
            false_len=cfg.draw_false_text))
    if "irtr_attacked" in tasks:
        ret.update(downstream.compute_irtr_attacked(
            model, params, batch, rng=rngs["irtr_attacked"], train=train,
            false_len=cfg.draw_false_text, image_view=cfg.image_view,
            attacked_text=attacked_text,
            pgd_fn=(_build_pgd(cfg, model, "irtr_attacked")
                    if cfg.image_view else None)))

    total = jnp.zeros((), jnp.float32)
    for t in tasks:
        for k in _TASK_LOSS_KEYS.get(t, ()):
            if k in ret:
                total = total + jnp.asarray(ret[k], jnp.float32)
    return total, ret, new_params, new_state


def _scalar_metrics(ret: Dict[str, Any]) -> Dict[str, Any]:
    return {k: v for k, v in ret.items()
            if hasattr(v, "ndim") and v.ndim == 0}


# ------------------------------------------------------------- train step
def make_train_step(cfg: RMCLConfig, model: ViLTModel,
                    tx: optax.GradientTransformation,
                    mesh=None, max_steps: Optional[int] = None,
                    donate: bool = True, accum: int = 1) -> Callable:
    """Returns jitted ``train_step(ts, batch, rng) -> (ts, metrics)``.

    With a mesh, in/out shardings pin the TrainState replicated and the
    batch dim-0 sharded over the ``data`` axis.

    ``accum`` must match the value `tx` was built with (MultiSteps): the
    step body runs per micro-batch — EMA twins, the MoCo queue, and BN
    stats advance every call, exactly like the reference's per-batch
    training_step under `accumulate_grad_batches` — while `tx` applies
    the averaged update on every `accum`-th call.  `ts.step` counts
    micro-batches; the logged lr is indexed by optimizer step.
    """
    lr_sched = make_lr_schedule(cfg, max_steps or resolve_max_steps(cfg))
    train_step = _train_step_body(cfg, model, tx, lr_sched, accum)
    return _jit_step(train_step, mesh, donate,
                     inherit_ts=getattr(cfg, "zero1", False))


def _train_step_body(cfg: RMCLConfig, model: ViLTModel, tx, lr_sched,
                     accum: int = 1):
    def train_step(ts: TrainState, batch, rng):
        def loss_fn(p):
            total, ret, new_p, new_s = compute_all_tasks(
                cfg, model, p, ts.state, batch, rng, train=True)
            return total, (ret, new_p, new_s)

        (total, (ret, aux_params, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)

        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)

        # graft functionally-updated non-optimizer leaves:
        #  * momentum twins (EMA; reference objectives.py:256-260)
        for k in params:
            if k.startswith("k_"):
                params = dict(params, **{k: aux_params[k]})
        #  * BarlowTwins BN running stats
        if "bt_bn_stats" in new_state:
            bt = _merge_stats(params["barlowtwins_head"],
                              new_state.pop("bt_bn_stats"))
            params = dict(params, barlowtwins_head=bt)

        metrics = _scalar_metrics(ret)
        metrics["total_loss"] = total
        metrics["lr"] = lr_sched(ts.step // accum if accum > 1 else ts.step)
        new_ts = TrainState(params=params, opt_state=opt_state,
                            state=new_state, step=ts.step + 1)
        return new_ts, metrics

    return train_step


def _jit_step(train_step, mesh, donate: bool, inherit_ts: bool = False):
    if mesh is not None:
        from rmcl_tpu.parallel.sharding_rules import MODEL_AXIS
        repl = replicated_sharding(mesh)
        bsh = batch_sharding(mesh)
        if inherit_ts:
            # ZeRO-1: the TrainState carries its creation-time layout
            # (replicated params, data-sharded optimizer state) — None
            # inherits it; outputs propagate the same layout so the
            # donated buffers are reused in place.
            return jax.jit(
                train_step,
                in_shardings=(None, bsh, repl),
                donate_argnums=(0,) if donate else (),
            )
        if MODEL_AXIS in mesh.axis_names:
            # tensor-parallel layout: TrainState keeps the shardings it
            # was created with (None = inherit); XLA inserts the
            # Megatron all-reduces from the param constraints
            return jax.jit(
                train_step,
                in_shardings=(None, bsh, repl),
                donate_argnums=(0,) if donate else (),
            )
        return jax.jit(
            train_step,
            in_shardings=(repl, bsh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


# ------------------------------------------- fused attack + train step
def make_attacked_train_step(cfg: RMCLConfig, model: ViLTModel,
                             tx: optax.GradientTransformation,
                             greedy, mesh=None,
                             max_steps: Optional[int] = None,
                             donate: bool = True, accum: int = 1) -> Callable:
    """ONE XLA program for the full attacked train step: in-graph
    attacker extras -> the fused greedy text attack
    (attacks/greedy_fused.py) -> the train step.  The host supplies
    only the precomputed word/candidate tables (greedy.prep_tables)
    under TABLE_KEYS batch keys; everything else, including the
    attacked ids handoff, stays on device.  The in-graph extras mirror
    make_greedy_extras_fn (train/loop.py) per framework: moco post-EMA
    key projection (reference objectives.py:256-285), BT projection,
    NLVR2 labels, VQA targets, repaired-IRTR text projections.

    vs the 3-program pipeline (extras + attack + step): identical math,
    minus two dispatches and (for moco/BT/irtr) the duplicated forward
    the separate extras program paid.
    """
    from rmcl_tpu.attacks.greedy_fused import TABLE_KEYS, FusedGreedyAttack
    from rmcl_tpu.train.loop import (
        greedy_attack_extras, greedy_attack_framework)

    assert isinstance(greedy, FusedGreedyAttack), \
        "make_attacked_train_step needs the fused greedy attacker"
    framework = greedy_attack_framework(cfg)
    assert framework is not None, "no attacked framework active"
    lr_sched = make_lr_schedule(cfg, max_steps or resolve_max_steps(cfg))
    base_body = _train_step_body(cfg, model, tx, lr_sched, accum)
    attack_body = greedy.build_attack_body()

    def attacked_step(ts: TrainState, batch, rng):
        from rmcl_tpu.models.vit import normalize_image_inputs
        tables = [batch[k] for k in TABLE_KEYS[:-1]]
        nw = batch["gw_nw"]
        clean = {k: v for k, v in batch.items() if k not in TABLE_KEYS}
        # u8 wire format -> f32 ONCE; extras/attack/step all inherit
        clean = normalize_image_inputs(clean, grid_hw=cfg.grid_hw,
                                       patch_size=cfg.patch_size)

        # single source of truth with the pipeline path (train/loop.py)
        extras = greedy_attack_extras(cfg, model, framework,
                                      ts.params, ts.state, clean)
        ids, masks, n_changed = attack_body(
            ts.params, clean, extras, *tables)
        batch2 = dict(clean, attacked_text_ids=ids,
                      attacked_text_masks=masks)
        new_ts, metrics = base_body(ts, batch2, rng)
        nchf = n_changed.astype(jnp.float32)
        metrics["num_changes"] = jnp.mean(nchf)
        metrics["change_rate"] = jnp.mean(
            nchf / jnp.maximum(nw.astype(jnp.float32), 1.0))
        return new_ts, metrics

    return _jit_step(attacked_step, mesh, donate,
                     inherit_ts=getattr(cfg, "zero1", False))


# -------------------------------------------------------------- eval step
def make_eval_step(cfg: RMCLConfig, model: ViLTModel, mesh=None) -> Callable:
    """Jitted no-grad forward of all active tasks; returns the full ret
    dict (logits included) for host-side metric accumulation."""

    def eval_step(params, state, batch, rng):
        total, ret, _, _ = compute_all_tasks(
            cfg, model, params, state, batch, rng, train=False)
        ret["total_loss"] = total
        return ret

    if mesh is not None:
        repl = replicated_sharding(mesh)
        bsh = batch_sharding(mesh)
        return jax.jit(eval_step,
                       in_shardings=(repl, repl, bsh, repl))
    return jax.jit(eval_step)
