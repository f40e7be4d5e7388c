"""Training orchestration — the reference's pl.Trainer + run.py path
(reference run.py:92-118) as one explicit loop.

Per step:
  1. host: next collated numpy batch (sharded loader)
  2. host: greedy text attack on the batch if text_view (the only part
     of the RMCL step that cannot live on-device; reference §3.3)
  3. device: ONE jitted program = PGD + all task losses + backward +
     AdamW + EMA + queue (rmcl_tpu/train/step.py)
  4. host: scalar metric accumulation, periodic logging

Validation runs the same jitted eval step; epoch end assembles
`val/the_metric` (MetricBag) and drives best/last checkpointing.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.core.buckets import bucket_enabled, text_bucket
from rmcl_tpu.core.config import RMCLConfig, active_tasks
from rmcl_tpu.data.datamodule import MultitaskDataModule
from rmcl_tpu.eval.metrics import MetricBag, Scalar
from rmcl_tpu.parallel import make_mesh, shard_batch
from rmcl_tpu.train.checkpoint import CheckpointManager
from rmcl_tpu.train.logging import MetricLogger
from rmcl_tpu.train.step import (
    TrainState, create_train_state, make_eval_step, make_train_step,
    resolve_max_steps)


class _ScratchBag:
    """Thread-private stand-in for MetricBag.extra used by prefetched
    attack calls; merged into train_metrics on the main thread only when
    the batch actually trains."""

    def __init__(self):
        self.extra: Dict[str, Scalar] = {}


def _resolve_ckpt_dir(load_path: str):
    """Resolve an orbax load_path through CheckpointManager's pointer
    scheme: accepts the checkpoint dir itself, a workdir containing
    LAST.ptr/BEST.ptr, or a logical `<workdir>/last` / `<workdir>/best`
    path (pre-pointer layout, or resolved via the sibling pointer
    file).  Returns the concrete dir or None (not an orbax source)."""

    def from_ptr(workdir: str, logical: str):
        ptr = os.path.join(workdir, logical.upper() + ".ptr")
        if os.path.isfile(ptr):
            with open(ptr) as f:
                target = os.path.join(workdir, f.read().strip())
            if os.path.isdir(target):
                return target
        return None

    base = os.path.basename(os.path.normpath(load_path))
    if os.path.isdir(load_path):
        resolved = from_ptr(load_path, "last") or from_ptr(load_path,
                                                           "best")
        if resolved and not os.path.isfile(
                os.path.join(load_path, "_CHECKPOINT_METADATA")):
            return resolved          # a workdir: follow its pointer
        return load_path             # a concrete checkpoint dir
    if base in ("last", "best"):
        return from_ptr(os.path.dirname(os.path.normpath(load_path))
                        or ".", base)
    return None


def _host_rows(v) -> np.ndarray:
    """Host-owned rows of an eval-step output.

    Multi-host eval outputs are globally batch-sharded; fetching the
    full array would need cross-host transfers (and the per-host
    qid/_valid bookkeeping refers to the HOST-LOCAL loader shard
    anyway).  Non-fully-addressable arrays therefore yield exactly this
    host's rows, assembled from the addressable shards in batch order;
    everything else (single-process, replicated scalars) fetches whole.
    Cross-host metric totals are reduced once per epoch in
    MetricBag.epoch_wrapup (reference PL dist_reduce_fx="sum")."""
    if not isinstance(v, jax.Array) or v.is_fully_addressable:
        return np.asarray(v)
    if v.ndim == 0:
        # replicated scalar (e.g. the batch-mean loss): any local copy
        return np.asarray(v.addressable_shards[0].data)
    pieces = {}
    for s in v.addressable_shards:
        start = s.index[0].start or 0 if s.index else 0
        pieces.setdefault(start, np.asarray(s.data))
    return np.concatenate([pieces[k] for k in sorted(pieces)], axis=0)


_TEXT_KEY_SUFFIXES = ("_ids", "_masks", "_labels", "_ids_mlm",
                      "_labels_mlm")


def bucket_text_batch(batch: Dict[str, Any],
                      max_text_len: int) -> Dict[str, Any]:
    """Slice every text-grid key to the smallest /8 bucket covering all
    valid tokens — the train-path twin of the attack/recall text
    buckets (PARITY #31).  Exact: the dropped columns are all-pad /
    all--100 and attention-masked.  Pays geometrically wherever the
    sequence crosses a 128-row kernel tile: the reference's irtr
    finetune configs leave max_image_len=-1 (config.py:349-406), where
    S = ~217 image tokens + 40 text pads to 384; real ~16-token
    captions bucket back under 256 (-33% kernel FLOPs per step).  At
    max_image_len=200 configs the padded S is unchanged and so is the
    program (bucket == max_text_len almost always; a smaller bucket
    changes only which all-pad columns ride along)."""
    mask_keys = [k for k in batch
                 if "text" in k and k.endswith("_masks")
                 and getattr(batch[k], "ndim", 0) == 2
                 and batch[k].shape[1] == max_text_len]
    if not mask_keys:
        return batch
    tb = max(int(np.asarray(batch[k]).sum(axis=1).max())
             for k in mask_keys)
    tb = text_bucket(tb, max_text_len)
    if tb == max_text_len:
        return batch
    out = dict(batch)
    for k, v in batch.items():
        if ("text" in k and getattr(v, "ndim", 0) == 2
                and v.shape[1] == max_text_len
                and k.endswith(_TEXT_KEY_SUFFIXES)):
            out[k] = v[:, :tb]
    return out


def _device_batch(batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    # jax.Array values pass straight through: the fused greedy attack
    # returns attacked ids as DEVICE arrays (fetch=False) that must not
    # be dropped or round-tripped through host numpy
    db = {k: jnp.asarray(v) for k, v in batch.items()
          if isinstance(v, (np.ndarray, jax.Array))
          and not k.startswith("_")}
    if mesh is None:
        return db
    if jax.process_count() > 1:
        # each host holds only its shard of the global batch: assemble
        # into global arrays (the multi-host replacement for the
        # reference's DistributedSampler per-rank split)
        from rmcl_tpu.parallel.mesh import host_local_to_global
        return host_local_to_global(db, mesh)
    return shard_batch(db, mesh)


def build_greedy_attacker(cfg: RMCLConfig, model, tokenizer):
    """Construct the per-framework greedy attacker (reference
    vilt_module.py:102-107,186-191,225-231,245-250), or None when the
    counter-fitted vectors are unavailable."""
    from rmcl_tpu.attacks import greedy as G
    tasks = active_tasks(cfg)
    cls = None
    if "moco" in tasks:
        cls = G.GreedyAttackMoco
    elif "barlowtwins" in tasks:
        cls = G.GreedyAttackBarlowTwins
    elif "nlvr2_attacked" in tasks:
        cls = G.GreedyAttackNlvr2
    elif "vqa_attacked" in tasks:
        cls = G.GreedyAttackVqa
    elif "irtr_attacked" in tasks:
        cls = G.GreedyAttackIrtr
    if cls is None:
        return None
    if cfg.synonym == "cos_sim":
        if not os.path.isfile(cfg.embedding_path):
            print(f"[train] text_view requested but embedding_path "
                  f"{cfg.embedding_path!r} missing — text view disabled")
            return None
        syn = G.SynonymTable(cfg.embedding_path, cfg.n_candidates,
                             cfg.sim_thred, cache_path=cfg.sim_path or None)
    else:
        syn = G.WordnetSynonyms(cfg.n_candidates)
    attacker = cls(cfg, model, tokenizer, syn)
    if cfg.greedy_impl == "fused":
        from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
        attacker = FusedGreedyAttack(attacker)
    return attacker


GREEDY_FRAMEWORKS = ("moco", "barlowtwins", "nlvr2_attacked",
                     "vqa_attacked", "irtr_attacked")


def greedy_attack_framework(cfg: RMCLConfig):
    tasks = active_tasks(cfg)
    return next((t for t in GREEDY_FRAMEWORKS if t in tasks), None)


def greedy_attack_extras(cfg: RMCLConfig, model, framework: str,
                         params, state, batch):
    """Pure, jittable attacker-extras computation — the SINGLE source of
    truth shared by the pipeline path (make_greedy_extras_fn) and the
    one-program attacked step (train/step.py make_attacked_train_step).

    moco: post-EMA key projection + queue — the reference runs
    compute_geometric AFTER the momentum update (objectives.py:256-265
    then :277-285), so the attacker must see the post-EMA key encoder.
    """
    from rmcl_tpu.models.heads import barlowtwins_head, moco_head
    from rmcl_tpu.models.vit import normalize_image_inputs
    from rmcl_tpu.objectives.contrastive import momentum_update
    from rmcl_tpu.objectives.losses import l2_normalize

    batch = normalize_image_inputs(batch, grid_hw=cfg.grid_hw,
                                   patch_size=cfg.patch_size)
    if framework == "moco":
        p = momentum_update(params, cfg.momentum)
        infer_k = model.infer_k(p, batch, deterministic=True)
        k = jax.lax.stop_gradient(l2_normalize(
            moco_head(p["k_moco_head"], infer_k["cls_feats"]), axis=1))
        return (k, state["proj_queue"], cfg.temperature)
    if framework == "barlowtwins":
        infer = model.infer(params, batch, deterministic=True)
        k, _ = barlowtwins_head(params["barlowtwins_head"],
                                infer["cls_feats"], training=True)
        return (jax.lax.stop_gradient(k),
                batch["text_ids"].shape[0], cfg.adv_lr)
    if framework == "nlvr2_attacked":
        return (jnp.asarray(batch["answers"], jnp.int32),)
    if framework == "vqa_attacked":
        return (jnp.asarray(batch["vqa_targets"]),)
    if framework == "irtr_attacked":
        infer = model.infer(params, batch, deterministic=True)
        tr = jax.lax.stop_gradient(l2_normalize(
            moco_head(params["moco_head"], infer["cls_feats"]), axis=1))
        return (tr, cfg.temperature,
                jnp.arange(batch["text_ids"].shape[0]))
    raise ValueError(f"no greedy framework for {framework!r}")


def make_greedy_extras_fn(cfg: RMCLConfig, model):
    """Returns `fn(ts, batch) -> extras` for the active framework
    (jitted greedy_attack_extras)."""
    framework = greedy_attack_framework(cfg)
    if framework is None:
        return None

    @jax.jit
    def f(params, state, batch):
        return greedy_attack_extras(cfg, model, framework, params,
                                    state, batch)

    return lambda ts, batch: f(ts.params, ts.state, batch)


def preempt_consensus(cfg: RMCLConfig, requested: bool,
                      steps_done: int) -> bool:
    """Step-boundary preemption consensus (SURVEY §5.3).  Single
    process: the local flag.  Multi-host: the flag is any-reduced
    across hosts every `preempt_sync_every` micro-batches, so every
    host leaves the step loop — and enters the collective checkpoint
    save — at the SAME step (a host acting on its local flag alone
    would deadlock the others' collectives).  Module-level so the
    multi-host dryrun (`__graft_entry__._mp_phase_worker`) drives this
    EXACT code path, not a copy."""
    if not cfg.graceful_preemption:
        return False
    if jax.process_count() == 1:
        return requested
    if steps_done % max(cfg.preempt_sync_every, 1):
        return False
    from rmcl_tpu.parallel import comm
    return any(comm.all_gather(bool(requested)))


def load_initial_params(cfg, params, state):
    """cfg.load_path handling (reference vilt_module.py:134-160
    train / :256-268 test): torch .ckpt files are converted with
    optional MLM/ITM head grafting from vilt_200k_mlm_itm; missing
    modules keep their fresh init (load_state_dict(strict=False)).
    Module-level so serving export (rmcl_tpu/serve.py) shares the
    exact Trainer loading semantics."""
    if not cfg.load_path:
        return params, state
    ckpt_dir = _resolve_ckpt_dir(cfg.load_path)
    if ckpt_dir:
        # orbax checkpoint dir (written by CheckpointManager):
        # restore params/state into the fresh-init template
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(ckpt_dir))
        # stderr: `rmcl serve` streams JSONL records on stdout
        print(f"[rmcl] restored orbax checkpoint {ckpt_dir}",
              file=sys.stderr)
        return restored["params"], restored.get("state", state)
    from rmcl_tpu.compat import load_torch_checkpoint
    pre = None
    needs_graft = (cfg.loss_names.get("mlm", 0) > 0
                   or cfg.loss_names.get("itm", 0) > 0)
    for cand in ("models_weight/vilt_200k_mlm_itm.ckpt",
                 "../models_weight/vilt_200k_mlm_itm.ckpt"):
        if needs_graft and os.path.isfile(cand):
            pre = cand
            break
    loaded_p, loaded_s = load_torch_checkpoint(
        cfg.load_path, cfg, pretrain_head_path=pre)

    def merge(init, loaded):
        if isinstance(init, dict) and isinstance(loaded, dict):
            out = dict(init)
            for k, v in loaded.items():
                out[k] = merge(init[k], v) if k in init else v
            return out
        return loaded

    print(f"[rmcl] loaded torch checkpoint {cfg.load_path} "
          f"({len(loaded_p)} top-level modules"
          f"{', heads grafted from ' + pre if pre else ''})",
          file=sys.stderr)
    return merge(params, loaded_p), merge(state, loaded_s)


class Trainer:
    def __init__(self, cfg: RMCLConfig, workdir: str = "result",
                 datamodule: Optional[MultitaskDataModule] = None,
                 vocab_path: Optional[str] = None,
                 use_mesh: bool = True):
        self.cfg = cfg
        self.workdir = os.path.join(workdir, cfg.exp_name)
        self.dm = datamodule or MultitaskDataModule(
            cfg, vocab_path=vocab_path,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        self.mesh = make_mesh() if use_mesh else None
        self.steps_done = 0
        self._preempt_requested = False

    # ----------------------------------------------------------- assembly
    def _load_initial(self, params, state):
        return load_initial_params(self.cfg, params, state)

    def setup(self, params=None, state=None):
        cfg = self.cfg
        self.dm.setup()
        ndev = max(jax.local_device_count(), 1) if self.mesh is not None else 1
        per_host = cfg.per_device_batchsize * ndev \
            if cfg.per_device_batchsize else \
            max(cfg.batch_size // max(jax.process_count(), 1), 1)
        # batch dim must divide evenly over the data mesh axis
        per_host = max((per_host // ndev) * ndev, ndev)
        self.per_host_batch = per_host
        # derive from the ACTUAL per-host loader length (not recomputed
        # from dataset size) so mid-epoch resume's epoch/skip math can
        # never drift from what the loader really yields; the loader
        # equalizes shard sizes across hosts (data/loader.py:_indices),
        # so this length is host-invariant
        steps_per_epoch = max(len(self.dm.train_loader(per_host)), 1)
        # gradient accumulation: micro-batches per optimizer step, the
        # reference's `grad_steps = batch_size // (per_gpu_batchsize *
        # num_gpus * num_nodes)` fed to pl.Trainer(
        # accumulate_grad_batches=...) (reference run.py:86-88,105).
        # Only active when per_device_batchsize caps the step batch
        # below cfg.batch_size (the desired GLOBAL recipe batch).
        world_batch = per_host * max(jax.process_count(), 1)
        self.accum_steps = (max(cfg.batch_size // world_batch, 1)
                            if cfg.per_device_batchsize else 1)
        # max_steps / LR schedule count OPTIMIZER steps (PL semantics);
        # steps_per_epoch and steps_done count micro-batches
        opt_steps_per_epoch = max(steps_per_epoch // self.accum_steps, 1)
        self.max_steps = resolve_max_steps(cfg, opt_steps_per_epoch)
        self.steps_per_epoch = steps_per_epoch

        if params is None and cfg.load_path:
            from rmcl_tpu.models.vilt import init_vilt
            params, state = init_vilt(jax.random.PRNGKey(cfg.seed), cfg)
            params, state = self._load_initial(params, state)
        # mesh threading also routes the fused Pallas kernels per-shard
        # on pure-DP meshes (models/vilt.py make_spec / PARITY #22)
        self.model, self.ts, self.tx = create_train_state(
            jax.random.PRNGKey(cfg.seed), cfg, max_steps=self.max_steps,
            params=params, state=state, accum=self.accum_steps,
            mesh=self.mesh)
        self.greedy = None
        self.text_augment = None
        self.image_augment = None
        if cfg.augmentation:
            # benign views replace the attacks (reference
            # objectives.py:277-279, 320-321)
            from rmcl_tpu.data.augmentation import (
                ImageAugmentation, TextAugmentation)
            if cfg.text_view:
                self.text_augment = TextAugmentation(cfg, self.dm.tokenizer)
            if cfg.image_view:
                self.image_augment = ImageAugmentation(
                    self.dm.datasets["train"]["concat"].datasets[0],
                    size=cfg.image_size)
        elif cfg.text_view:
            self.greedy = build_greedy_attacker(cfg, self.model,
                                                self.dm.tokenizer)

        # train/eval text bucket (bucket_text_batch): off whenever a
        # text view/augmentation supplies (B, max_text_len) attacked
        # ids that would mismatch a sliced batch, and off multi-host
        # (per-host buckets could differ and desynchronise the global
        # batch assembly — a scalar all-reduce per batch would fix it
        # if ever needed)
        self._text_bucket = (bucket_enabled(cfg, "train")
                             and not cfg.text_view
                             and not cfg.augmentation
                             and jax.process_count() == 1)

        from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
        _attackable_tasks = ("moco", "barlowtwins", "nlvr2_attacked",
                             "vqa_attacked", "irtr_attacked")
        self._fused_step = (cfg.fuse_attack_step
                            and isinstance(self.greedy, FusedGreedyAttack)
                            and any(t in active_tasks(cfg)
                                    for t in _attackable_tasks))
        if self._fused_step:
            # ONE XLA program per training step: attacker extras +
            # greedy attack + train step (train/step.py)
            from rmcl_tpu.train.step import make_attacked_train_step
            self.step_fn = make_attacked_train_step(
                cfg, self.model, self.tx, self.greedy, mesh=self.mesh,
                max_steps=self.max_steps, donate=True,
                accum=self.accum_steps)
        else:
            self.step_fn = make_train_step(cfg, self.model, self.tx,
                                           mesh=self.mesh,
                                           max_steps=self.max_steps,
                                           donate=True,
                                           accum=self.accum_steps)
        self.eval_fn = make_eval_step(cfg, self.model, mesh=self.mesh)
        self.ckpt = CheckpointManager(self.workdir)
        if cfg.resume_from and self.ckpt.has("last"):
            self.ts = self.ckpt.restore(self.ts, "last")
            self.steps_done = int(self.ts.step)
        self._extras_fn = None
        self.epoch = 0
        self.train_metrics = MetricBag(cfg.loss_names)
        self.val_metrics = MetricBag(cfg.loss_names)
        self.logger = MetricLogger(
            self.workdir, enabled=jax.process_index() == 0)

    # ------------------------------------------------------------- attack
    def _prefetch_attack(self, raw: Dict[str, Any]):
        """Worker-thread wrapper around `_attach_text_attack`: attack
        telemetry goes into a PRIVATE scratch bag (the shared
        train_metrics bag must not be mutated off-thread, and a
        prefetched batch that never trains must not pollute epoch
        num_changes/change_rate).  Returns (batch, scratch); the caller
        merges the scratch only when it actually consumes the batch."""
        scratch = _ScratchBag()
        return self._attach_text_attack(raw, bag=scratch), scratch

    def _merge_scratch(self, scratch: "_ScratchBag"):
        for k, s in scratch.extra.items():
            dst = self.train_metrics.extra.setdefault(k, Scalar())
            dst.value += s.value
            dst.n += s.n

    def _attach_text_attack(self, batch: Dict[str, Any],
                            bag: Optional[MetricBag] = None,
                            for_train: bool = True) -> Dict[str, Any]:
        """Runs on the HOST-LOCAL numpy batch (before any multi-host
        globalization — the attacker reads values with np.asarray)."""
        # --- benign augmented views (augmentation=True) ---
        if self.text_augment is not None and "text" in batch:
            _, ids, masks = self.text_augment.augment(batch["text"],
                                                      epoch=self.epoch)
            batch = dict(batch, attacked_text_ids=ids,
                         attacked_text_masks=masks)
        if self.image_augment is not None and "img_index" in batch:
            aug = self.image_augment.augment_indices(
                batch["img_index"], self.cfg.image_bucket_hw)
            if self.cfg.image_layout == "patch":
                from rmcl_tpu.data.arrow_dataset import hwc_to_patch_rows
                aug = hwc_to_patch_rows(aug, self.cfg.patch_size)
            batch = dict(batch, augmented_image=aug)
        if self.greedy is None:
            return batch
        if self._fused_step and for_train:
            # one-program path: the attack runs INSIDE the jitted step;
            # the host only precomputes the word/candidate tables
            # (telemetry comes back in the step metrics)
            return dict(batch, **self.greedy.prep_tables(
                np.asarray(batch["text_ids"])))
        # --- adversarial text view (greedy word substitution) ---
        db = {k: jnp.asarray(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
        if self._extras_fn is None:
            self._extras_fn = make_greedy_extras_fn(self.cfg, self.model)
        extras = self._extras_fn(self.ts, db)
        from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
        kw = ({"fetch": False} if isinstance(self.greedy, FusedGreedyAttack)
              else {})
        out = self.greedy.adv_attack_samples(self.ts.params, db, extras, **kw)
        # fused path: ids/masks stay DEVICE arrays all the way into the
        # jitted step (no host round trip); host path: numpy as before
        batch = dict(batch,
                     attacked_text_ids=out["txt_input_ids"],
                     attacked_text_masks=out["text_masks"])
        bag = bag if bag is not None else self.train_metrics
        bag.extra.setdefault("num_changes", Scalar()).update(
            out["num_changes"])
        bag.extra.setdefault("change_rate", Scalar()).update(
            out["change_rate"])
        return batch

    # ------------------------------------------------------- preemption
    def request_preemption(self):
        """Ask fit() to stop at the next step boundary and commit a
        mid-epoch 'last' checkpoint (SURVEY §5.3 — the reference has no
        preemption handling).  Installed as the SIGTERM action while
        fit() runs; schedulers/tests may also call it directly."""
        self._preempt_requested = True

    def _sigterm_guard(self):
        """Context manager installing the graceful-SIGTERM handler for
        the duration of fit() (main thread only — signal.signal is
        unavailable elsewhere; callers off the main thread keep the
        direct request_preemption() hook)."""
        import contextlib
        import signal
        import threading

        @contextlib.contextmanager
        def guard():
            if (not self.cfg.graceful_preemption
                    or threading.current_thread()
                    is not threading.main_thread()):
                yield
                return
            prev = signal.getsignal(signal.SIGTERM)

            def handler(signum, frame):
                print("[train] SIGTERM: checkpointing and exiting at "
                      "the next step boundary", flush=True)
                self.request_preemption()

            signal.signal(signal.SIGTERM, handler)
            try:
                yield
            finally:
                signal.signal(signal.SIGTERM, prev)

        return guard()

    def _preempt_now(self) -> bool:
        return preempt_consensus(self.cfg, self._preempt_requested,
                                 self.steps_done)

    # --------------------------------------------------------------- run
    def fit(self, max_steps_override: Optional[int] = None,
            log_every: Optional[int] = None):
        cfg = self.cfg
        # self.max_steps counts optimizer steps; the loop counts
        # micro-batches (×accum).  An explicit override is taken as a
        # raw micro-batch count (tests / fast_dev_run convenience).
        limit = max_steps_override or self.max_steps * self.accum_steps
        log_every = log_every or cfg.log_every_n_steps
        # per-step keys are folded in by micro-step index (not chained
        # splits), so a preempted+resumed run consumes the identical
        # stream — training is restart-invariant (RNG streams are not
        # bit-contractual vs the reference anyway, PARITY #15)
        rng = jax.random.PRNGKey(cfg.seed + 1)
        # on resume_from, restart at the epoch the restored step sits in
        # so the shuffle order / augmentation epoch state don't replay
        # epoch 0 and the epoch budget isn't extended; a MID-epoch
        # restore (preemption checkpoint) additionally fast-forwards the
        # first loader past the batches already trained — the epoch
        # permutation is a pure function of seed+epoch, so the resumed
        # run continues on the exact next batch
        epoch = self.steps_done // max(self.steps_per_epoch, 1)
        resume_skip = self.steps_done - epoch * self.steps_per_epoch
        preempted = False
        self._preempt_requested = False  # stale flag from a prior fit()
        t0 = time.time()

        # Host/device pipeline: the greedy text attack and augmentation
        # run on a worker thread for batch N+1 while the device executes
        # step N (the reference runs them strictly serially inside
        # training_step, vilt/modules/objectives.py:190-215).  The
        # attacker reads self.ts.params, which by submit time already
        # holds step-N's (asynchronously materialising) outputs, so the
        # attack targets the SAME parameters as the reference ordering —
        # its device programs simply queue behind step N while its host
        # tokenisation work overlaps.
        pool = None
        fut = None
        if cfg.host_prefetch and (self.greedy is not None
                                  or self.text_augment is not None
                                  or self.image_augment is not None):
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=1)

        guard = self._sigterm_guard()
        guard.__enter__()
        try:
            while self.steps_done < limit and epoch < cfg.max_epoch:
                self.epoch = epoch
                loader = self.dm.train_loader(self.per_host_batch)
                loader.set_epoch(epoch, skip_batches=resume_skip)
                resume_skip = 0
                it = iter(loader)
                raw = next(it, None)
                fut = (pool.submit(self._prefetch_attack, raw)
                       if pool is not None and raw is not None else None)
                while raw is not None:
                    if self.steps_done >= limit:
                        break
                    if fut is not None:
                        batch, scratch = fut.result()
                        self._merge_scratch(scratch)
                    else:
                        batch = self._attach_text_attack(raw)
                    fut = None
                    if self._text_bucket:
                        batch = bucket_text_batch(batch,
                                                  self.cfg.max_text_len)
                    db = _device_batch(batch, self.mesh)
                    sub = jax.random.fold_in(rng, self.steps_done)
                    self.ts, metrics = self.step_fn(self.ts, db, sub)
                    self.steps_done += 1
                    # submit the NEXT batch's host attack now — after
                    # the step dispatch (self.ts holds step-N's async
                    # outputs, so the attacker targets exactly the
                    # params the reference ordering would) but before
                    # the blocking metric fetch below, so the attack's
                    # tokenizer work runs while the device executes
                    # step N
                    raw = next(it, None)
                    if pool is not None and raw is not None:
                        fut = pool.submit(self._prefetch_attack, raw)
                    self.train_metrics.update(
                        {k: np.asarray(v) for k, v in metrics.items()})
                    if self.steps_done % log_every == 0:
                        dt = (time.time() - t0) / log_every
                        t0 = time.time()
                        self.logger.log(self.steps_done, metrics,
                                        prefix="train/")
                        print(f"[train] step {self.steps_done}/{limit} "
                              f"loss={float(metrics['total_loss']):.4f} "
                              f"lr={float(metrics['lr']):.2e} "
                              f"{dt*1e3:.0f} ms/step", flush=True)
                    if self._preempt_now():
                        preempted = True
                        break
                    if cfg.fast_dev_run:
                        break
                # drain a prefetch submitted for a batch we won't run
                # (step-limit/preemption break) BEFORE epoch_wrapup; its
                # telemetry lives in a private scratch bag and is
                # DISCARDED — an untrained batch must not count in
                # epoch stats
                if fut is not None:
                    try:
                        fut.result()
                    except Exception as e:  # pragma: no cover
                        print(f"[train] discarded prefetch failed: {e}",
                              flush=True)
                    fut = None
                if preempted:
                    # commit a mid-epoch 'last' NOW and exit cleanly —
                    # no validation (the preemption grace window is
                    # short); the finally block's wait() confirms the
                    # orbax commit + pointer swing before we return
                    self.ckpt.save_last(self.ts)
                    print(f"[train] preempted: 'last' checkpoint at "
                          f"micro-step {self.steps_done} scheduled; "
                          f"exiting fit()", flush=True)
                    break
                tm = self.train_metrics.epoch_wrapup("train")
                vm = self.validate()
                self.logger.log(self.steps_done, tm, prefix="train_epoch/")
                self.logger.log(self.steps_done, vm, prefix="val_epoch/")
                print(f"[epoch {epoch}] train_the_metric="
                      f"{tm.get('train/the_metric', 0):.4f} "
                      f"val_the_metric={vm.get('val/the_metric', 0):.4f}",
                      flush=True)
                self.ckpt.save_last(self.ts)
                self.ckpt.maybe_save_best(self.ts, vm)
                epoch += 1
                if cfg.fast_dev_run:
                    break
        finally:
            # always reached on errors/preemption too: the async orbax
            # save must COMMIT and its pointer swing (CheckpointManager
            # keeps the previous 'last' until then), and the prefetch
            # worker must not outlive fit()
            if pool is not None:
                pool.shutdown(wait=True)
            self.ckpt.wait()
            guard.__exit__(None, None, None)
        return self.ts

    # ---------------------------------------------------------------- val
    def validate(self, split: str = "val",
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        loader = (self.dm.val_loader(self.per_host_batch) if split == "val"
                  else self.dm.test_loader(self.per_host_batch))
        rng = jax.random.PRNGKey(cfg.seed + 2)
        bag = self.val_metrics

        # VQA test-submission collection (reference vqa_test_step
        # objectives.py:1519-1530 / vqa_test_wrapup :1537-1565)
        vqa_writer = None
        is_vqa = (cfg.loss_names.get("vqa", 0) >= 1
                  or cfg.loss_names.get("vqa_attacked", 0) >= 1)
        if split == "test" and is_vqa and self.dm.id2answer:
            from rmcl_tpu.eval.vqa import VQASubmissionWriter
            model_name = (os.path.basename(cfg.load_path).rsplit(".", 1)[0]
                          if cfg.load_path else cfg.exp_name)
            vqa_writer = VQASubmissionWriter(
                self.dm.id2answer, out_dir=cfg.log_dir,
                model_name=model_name)

        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            # the reference evaluates WITH the adversarial views (its
            # validation_step runs the same compute_* path incl.
            # compute_geometric, objectives.py:277-285)
            batch = self._attach_text_attack(batch, bag=bag,
                                             for_train=False)
            if getattr(self, "_text_bucket", False):
                batch = bucket_text_batch(batch, self.cfg.max_text_len)
            db = _device_batch(batch, self.mesh)
            rng, sub = jax.random.split(rng)
            ret = self.eval_fn(self.ts.params, self.ts.state, db, sub)
            valid = batch.get("_valid")
            retl = {k: _host_rows(v) for k, v in ret.items()
                    if hasattr(v, "ndim")}
            bag.update(retl, valid=valid)
            if vqa_writer is not None and "qid" in batch:
                qids = list(batch["qid"])
                logits = retl.get("vqa_logits",
                                  retl.get("vqa_attacked_logits"))
                if valid is not None and not valid.all():
                    qids = [q for q, keep in zip(qids, valid) if keep]
                    logits = logits[valid]
                vqa_writer.update(qids, logits)
            if cfg.fast_dev_run:
                break

        if vqa_writer is not None:
            from rmcl_tpu.parallel.comm import all_gather
            path = vqa_writer.finalize(
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                gather=all_gather if jax.process_count() > 1 else None)
            if path:
                print(f"[vqa] submission written to {path}", flush=True)

        recall = None
        if cfg.get_recall_metric and not cfg.fast_dev_run:
            # reference epoch_wrapup computes recall on EVERY validation
            # epoch (vilt_utils.py:90-96) and dispatches to the attacked
            # variant when irtr_attacked is active (:91-94)
            if cfg.loss_names.get("irtr_attacked", 0) >= 1:
                from rmcl_tpu.eval.retrieval import (
                    compute_attacked_irtr_recall)
                recall = compute_attacked_irtr_recall(
                    self, text_view=cfg.text_view,
                    image_view=cfg.image_view)
            else:
                from rmcl_tpu.eval.retrieval import compute_irtr_recall
                recall = compute_irtr_recall(self)
        return bag.epoch_wrapup(split, recall=recall)
