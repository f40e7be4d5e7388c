"""Config system: frozen dataclass + named presets.

Re-designs the reference's Sacred experiment config (reference
vilt/config.py:24-116 base keys, :119-471 named configs) as a typed,
immutable dataclass.  CLI composition `build_config("task_moco",
text_view=True)` mirrors `python run.py with task_moco text_view=True`.

TPU-specific additions (not in the reference):
  * image_bucket_hw     — static (H, W) canvas the input pipeline pads to,
                          replacing per-batch-max padding so XLA compiles once
  * use_pallas_attention— fused masked-attention kernel toggle
  * mesh_shape / mesh_axis_names — jax.sharding.Mesh layout
  * compute_dtype       — bf16 activations on the MXU (replaces AMP fp16)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# Loss-name multiplexer — reference vilt/config.py:6-21.  A task is active
# iff its weight >= 1 (reference vilt/modules/vilt_utils.py:325-329).
LOSS_KEYS = (
    "moco",
    "barlowtwins",
    "itm",
    "mlm",
    "mpp",
    "vqa",
    "nlvr2",
    "irtr",
    "irtr_attacked",
    "nlvr2_attacked",
    "vqa_attacked",
    # extensions beyond the reference's 11 keys: the reference ships
    # compute_mppd/compute_mpfr (objectives.py:668-711) but no loss keys
    # or heads for them (dormant); here they are activatable.
    "mppd",
    "mpfr",
)


def loss_names(d: Optional[Dict[str, float]] = None) -> Dict[str, float]:
    ret = {k: 0.0 for k in LOSS_KEYS}
    if d:
        ret.update(d)
    return ret


@dataclass(frozen=True)
class RMCLConfig:
    # Experiment
    exp_name: str = "rmcl"
    seed: int = 0
    datasets: Tuple[str, ...] = ("coco", "vg", "sbu", "gcc")
    loss_names: Dict[str, float] = field(default_factory=lambda: loss_names({"itm": 1, "mlm": 1}))
    # desired GLOBAL batch; when per_device_batchsize caps the per-step
    # batch below it, the Trainer derives accumulate_grad_batches =
    # batch_size // (per_device_batchsize * devices * hosts) and wraps
    # the optimizer in optax.MultiSteps (train/loop.py setup,
    # train/schedule.py make_optimizer) — the reference's run.py:86-88
    batch_size: int = 4096

    # Image
    train_transform_keys: Tuple[str, ...] = ("pixelbert",)
    val_transform_keys: Tuple[str, ...] = ("pixelbert",)
    image_size: int = 384
    max_image_len: int = -1
    patch_size: int = 32
    draw_false_image: int = 1
    # drop false-image/text draws no ACTIVE loss reads (only itm
    # consumes false_image_0, only irtr/irtr_attacked consume
    # false_text_i) — the reference decodes a false image per sample
    # even for task_moco, where nothing reads it (data/datamodule.py)
    skip_unused_false_draws: bool = True
    image_only: bool = False

    # Text
    vqav2_label_size: int = 3129
    max_text_len: int = 40
    tokenizer: str = "bert-base-uncased"
    vocab_size: int = 30522
    whole_word_masking: bool = False
    mlm_prob: float = 0.15
    draw_false_text: int = 0

    # Transformer
    vit: str = "vit_base_patch32_384"
    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 12
    mlp_ratio: int = 4
    drop_rate: float = 0.1

    # Optimizer
    optim_type: str = "adamw"
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    decay_power: Any = 1  # 1 | "cosine" | float power
    max_epoch: int = 100
    max_steps: Optional[int] = 25000
    warmup_steps: Any = 2500  # int steps or float fraction of max_steps
    end_lr: float = 0.0
    lr_mult: float = 1.0  # downstream-head LR multiplier

    # Downstream
    get_recall_metric: bool = False

    # Contrastive
    multimodal: bool = False
    num_negative: int = 0
    text_view: bool = False
    image_view: bool = False
    augmentation: bool = False
    num_beams: int = 20
    num_return_sequences: int = 20
    type_txt_augm: Tuple[str, ...] = ("PEGASUS", "EDA")
    momentum: float = 1.0
    temperature: float = 1.0
    adv_lr: float = 0.0051  # doubles as the Barlow-Twins off-diag lambda
    # BarlowTwins projector widths (hidden -> d1 -> d2 -> out).  The
    # reference hardcodes 8192-8192-8192 (reference heads.py:88-106);
    # configurable here so scaled-down models/tests keep the head
    # proportionate.  Checkpoint compat is shape-driven, unaffected.
    bt_proj_dims: Tuple[int, int, int] = (8192, 8192, 8192)

    # Attacks — PGD (reference vilt/config.py:89-92)
    adv_steps_img: int = 5
    adv_lr_img: float = 0.5
    adv_max_norm_img: float = 0.1
    attack_idx: Tuple[bool, bool] = (False, False)
    # Attacks — geometric greedy (reference vilt/config.py:94-100)
    n_candidates: int = 5
    max_loops: int = 10
    sim_thred: float = 0.5
    cos_sim: bool = True
    synonym: str = "cos_sim"
    embedding_path: str = "./attack/counter-fitted-vectors.txt"
    sim_path: str = "cos_sim_counter_fitting.npy"

    # Trainer
    resume_from: Optional[str] = None
    fast_dev_run: bool = False
    val_check_interval: float = 1.0
    test_only: bool = False

    # Environment
    data_root: str = ""
    log_dir: str = "result"
    per_device_batchsize: int = 0
    num_devices: int = 1
    num_nodes: int = 1
    load_path: str = ""
    num_workers: int = 4
    # loader worker PROCESSES (0 = thread pool).  The thread pool's
    # scaling ceiling is the measured GIL-held fraction of the sample
    # work (~0.32 -> ~3.1 effective workers, scripts/measure_loader.py
    # --gil probe); fork-based worker processes sidestep the GIL like
    # the reference's torch DataLoader workers and scale with vCPUs
    # (data/loader.py).  Requires os.fork (POSIX).  Workers fork from
    # a process that may already hold a live TPU client; that is safe
    # only because they do pure numpy/PIL/pyarrow work and never touch
    # the device runtime — if a deployment ever sees wedged workers,
    # construct loaders before first jax use (torch has the same
    # fork-after-CUDA constraint).
    num_worker_procs: int = 0
    precision: int = 16  # kept for parity; on TPU this selects bf16 compute

    # ----- TPU-native knobs (no reference counterpart) -----
    # static pad canvas (H, W).  MinMaxResize at size=384 caps the long
    # side at int(1333/800*384)=639 -> //32*32 = 608, so (384, 608)
    # holds every landscape image exactly; portrait images fit via the
    # bucket shrink (use (608, 608) to reproduce reference sizing for
    # both orientations).
    image_bucket_hw: Tuple[int, int] = (384, 608)
    # device image layout: "hwc" pixel canvas (B, H, W, 3) or "patch"
    # rows (B, gh*gw, P*P*3).  Patch rows are the TPU-native layout: the
    # 3-wide channel minor dim of hwc wastes 125/128 vector lanes on
    # every pixel-space op (PGD lives there) and patchify needs a 6-D
    # transpose; rows make patchify one matmul (see models/vit.py).
    # Measured +8% full-step throughput on v5e (61.6 vs 57.2 pairs/s).
    image_layout: str = "patch"
    # measured on v5e at ViLT shapes (B32,H12,S256,D64): XLA's batched
    # attention GEMMs beat the fused Pallas kernel (748us vs 980us;
    # full RMCL step 50.6 vs 45.9 pairs/s) — the D=64 contraction
    # underfills the MXU and XLA fuses the softmax chain already.  The
    # Pallas kernel stays available for long-sequence regimes.
    use_pallas_attention: bool = False
    # explicit attention implementation: "" derives the measured-best
    # path (models/vilt.py:_derive_attn_impl — the fused Pallas
    # half-block kernel on a single TPU chip, xla_bf16 on TPU meshes,
    # plain xla elsewhere) | "xla" | "xla_bf16" | "fused"
    # (LN1+qkv+attn+proj Pallas half-block, ops/pallas_block.py)
    # | "pallas" (attention-only rmcl kernel) | "flash" (jax library
    # TPU kernel)
    attention_impl: str = ""
    # MLP half-block implementation: "" derives the measured-best on a
    # single TPU chip like attention_impl; "xla" forces the plain path;
    # "fused" runs LN2+fc1+gelu+fc2 as one Pallas kernel
    # (ops/pallas_block.py:fused_mlp_half) on DETERMINISTIC forwards
    # only (PGD, key encoder, candidate scoring, eval — paths where
    # dropout is a no-op); "fused_train" additionally covers the
    # training views with IN-KERNEL dropout (Mosaic PRNG, mask stream
    # differs from the XLA impls — PARITY #19; needs the raised
    # scoped-vmem limit, core/tpu_env.py).
    mlp_impl: str = ""
    # greedy text attack scheduling: "fused" runs the whole max_loops
    # substitution loop as ONE on-device XLA program (2 dispatches per
    # batch instead of 2*max_loops; attacks/greedy_fused.py); "host"
    # keeps the per-loop host orchestration (reference scheduling).
    greedy_impl: str = "fused"
    # compile attacker extras + greedy attack + train step into ONE XLA
    # program (train/step.py make_attacked_train_step; moco framework
    # with greedy_impl="fused").  Measured b16 v5e hot path: 871 ms
    # (separate programs) -> 782 ms.  Parity with the pipeline is
    # asserted in tests (same loss, same updated params).
    fuse_attack_step: bool = True
    # greedy attack live-set compaction: after each fused-attack loop,
    # samples whose word budget / eligible-word set is exhausted stop
    # contributing picks; once the live count fits in ceil(frac * B)
    # the remaining loops run on a gathered compact batch — a geometric
    # cascade ceil(B*frac^k) down to 1 sample (B=16: 16 -> 4 -> 1) —
    # shrinking the dominant B*n_candidates candidate-scoring forward
    # accordingly.  Exact for per-sample-independent attack losses
    # (moco, nlvr2, vqa, irtr — skipped automatically for barlowtwins,
    # whose loss is batch-coupled); token-id parity with the host
    # orchestrator is asserted in tests/test_attacks.py.  0 disables.
    # Default 0.5 (round 4): with the dead-final-loop skip the finer
    # cascade catches the half-live phase the old 0.25 cascade (4 -> 1)
    # missed — worst-mix 438 -> 388 ms measured, realistic unchanged.
    # The cascade is capped at TWO stages (b16: 8 -> 4; see
    # attacks/greedy_fused.py): a third stage added nothing measurable
    # and its extra compiled scoring/grad programs tipped the
    # smoke-test TPU worker into an executable-memory OOM.
    greedy_compact_frac: float = 0.5
    # cap on the candidate-scoring forward's row count (B*n_candidates).
    # When a batch exceeds it, the candidate axis is scored in
    # ceil(n_candidates/ncg) sequential lax.map chunks of ncg =
    # max(1, cap // B) candidates each — same per-row math, ncg x
    # smaller live activation set.  Guards large-batch attack programs
    # against HBM OOM (b256's unchunked scoring batch crashed the TPU
    # worker, ROADMAP round 3).  Default = 640 rows, the largest
    # scoring forward verified on hardware (b128 x 5 candidates): the
    # proven operating points compile the identical unchunked program
    # and anything larger is capped at proven size.  0 disables.
    greedy_score_max_rows: int = 640
    # /8 text-length bucket family (core/buckets.py): three independent
    # consumers of the same static-shape geometry, each with its own
    # flag (VERDICT r4 #5 — one flag gating all three made disabling
    # "the attack bucket" silently change the eval program).
    #   attack_text_bucket — the fused greedy attack's INTERNAL forwards
    #     (saliency grad + candidate scoring): max_text_len pads every
    #     caption to 40 (reference config.py:44) but candidates of a
    #     caption share its valid length, so the attack runs its
    #     internal sequences at the smallest /8 bucket no candidate can
    #     outgrow (attacks/greedy_fused.py:_text_bucket).  EXACT by
    #     construction; attacked ids re-enter the train step at full
    #     max_text_len.  One retrace per bucket, like the (B, W, M)
    #     table buckets.
    #   eval_text_bucket — retrieval ranking at the real caption-length
    #     bucket (eval/retrieval.py).
    #   train_text_bucket — train/val batch text-grid slicing
    #     (train/loop.py bucket_text_batch).
    # None inherits the deprecated umbrella flag below; True/False
    # override it per consumer.
    attack_text_bucket: Optional[bool] = None
    eval_text_bucket: Optional[bool] = None
    train_text_bucket: Optional[bool] = None
    # DEPRECATED umbrella alias (rounds <= 4 name): default for the
    # three per-consumer flags above.
    greedy_text_bucket: bool = True
    # graceful preemption (SURVEY §5.3; the reference has none): while
    # fit() runs, SIGTERM sets a flag instead of killing the process;
    # at the next step boundary (agreed across hosts every
    # preempt_sync_every micro-batches when process_count > 1) the loop
    # commits a mid-epoch 'last' checkpoint and returns cleanly.
    # resume_from restores it and fast-forwards the interrupted epoch's
    # loader to the exact next batch (data order is a pure function of
    # seed+epoch), so preempted+resumed training replays nothing and
    # loses nothing.
    graceful_preemption: bool = True
    preempt_sync_every: int = 16
    # dropout mask bit source: "fp32" (threefry bernoulli) | "pack8"
    # (byte lanes from 8x fewer threefry words) | "rbg" (hardware RNG).
    # Measured on v5e b16: threefry dropout costs 54 ms of the 260 ms
    # RMCL step (replayed under remat); rbg recovers all of it (77.5 vs
    # 61.4 pairs/s), pack8 most (72.0).  Exact marginal rate either way;
    # see models/layers.py:dropout and PARITY.md #15.
    dropout_impl: str = "rbg"
    # transformer scan-carry layout: "3d" (B,S,C) | "2d" (flat B*S,C —
    # reshapes only around the attention core; see models/vit.py)
    block_layout: str = "3d"
    # host->device image wire format: "uint8" ships raw resized pixels
    # + per-sample (h, w) metadata and normalizes at program entry
    # (models/vit.py:normalize_image_inputs) — BIT-IDENTICAL tensors to
    # the f32 pipeline (same (x/255-0.5)/0.5 f32 op order; padding
    # forced to exactly 0.0 from the metadata rect), 4x less host
    # collate+transfer bytes.  "float32" ships normalized pixels like
    # the reference.  PARITY #26.
    image_dtype: str = "uint8"
    compute_dtype: str = "bfloat16"
    # MoCo negatives-queue storage dtype ("" = compute_dtype): bf16
    # halves the (128, 65536) l_neg reads in every InfoNCE and greedy
    # candidate-scoring call; keys are l2-normalized so bf16 rounding
    # is benign (PARITY #17).  Set "float32" for bit-faithful storage.
    queue_dtype: str = ""
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axis_names: Tuple[str, ...] = ("data",)
    # ZeRO-1: shard AdamW m/v (and grad-accum buffers) over the data
    # axis instead of replicating them like the reference's DDP
    # (parallel/sharding_rules.py:zero1_shardings).  Same numerics —
    # XLA rewrites the grad all-reduce into reduce-scatter + update
    # all-gather; saves ~0.79 GB/chip of optimizer HBM at 8-way DP.
    # Pure-data meshes only (model-axis meshes keep the TP layout).
    zero1: bool = False
    # jax.checkpoint each transformer block.  None derives the
    # measured-best setting (models/vilt.py:_derive_remat): OFF when
    # both fused Pallas half-block kernels are active (their custom_vjp
    # saves only (x, weights) per half and the backward kernels
    # recompute in VMEM, so the remat replay is pure waste — b16 step
    # 170.8 -> 157.4 ms / 101.7 pairs/s, attacked one-program 551 ->
    # 532 ms), ON for every other TPU path (the XLA block saves
    # bias-broadcast fp32 S² residuals without it; b64 OOMs).
    remat_blocks: Optional[bool] = None
    remat_policy: str = "full"  # "full" | "dots" (save matmul outputs)
    # override remat INSIDE the PGD attack loop only (None = inherit
    # remat_blocks); the attack differentiates w.r.t. the image delta,
    # not params, so its activation live-set is smaller than the train
    # step's and the trade-off can differ (attacks/pgd.py)
    pgd_remat: Optional[bool] = None
    # kernel implementation override for the PGD inner loop's forwards
    # ("" inherits the train impls; "xla" forces the XLA block path
    # with bf16-S² attention).  Rationale: the fused Mosaic backward
    # kernels compute dW and dx inseparably in one opaque kernel, so a
    # PGD iteration — which only needs dL/dδ through FROZEN params —
    # pays an in-kernel forward recompute (~3 fwd-equivalents per iter
    # instead of 2) because the dx-only det backward rebuilds the
    # attention tensors from x.  MEASURED DEAD END on v5e (round 5,
    # ROADMAP "Round 5 findings"): the XLA path either stores every
    # activation of the 5-iter loop (b128 remat=0: compile OOM, 25 GB)
    # or replays the forward under remat (b128: 1678 vs 1069.8 ms;
    # b16: 201.7 vs 149.6) — the fused det kernels' recompute IS the
    # cheapest known dx path at both batch sizes.  Knob kept for
    # other geometries.
    pgd_kernel_impl: str = ""
    # batch the MoCo clean+attacked view forwards into one 4B pass
    # (same math, one rng stream instead of per-view streams).
    # Measured SLOWER on v5e at b16 (45.7 vs 56.8 pairs/s — the larger
    # effective batch hits the same HBM-bound regime as b64); off by
    # default, useful on larger-HBM parts.
    fuse_moco_views: bool = False
    # run the host-side greedy attack / augmentation for batch N+1 on a
    # worker thread while the device executes step N (the reference
    # serialises them inside training_step; see train/loop.py)
    host_prefetch: bool = True
    log_every_n_steps: int = 10

    # ---------------------------------------------------------------
    @property
    def per_step_bs(self) -> int:
        """Global per-optimizer-step batch (reference vilt_module.py:73)."""
        return self.num_devices * self.num_nodes * self.per_device_batchsize

    @property
    def grid_hw(self) -> Tuple[int, int]:
        """Static patch-grid dims of the padded canvas."""
        h, w = self.image_bucket_hw
        return h // self.patch_size, w // self.patch_size

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_hw
        return gh * gw

    @property
    def image_seq_len(self) -> int:
        """Image tokens incl. CLS after (optional) static patch selection."""
        n = self.num_patches
        if self.max_image_len and self.max_image_len > 0:
            n = min(n, self.max_image_len)
        return n + 1

    @property
    def text_seq_len(self) -> int:
        return self.max_text_len

    @property
    def seq_len(self) -> int:
        return self.text_seq_len + self.image_seq_len

    def replace(self, **kw) -> "RMCLConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Named presets — mirror reference vilt/config.py:119-471 one-for-one.
# Each maps to a dict of overrides applied on top of the base config.
# ---------------------------------------------------------------------------

_ATTACK_DEFAULTS = dict(
    adv_steps_img=5,
    adv_lr_img=0.05,
    adv_max_norm_img=0.005,
    n_candidates=5,
    max_loops=10,
    sim_thred=0.5,
    cos_sim=True,
    synonym="cos_sim",
)

NAMED_CONFIGS: Dict[str, Dict[str, Any]] = {
    # reference vilt/config.py:119-124
    "env_dandelin": dict(num_devices=8, num_nodes=1),
    # reference vilt/config.py:128-164
    "task_moco": dict(
        exp_name="moco",
        datasets=("coco",),
        multimodal=True,
        num_negative=65536,
        momentum=0.999,
        temperature=0.07,
        augmentation=False,
        num_beams=5,
        num_return_sequences=5,
        loss_names=loss_names({"moco": 1}),
        batch_size=128,
        max_epoch=1,
        max_image_len=200,
        **_ATTACK_DEFAULTS,
    ),
    # reference vilt/config.py:166-199
    "task_barlowtwins": dict(
        exp_name="barlowtwins",
        datasets=("coco",),
        multimodal=True,
        augmentation=False,
        loss_names=loss_names({"barlowtwins": 1}),
        adv_lr=0.0051,
        batch_size=128,
        max_epoch=1,
        max_image_len=200,
        **_ATTACK_DEFAULTS,
    ),
    # reference vilt/config.py:201-209
    "task_mlm_itm": dict(
        exp_name="mlm_itm",
        datasets=("coco",),
        loss_names=loss_names({"itm": 1, "mlm": 1}),
        batch_size=4096,
        max_epoch=10,
        max_image_len=200,
    ),
    # reference vilt/config.py:212-220
    "task_mlm_itm_randaug": dict(
        exp_name="mlm_itm_randaug",
        datasets=("coco", "vg", "sbu", "gcc"),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"itm": 1, "mlm": 1}),
        batch_size=4096,
        max_epoch=10,
        max_image_len=200,
    ),
    # reference vilt/config.py:223-230
    "task_mlm_itm_mpp": dict(
        exp_name="mlm_itm_mpp",
        datasets=("coco", "vg", "sbu", "gcc"),
        loss_names=loss_names({"itm": 1, "mlm": 1, "mpp": 1}),
        batch_size=4096,
        max_epoch=10,
        max_image_len=200,
    ),
    # reference vilt/config.py:233-243
    "task_finetune_nlvr2": dict(
        exp_name="finetune_nlvr2",
        datasets=("nlvr2",),
        loss_names=loss_names({"nlvr2": 1}),
        batch_size=128,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=1e-4,
    ),
    # reference vilt/config.py:245-256
    "task_finetune_nlvr2_randaug": dict(
        exp_name="finetune_nlvr2_randaug",
        datasets=("nlvr2",),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"nlvr2": 1}),
        batch_size=128,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=1e-4,
    ),
    # reference vilt/config.py:258-287
    "task_finetune_nlvr2_randaug_attacked": dict(
        exp_name="finetune_nlvr2_randaug_attacked",
        datasets=("nlvr2",),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"nlvr2_attacked": 1}),
        batch_size=128,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=1e-4,
        attack_idx=(True, True),
        **_ATTACK_DEFAULTS,
    ),
    # reference vilt/config.py:289-301
    "task_finetune_vqa": dict(
        exp_name="finetune_vqa",
        datasets=("vqa",),
        loss_names=loss_names({"vqa": 1}),
        batch_size=256,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=1e-4,
        val_check_interval=0.1,
        lr_mult=10,
    ),
    # reference vilt/config.py:304-317
    "task_finetune_vqa_randaug": dict(
        exp_name="finetune_vqa_randaug",
        datasets=("vqa",),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"vqa": 1}),
        batch_size=256,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=1e-4,
        val_check_interval=0.1,
        lr_mult=10,
    ),
    # reference vilt/config.py:319-347
    "task_finetune_vqa_randaug_attacked": dict(
        exp_name="finetune_vqa_randaug_attacked",
        datasets=("vqa",),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"vqa_attacked": 1}),
        batch_size=128,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=1e-4,
        val_check_interval=0.1,
        lr_mult=10,
        **_ATTACK_DEFAULTS,
    ),
    # reference vilt/config.py:349-360
    "task_finetune_irtr_coco": dict(
        exp_name="finetune_irtr_coco",
        datasets=("coco",),
        loss_names=loss_names({"itm": 0.5, "irtr": 1}),
        batch_size=256,
        max_epoch=128,
        max_steps=None,
        warmup_steps=0.1,
        get_recall_metric=True,
        draw_false_text=15,
        learning_rate=1e-4,
    ),
    # reference vilt/config.py:363-375
    "task_finetune_irtr_coco_randaug": dict(
        exp_name="finetune_irtr_coco_randaug",
        datasets=("coco",),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"itm": 0.5, "irtr": 1}),
        batch_size=128,
        max_epoch=2,
        max_steps=None,
        warmup_steps=0.1,
        get_recall_metric=True,
        draw_false_text=15,
        learning_rate=1e-4,
    ),
    # reference vilt/config.py:377-406
    "task_finetune_irtr_coco_randaug_attacked": dict(
        exp_name="finetune_irtr_coco_randaug_attacked",
        datasets=("coco",),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"itm": 0.5, "irtr_attacked": 1}),
        batch_size=128,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        get_recall_metric=True,
        draw_false_text=15,
        learning_rate=1e-4,
        test_only=True,
        attack_idx=(False, True),
        **{**_ATTACK_DEFAULTS, "max_loops": 4},
    ),
    # reference vilt/config.py:408-419
    "task_finetune_irtr_f30k": dict(
        exp_name="finetune_irtr_f30k",
        datasets=("f30k",),
        loss_names=loss_names({"itm": 0.5, "irtr": 1}),
        batch_size=128,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        get_recall_metric=True,
        draw_false_text=15,
        learning_rate=1e-4,
    ),
    # reference vilt/config.py:422-434
    "task_finetune_irtr_f30k_randaug": dict(
        exp_name="finetune_irtr_f30k_randaug",
        datasets=("f30k",),
        train_transform_keys=("pixelbert_randaug",),
        loss_names=loss_names({"itm": 0.5, "irtr": 1}),
        batch_size=128,
        max_epoch=10,
        max_steps=None,
        warmup_steps=0.1,
        get_recall_metric=True,
        draw_false_text=15,
        learning_rate=1e-4,
    ),
    # reference vilt/config.py:440-461
    "step25k": dict(max_epoch=100, max_steps=25000),
    "step50k": dict(max_epoch=100, max_steps=50000),
    "step100k": dict(max_epoch=100, max_steps=100000),
    "step200k": dict(max_epoch=200, max_steps=200000),
    # reference vilt/config.py:464-471
    "vit32_base": dict(
        vit="vit_base_patch32_384",
        patch_size=32,
        hidden_size=768,
        num_heads=12,
        num_layers=12,
    ),
}


def named_configs() -> List[str]:
    return sorted(NAMED_CONFIGS.keys())


# ------------------------------------------------------------- ViT presets
def _vit_geometry(patch: int, dim: int, depth: int, heads: int, size: int,
                  mlp: int = 4) -> Dict[str, Any]:
    # static canvas from the MinMax /32 math: shorter side = size,
    # longer = floor(1333/800 * size) floored to /32
    # (data/transforms.py:min_max_size; reference utils.py:5-27)
    longer = int((1333 / 800) * size) // 32 * 32
    return dict(patch_size=patch, hidden_size=dim, num_layers=depth,
                num_heads=heads, mlp_ratio=mlp, image_size=size,
                image_bucket_hw=(size, longer))


# Named ViT geometries — the reference registers ~25 timm factories
# (reference vision_transformer.py:926-1383) though its named configs only
# ever instantiate vit_base_patch32_384 (config.py:464-471).
# `build_config(vit=<name>)` fills in any geometry key not explicitly set;
# named configs and keyword overrides always win.  The in21k variants share
# their base geometry (only the pretraining data differs); hybrid-resnet
# backbones and the distillation-token variants are different architectures
# and are not reproduced (dead code in the reference).
VIT_PRESETS: Dict[str, Dict[str, Any]] = {
    # reference vision_transformer.py:927 — "custom small": d8 h8 mlp3
    "vit_small_patch16_224": _vit_geometry(16, 768, 8, 8, 224, mlp=3),
    "vit_base_patch16_224": _vit_geometry(16, 768, 12, 12, 224),
    "vit_base_patch32_224": _vit_geometry(32, 768, 12, 12, 224),
    "vit_base_patch16_384": _vit_geometry(16, 768, 12, 12, 384),
    "vit_base_patch32_384": _vit_geometry(32, 768, 12, 12, 384),
    "vit_large_patch16_224": _vit_geometry(16, 1024, 24, 16, 224),
    "vit_large_patch32_224": _vit_geometry(32, 1024, 24, 16, 224),
    "vit_large_patch16_384": _vit_geometry(16, 1024, 24, 16, 384),
    "vit_large_patch32_384": _vit_geometry(32, 1024, 24, 16, 384),
    "vit_base_patch16_224_in21k": _vit_geometry(16, 768, 12, 12, 224),
    "vit_base_patch32_224_in21k": _vit_geometry(32, 768, 12, 12, 224),
    "vit_large_patch16_224_in21k": _vit_geometry(16, 1024, 24, 16, 224),
    "vit_large_patch32_224_in21k": _vit_geometry(32, 1024, 24, 16, 224),
    # DeiT geometries (reference vision_transformer.py:1278-1323)
    "vit_deit_tiny_patch16_224": _vit_geometry(16, 192, 12, 3, 224),
    "vit_deit_small_patch16_224": _vit_geometry(16, 384, 12, 6, 224),
    "vit_deit_base_patch16_224": _vit_geometry(16, 768, 12, 12, 224),
    "vit_deit_base_patch16_384": _vit_geometry(16, 768, 12, 12, 384),
}


def build_config(*names: str, **overrides: Any) -> RMCLConfig:
    """Compose named presets left-to-right, then apply keyword overrides.

    Mirrors Sacred's `with name1 name2 key=value` composition order
    (reference run.py / vilt/config.py:437).
    """
    merged: Dict[str, Any] = {}
    for name in names:
        if name not in NAMED_CONFIGS:
            raise KeyError(
                f"Unknown named config {name!r}; available: {named_configs()}"
            )
        merged.update(NAMED_CONFIGS[name])
    merged.update(overrides)
    # `vit` name fills in geometry keys not explicitly set anywhere
    vit_name = merged.get("vit")
    if vit_name is not None and vit_name != RMCLConfig.vit:
        if vit_name not in VIT_PRESETS:
            raise KeyError(
                f"Unknown vit preset {vit_name!r}; available: "
                f"{sorted(VIT_PRESETS)}")
        for k, v in VIT_PRESETS[vit_name].items():
            merged.setdefault(k, v)
    # normalize container types
    for k in ("datasets", "train_transform_keys", "val_transform_keys",
              "type_txt_augm", "attack_idx", "image_bucket_hw",
              "mesh_shape", "mesh_axis_names"):
        if k in merged and isinstance(merged[k], list):
            merged[k] = tuple(merged[k])
    return RMCLConfig(**merged)


def active_tasks(cfg: RMCLConfig) -> List[str]:
    """Tasks with loss weight >= 1 (reference vilt_utils.py:325-329)."""
    return [k for k, v in cfg.loss_names.items() if v >= 1]
