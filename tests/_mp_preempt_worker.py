"""Worker for the REAL multi-process PREEMPTION-consensus test.

Covers the one branch of Trainer._preempt_now that only executes across
real processes: the any-reduce of the local preemption flag every
`preempt_sync_every` micro-batches (rmcl_tpu/train/loop.py).  Rank 1
alone requests preemption after its first micro-step; BOTH hosts must
leave the step loop — and enter the collective orbax save — at the SAME
step boundary (the next multiple of preempt_sync_every), or the other
host's collectives would deadlock.  The reference has no preemption
handling at all (SURVEY §5.3; PyTorch-Lightning just dies on SIGTERM).

Usage: python tests/_mp_preempt_worker.py <coordinator> <nprocs> <pid> <datadir>
Prints: MP_PREEMPT_RESULT <pid> <json payload>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, proc_id, datadir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs,
                               process_id=proc_id)
    assert jax.process_count() == num_procs

    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.train.loop import Trainer

    vocab = os.path.join(datadir, "vocab.txt")
    # global batch 2 -> 1 sample/host/step -> 4 micro-steps per epoch on
    # the 8-row vqa table's 4-row host shard; sync_every=2 makes the
    # consensus boundary land mid-epoch at micro-step 2
    cfg = build_config(
        "task_finetune_vqa",
        datasets=("vqa",), data_root=os.path.join(datadir, "vqa"),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, vqav2_label_size=5, use_pallas_attention=False,
        compute_dtype="float32", drop_rate=0.0, max_steps=6,
        warmup_steps=0, batch_size=2, num_workers=2, max_image_len=-1,
        preempt_sync_every=2,
        log_dir=os.path.join(datadir, "out_preempt"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab,
                 use_mesh=True)
    tr.setup()

    if proc_id == 1:                 # only THIS host sees the "signal"
        orig = tr.step_fn

        def step_and_flag(ts, db, rng):
            out = orig(ts, db, rng)
            tr.request_preemption()
            return out

        tr.step_fn = step_and_flag

    tr.fit()

    out = {
        "steps_done": tr.steps_done,
        "has_last": bool(tr.ckpt.has("last")),
        "restored_step": int(tr.ckpt.restore(tr.ts, "last").step),
    }
    print(f"MP_PREEMPT_RESULT {proc_id} {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()
