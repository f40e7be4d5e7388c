"""Worker for the REAL multi-process (process_count > 1) test.

Launched by tests/test_multiprocess.py as N separate OS processes, each
owning 4 virtual CPU devices, joined through jax.distributed into one
8-device global mesh — the closest this environment gets to the
reference's multi-node DDP (reference run.py:92-112): per-process data
shards assembled with host_local_array_to_global_array, XLA-inserted
gradient psum, cross-process object all_gather over DCN.

Usage: python tests/_mp_worker.py <coordinator> <num_procs> <proc_id>
Prints one line: MP_RESULT <proc_id> <loss1> <loss2> <gather_ok>
"""

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
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs,
                               process_id=proc_id)
    assert jax.process_count() == num_procs
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * num_procs

    import numpy as np  # noqa: E402
    import jax.numpy as jnp  # noqa: E402
    from rmcl_tpu.core.config import build_config, loss_names
    from rmcl_tpu.parallel import comm
    from rmcl_tpu.parallel.mesh import host_local_to_global, make_mesh
    from rmcl_tpu.train.step import create_train_state, make_train_step

    cfg = build_config(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names({"moco": 1}),
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0,
        max_steps=100, warmup_steps=0, num_negative=16, momentum=0.99,
        image_view=True, adv_steps_img=1, adv_lr_img=0.05,
        adv_max_norm_img=0.005)

    mesh = make_mesh()                       # all 8 global devices
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, mesh=mesh, donate=False)

    # per-process LOCAL batch shard (4 samples each, disjoint seeds) —
    # the reference's DistributedSampler rank split
    r = np.random.RandomState(100 + proc_id)
    H, W = cfg.image_bucket_hw
    img = r.uniform(-1, 1, (4, H, W, 3)).astype(np.float32)
    T = cfg.max_text_len
    ids = r.randint(5, cfg.vocab_size, (4, T)).astype(np.int32)
    masks = np.ones((4, T), np.int32)
    local = {"image": img, "text_ids": ids,
             "text_labels": np.full_like(ids, -100), "text_masks": masks}
    batch = host_local_to_global(
        {k: jnp.asarray(v) for k, v in local.items()}, mesh)

    losses = []
    for s in range(2):
        ts, metrics = step_fn(ts, batch, jax.random.PRNGKey(s))
        losses.append(float(metrics["moco_loss"]))

    comm.synchronize()
    gathered = comm.all_gather({"rank": comm.get_rank(),
                                "loss": losses[-1]})
    gather_ok = (len(gathered) == num_procs
                 and sorted(g["rank"] for g in gathered)
                 == list(range(num_procs)))

    print(f"MP_RESULT {proc_id} {losses[0]:.8f} {losses[1]:.8f} "
          f"{int(gather_ok)}", flush=True)


if __name__ == "__main__":
    main()
