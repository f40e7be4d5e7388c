"""Test config: force an 8-device virtual CPU mesh before JAX import.

Substitutes for the reference's missing distributed tests (SURVEY.md §4):
pjit sharding, the MoCo queue all_gather, and BarlowTwins all_reduce all
run on 8 virtual devices here.
"""

import os

# force-override: the driver environment pins JAX to the TPU tunnel
# (sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")),
# so the env var alone is not enough — update the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from rmcl_tpu.core.config import build_config  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    """A tiny ViLT for fast CPU tests: 2 layers, 64 hidden, 16px patches."""
    return build_config(
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        patch_size=16,
        image_size=64,
        image_bucket_hw=(64, 96),
        max_text_len=12,
        vocab_size=128,
        max_image_len=-1,
        use_pallas_attention=False,
        compute_dtype="float32",
        drop_rate=0.0,
    )


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


def make_fake_batch(cfg, batch=2, seed=0, valid_hw=None):
    """Batch with top-left-valid zero-padded images + random token ids."""
    r = np.random.RandomState(seed)
    H, W = cfg.image_bucket_hw
    img = np.zeros((batch, H, W, 3), np.float32)
    for b in range(batch):
        if valid_hw is None:
            h = r.randint(H // 2, H + 1)
            w = r.randint(W // 2, W + 1)
        else:
            h, w = valid_hw
        img[b, :h, :w] = r.uniform(-1, 1, (h, w, 3))
    T = cfg.max_text_len
    ids = r.randint(5, cfg.vocab_size, (batch, T)).astype(np.int32)
    masks = np.ones((batch, T), np.int32)
    masks[:, T - 3:] = 0
    ids[masks == 0] = 0
    return {
        "image": np.asarray(img),
        "text_ids": ids,
        "text_labels": np.full_like(ids, -100),
        "text_masks": masks,
    }
