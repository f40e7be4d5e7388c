"""rmcl_tpu — TPU-native robust multimodal contrastive learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
stanFurrer/Robust-Multimodal-Contrastive-Learning (reference mounted at
/root/reference): a single-stream ViLT-B/32 vision-language transformer
trained with ITM/MLM/MPP/VQA/NLVR2/IRTR objectives plus robust contrastive
frameworks (MoCo-style momentum queue InfoNCE, Barlow-Twins) whose extra
views come from on-device PGD image attacks and a gradient-guided greedy
word-substitution text attack.

Architecture (TPU-first, not a port):
  core/        config dataclasses + named presets (reference vilt/config.py)
  models/      pure-functional ViLT: embeddings, ViT blocks, heads
  ops/         Pallas kernels (fused masked attention) + jnp fallbacks
  objectives/  pure (params, state, batch, rng) -> (loss, metrics, state) fns
  attacks/     PGD (lax.fori_loop, jitted) + greedy text attack
  data/        arrow datasets, WordPiece tokenizer, pixelbert buckets
  parallel/    mesh/sharding helpers, collective wrappers
  train/       optax optimizer groups, schedules, train loop, orbax ckpt
  eval/        IRTR recall, VQA submission, NLVR2 split metrics
  compat/      torch-ckpt -> pytree converter w/ head grafting
  cli/         run entry point
"""

__version__ = "0.1.0"
