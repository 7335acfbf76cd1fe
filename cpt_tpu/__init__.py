"""cpt_tpu — a TPU-native framework with the capabilities of thunlp/CPT.

Rebuilds CPT's two-stage cross-modal prompting pipeline (VinVL region-feature
extraction + Oscar cross-modal BERT with colorful-prompt scoring) from scratch
for TPUs: JAX/XLA/Pallas compute, `jax.sharding` SPMD parallelism, static
shapes throughout.

Layout:
  config/      typed dataclass config tree (replaces yacs + argparse)
  utils/       TSV IO, tokenizer, weight conversion, metrics, checkpointing
  structures/  fixed-shape padded Boxes / image batches
  ops/         Pallas + XLA kernels (RoIAlign, NMS, prompt rendering, attention)
  models/      flax models: Oscar BertImg stack; VinVL X152-C4 detector
  parallel/    device mesh + sharding rules
  data/        task datasets and prompt construction (host-side, numpy)
  engine/      extraction / training / evaluation loops
  tools/       CLI entry points mirroring the reference's cmds
"""

__version__ = "0.1.0"
