"""hoigen_tpu — a TPU-native (JAX/XLA/Pallas/pjit) zero-shot HOI detection
framework with the capabilities of soberguo/HOIGen (ACM MM 2024).

Subpackages:
  labels    HICO-DET / V-COCO label tables and derived lookups
  ops       box ops, focal loss, roi-align, mask rasterization, NMS (static)
  models    CLIP (+instance adapters), DETR-R50, DINO-R50, UPT head, caches,
            CoOp-VAE feature generator
  data      dataset readers, dual-stream transforms, padded batching
  engine    pjit train/eval loops, checkpointing
  eval      detection AP meters, box-pair association (host/numpy)
  parallel  mesh & sharding helpers
  cli       command-line entry points
"""

__version__ = "0.1.0"
