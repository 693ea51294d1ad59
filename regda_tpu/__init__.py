"""regda_tpu: a TPU-native (JAX/XLA/Pallas) unsupervised-domain-adaptation
segmentation framework with the capabilities of StuLiu/RegDA.

Layer map (mirrors the reference's structure, re-designed TPU-first):
  - ops/       pure-functional algorithm core (pseudo-labels, LRH, losses, ...)
  - models/    Flax NHWC models (dilated ResNet + dual PPM heads, SAM)
  - parallel/  device-mesh sharding + train-step state threading
  - datasets/  host-side tile reading / batching
  - aug/       RNG-explicit joint augmentations
  - utils/     eval harness, metrics, viz, checkpointing, logging
  - configs/   dotted-path importable config modules (ALL_CAPS attrs)
"""

__version__ = "0.1.0"
