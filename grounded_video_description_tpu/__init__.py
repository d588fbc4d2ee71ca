"""Grounded Video Description — TPU-native framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
facebookresearch/grounded-video-description (CVPR 2019):

* grounded video captioning on ActivityNet-Entities with pre-extracted
  region (Faster R-CNN fc6) and frame (ResNet/TSN) features,
* supervised + unsupervised training (LM, attention, grounding,
  region-classification losses),
* greedy (UNK-suppressed) and batched on-device beam-search decoding,
* object grounding evaluation on generated and ground-truth sentences,
* Visual-Genome knowledge transfer (fc7 + classifier weight surgery),
* TopDown LSTM and Masked-Transformer decoder families,
* data-parallel training over a `jax.sharding.Mesh` with XLA collectives.

Everything under `jit` uses static shapes (the task pads to fixed
1000 ROIs / 100 boxes / 20 tokens / 480 frames); the decoders are
`lax.scan` loops; hot attention ops have fused Pallas TPU kernels.
"""

__version__ = "0.1.0"

from grounded_video_description_tpu.config import GVDConfig  # noqa: F401
