"""vision_toolbox_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision framework.

Re-designed from scratch with the capability surface of gau-nernst/vision-toolbox:
backbones (Darknet/CSPDarknet/YOLOv5, VoVNet, ViT, DeiT, CaiT, Swin, ConvNeXt,
MLP-Mixer, PatchConvNet), detection necks (FPN/PAN/BiFPN), a full ImageNet
training harness (SGD + warmup-cosine, CutMix/MixUp/TrivialAugment on device,
bf16, sharded over a jax Mesh), and checkpoint interop.
"""

__version__ = "0.1.0"

from . import models, nn, ops  # noqa: F401
from .models.base import Backbone, create_backbone, list_backbones  # noqa: F401
