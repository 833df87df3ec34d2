from .base import Backbone, create_backbone, list_backbones, register_model  # noqa: F401
from .cait import CaiT  # noqa: F401
from .convnext import ConvNeXt  # noqa: F401
from .darknet import Darknet, DarknetYOLOv5  # noqa: F401
from .deit import DeiT  # noqa: F401
from .efficientnet import EfficientNet  # noqa: F401
from . import necks  # noqa: F401
from .mlp_mixer import MLPMixer  # noqa: F401
from .mobilenet import MobileNetV3  # noqa: F401
from .patchconvnet import PatchConvNet  # noqa: F401
from .regnet import RegNet  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .swin import SwinTransformer  # noqa: F401
from .vit import ViT, resize_pe, vit_from_config  # noqa: F401
from .vovnet import VoVNet  # noqa: F401
