from .base import Backbone, create_backbone, list_backbones, register_model  # noqa: F401
from .darknet import Darknet, DarknetYOLOv5  # noqa: F401
from .vovnet import VoVNet  # noqa: F401
