from .checkpoint import (  # noqa: F401
    extract_backbone,
    load_params_npz,
    restore_train_state,
    save_params_npz,
    save_train_state,
)
from .download import cached_download  # noqa: F401
from .flax_ckpt import load_mixer_npz, load_vit_npz  # noqa: F401
from .torch_pth import load_pth  # noqa: F401
