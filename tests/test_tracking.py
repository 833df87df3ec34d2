"""Experiment-tracker sinks (train/tracking.py) + device-memory profile stat.

Reference parity: configs/base.yaml:25-32 (WandbLogger with LR monitor) and
extras.py:164 (reserved device memory in `profile`).
"""

import glob
import os

import pytest

from vision_toolbox_tpu.train.tracking import (
    NoopTracker,
    TensorBoardTracker,
    make_tracker,
    _scalars,
)


def test_scalars_filters_non_numeric():
    import numpy as np

    rec = {
        "train/loss": np.float32(1.5),
        "step": 10,
        "checkpoint": "/path/x",
        "flag": True,
        "arr": np.zeros((3,)),
    }
    out = _scalars(rec)
    assert out == {"train/loss": 1.5, "step": 10.0}


def test_make_tracker_kinds(tmp_path):
    assert isinstance(make_tracker("none", str(tmp_path)), NoopTracker)
    assert isinstance(make_tracker(None, str(tmp_path)), NoopTracker)
    assert isinstance(make_tracker("tensorboard", str(tmp_path)), TensorBoardTracker)
    with pytest.raises(ValueError, match="none|tensorboard|wandb"):
        make_tracker("mlflow", str(tmp_path))


def test_wandb_tracker_raises_without_package(tmp_path):
    try:
        import wandb  # noqa: F401

        pytest.skip("wandb installed in this environment")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="wandb"):
        make_tracker("wandb", str(tmp_path))


def test_tensorboard_tracker_writes_events(tmp_path):
    t = make_tracker("tensorboard", str(tmp_path), config={"train": {"lr": 0.1}})
    t.log({"train/loss": 2.0, "lr": 0.1, "msg": "skipped"}, step=1)
    t.log({"train/loss": 1.5}, step=2)
    t.finish()
    events = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 0
    # the scalars are actually in the event file
    from tensorboardX.event_file_writer import EventFileWriter  # noqa: F401 (import check)
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(os.path.join(str(tmp_path), "tb"))
    acc.Reload()
    assert "train/loss" in acc.Tags()["scalars"]
    vals = [e.value for e in acc.Scalars("train/loss")]
    assert vals == [2.0, 1.5]


def test_trainer_tracker_integration(tmp_path):
    from vision_toolbox_tpu.train.config import Config
    from vision_toolbox_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.backbone = "darknet19"
    cfg.model.num_classes = 10
    cfg.model.bf16 = False
    cfg.data.synthetic = True
    cfg.data.batch_size = 16
    cfg.data.train_crop_size = 32
    cfg.data.val_crop_size = 32
    cfg.data.trivial_augment = False
    cfg.data.random_erasing_p = 0.0
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 1
    cfg.runtime.out_dir = str(tmp_path / "run")
    cfg.runtime.log_every = 5
    cfg.runtime.tracker = "tensorboard"
    trainer = Trainer(cfg)
    trainer.fit()

    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(os.path.join(cfg.runtime.out_dir, "tb"))
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert "train/loss" in tags and "lr" in tags and "val/acc" in tags


def test_device_memory_mb_shape():
    from vision_toolbox_tpu.utils.profile import device_memory_mb

    stats = device_memory_mb()
    # CPU backend has no allocator stats -> {}; on TPU all three keys appear.
    assert isinstance(stats, dict)
    for v in stats.values():
        assert v >= 0
