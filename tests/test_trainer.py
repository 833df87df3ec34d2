"""End-to-end trainer tests on the 8-device CPU mesh: fit on synthetic data,
checkpoint + resume, config composition."""

import json
import os

import numpy as np
import pytest

from vision_toolbox_tpu.train.config import Config, load_config, save_config
from vision_toolbox_tpu.train.trainer import Trainer


def _smoke_cfg(tmp_path, **train_overrides):
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
    for k, v in train_overrides.items():
        setattr(cfg.train, k, v)
    return cfg


def test_fit_and_checkpoint(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 10  # 10 synthetic steps/epoch

    # metrics logged
    lines = [json.loads(l) for l in open(os.path.join(cfg.runtime.out_dir, "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)
    assert any("val/acc" in l for l in lines)
    # config archived
    assert os.path.exists(os.path.join(cfg.runtime.out_dir, "saved_config.yaml"))
    # checkpoint written
    ckpt = os.path.join(cfg.runtime.out_dir, "checkpoints", "step_10")
    assert os.path.isdir(ckpt)

    # resume round-trip
    cfg2 = _smoke_cfg(tmp_path)
    cfg2.runtime.resume = ckpt
    trainer2 = Trainer(cfg2)
    assert int(trainer2.state.step) == 10
    a = np.asarray(trainer.state.params["head"]["kernel"])
    b = np.asarray(trainer2.state.params["head"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_resume_continues_epoch_count(tmp_path):
    """Resuming a k-epoch checkpoint into an N-epoch horizon runs only the
    remaining N-k epochs (the fit loop must not restart at epoch 0 — that
    doubled the horizon and trained the tail at eta_min)."""
    cfg = _smoke_cfg(tmp_path)
    trainer = Trainer(cfg)
    trainer.fit()  # 1 epoch = 10 steps
    ckpt = os.path.join(cfg.runtime.out_dir, "checkpoints", "step_10")

    cfg2 = _smoke_cfg(tmp_path)
    cfg2.train.epochs = 3
    cfg2.runtime.out_dir = str(tmp_path / "run2")
    cfg2.runtime.resume = ckpt
    trainer2 = Trainer(cfg2)
    state = trainer2.fit()
    assert int(state.step) == 30  # 2 more epochs, not 3
    lines = [json.loads(l) for l in open(os.path.join(cfg2.runtime.out_dir, "metrics.jsonl"))]
    epochs = sorted({l["epoch"] for l in lines if "epoch_time_s" in l})
    assert epochs == [1, 2]


def test_drop_overrides_reach_backbone(tmp_path):
    """model.drop_out/drop_path must actually land on the backbone module
    (regression: linen modules have .clone(), not .replace() — the override
    path raised AttributeError for every backbone)."""
    cfg = _smoke_cfg(tmp_path)
    cfg.model.backbone = "vit_ti_16"
    cfg.model.backbone_kwargs = {"img_size": 32}
    cfg.model.drop_out = 0.1
    cfg.model.drop_path = 0.05
    trainer = Trainer(cfg)
    assert trainer.model.backbone.dropout == 0.1
    assert trainer.model.backbone.stochastic_depth == 0.05


def test_data_echoing_doubles_steps(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    cfg.data.echo = 2
    trainer = Trainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 20  # 10 host batches × 2 echoes


def test_evaluate_ragged_final_batch(tmp_path):
    """val size not divisible by (batch × mesh): final batch is padded with
    label=-1 rows which the mask-aware eval step excludes; metrics must equal
    an unpadded single-batch evaluation of the same samples."""
    cfg = _smoke_cfg(tmp_path)
    trainer = Trainer(cfg)  # batch 16 over an 8-device mesh

    rng = np.random.default_rng(0)
    images = rng.random((24, 32, 32, 3), np.float32)  # 24 = 16 + ragged 8
    labels = rng.integers(0, 10, 24).astype(np.int32)
    trainer.val_loader = [
        (images[:16], labels[:16]),
        (images[16:], labels[16:]),  # ragged: 8 rows
    ]
    got = trainer.evaluate()
    assert got, "metrics expected"

    # oracle: evaluate the same 24 samples in aligned batches of 8
    trainer.val_loader = [(images[i : i + 8], labels[i : i + 8]) for i in range(0, 24, 8)]
    cfg8 = trainer.cfg
    cfg8.data.batch_size = 8
    want = trainer.evaluate()
    for key in ("val/loss", "val/acc", "val/acc5"):
        np.testing.assert_allclose(got[key], want[key], rtol=1e-5, atol=1e-6)


def test_val_device_cache(tmp_path):
    """Second evaluate() over the same loader reuses device-resident batches
    (no host re-transfer) and returns identical metrics; swapping the loader
    invalidates the cache; the byte cap disables collection."""
    cfg = _smoke_cfg(tmp_path)
    trainer = Trainer(cfg)
    rng = np.random.default_rng(1)
    images = rng.random((32, 32, 32, 3), np.float32)
    labels = rng.integers(0, 10, 32).astype(np.int32)
    loader = [(images[:16], labels[:16]), (images[16:], labels[16:])]
    trainer.val_loader = loader
    first = trainer.evaluate()
    assert getattr(trainer, "_val_cache", None) is not None
    cached_batches = trainer._val_cache[1]
    trainer.val_loader = []  # cache must carry the epoch on its own
    trainer.val_loader = loader
    trainer._val_cache = (loader, cached_batches)
    second = trainer.evaluate()
    for key in first:
        np.testing.assert_allclose(first[key], second[key], rtol=1e-6)

    # swapping the loader object invalidates
    other = [(images[:16], labels[:16])]
    trainer.val_loader = other
    third = trainer.evaluate()
    assert trainer._val_cache[0] is other

    # byte cap: a 1-byte budget must disable collection entirely
    cfg.runtime.cache_val_limit_mb = 0
    t2 = Trainer(cfg)
    t2.val_loader = loader
    t2.evaluate()
    assert getattr(t2, "_val_cache", None) is None


def test_evaluate_without_val_data(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    trainer = Trainer(cfg)
    trainer.val_loader = None
    assert trainer.evaluate() == {}  # no crash, CLI `validate` degrades


def test_config_composition(tmp_path):
    import yaml

    base = tmp_path / "base.yaml"
    override = tmp_path / "override.yaml"
    yaml.safe_dump({"train": {"lr": 0.5, "epochs": 100}}, open(base, "w"))
    yaml.safe_dump({"train": {"lr": 0.25}}, open(override, "w"))
    cfg = load_config([str(base), str(override)], ["train.epochs=7"])
    assert cfg.train.lr == 0.25  # later file wins
    assert cfg.train.epochs == 7  # CLI wins over both
    assert cfg.train.momentum == 0.9  # defaults preserved

    path = save_config(cfg, str(tmp_path / "out"))
    reloaded = load_config([path])
    assert reloaded.train.lr == 0.25


def test_repo_configs_parse():
    for name in ("base", "small", "large", "smoke"):
        cfg = load_config([os.path.join(os.path.dirname(__file__), "..", "configs", f"{name}.yaml")])
        assert cfg.train.epochs > 0


def test_preemption_checkpoint(tmp_path):
    """SIGTERM mid-training saves a resumable checkpoint at the next step
    boundary instead of dying mid-epoch."""
    import os
    import signal
    import threading

    cfg = _smoke_cfg(tmp_path)
    cfg.train.epochs = 50  # would be long — preemption must cut it short
    trainer = Trainer(cfg)

    killer = threading.Timer(8.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    killer.start()
    try:
        state = trainer.fit()
    finally:
        killer.cancel()
    step = int(state.step)
    assert step < 500, "preemption did not stop training"
    lines = [json.loads(l) for l in open(os.path.join(cfg.runtime.out_dir, "metrics.jsonl"))]
    pre = [l for l in lines if "preempted_at_step" in l]
    assert pre and os.path.isdir(pre[-1]["checkpoint"])

    cfg2 = _smoke_cfg(tmp_path)
    cfg2.runtime.resume = pre[-1]["checkpoint"]
    trainer2 = Trainer(cfg2)
    assert int(trainer2.state.step) == step


def test_validate_cli_without_val_dir(tmp_path, monkeypatch, capsys):
    """`train.py validate` with no val data prints gracefully (ref CLI parity)."""
    import sys
    from pathlib import Path

    import yaml
    from PIL import Image

    root = tmp_path / "data" / "class_a"
    root.mkdir(parents=True)
    Image.new("RGB", (48, 48), (128, 60, 200)).save(root / "0.jpg")
    Image.new("RGB", (48, 48), (30, 160, 99)).save(root / "1.jpg")

    cfg = {
        "model": {"backbone": "darknet19", "num_classes": 2, "bf16": False},
        "data": {
            "train_dir": str(tmp_path / "data"),
            "batch_size": 2,
            "train_crop_size": 32,
            "trivial_augment": False,
            "random_erasing_p": 0.0,
            "num_workers": 1,
        },
        "train": {"epochs": 1, "warmup_epochs": 1},
        "runtime": {"out_dir": str(tmp_path / "out")},
    }
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import train as train_cli

    monkeypatch.setattr(sys, "argv", ["train.py", "validate", "--config", str(cfg_path)])
    train_cli.main()  # must not raise
    out = capsys.readouterr().out
    assert "no validation data" in out


def test_fit_with_tp_mesh_and_sharded_params(tmp_path):
    """runtime.mesh_shape + param_sharding=tp: the trainer builds a data×model
    mesh, commits column shardings on big kernels, and the fit runs."""
    from jax.sharding import PartitionSpec as P

    cfg = _smoke_cfg(tmp_path)
    cfg.model.num_classes = 64  # head kernel 1024x64: shardable over model=2
    cfg.runtime.mesh_shape = {"data": 4, "model": 2}
    cfg.runtime.param_sharding = "tp"
    cfg.runtime.sharding_min_size = 4096
    trainer = Trainer(cfg)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    assert trainer.state.params["head"]["kernel"].sharding.spec == P(None, "model")
    state = trainer.fit()
    assert int(state.step) == 10
    assert state.params["head"]["kernel"].sharding.spec == P(None, "model")


def test_fit_with_fsdp_sharding(tmp_path):
    """param_sharding=fsdp: large params (and their optimizer buffers) live
    sharded over the data axis; fit runs and losses stay finite."""
    import jax

    cfg = _smoke_cfg(tmp_path)
    cfg.runtime.param_sharding = "fsdp"
    cfg.runtime.sharding_min_size = 4096
    trainer = Trainer(cfg)
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(trainer.state.params)
        if hasattr(leaf, "sharding") and leaf.sharding.spec != ()
        and any(ax is not None for ax in leaf.sharding.spec)
    ]
    assert sharded, "expected at least one FSDP-sharded parameter"
    state = trainer.fit()
    assert int(state.step) == 10


def test_resume_grad_accum_mismatch_is_loud(tmp_path):
    """Resuming a checkpoint saved under a different grad_accum_steps wraps the
    optimizer state differently (MultiSteps) — must raise a clear ValueError,
    not an opaque orbax structure error."""
    cfg = _smoke_cfg(tmp_path, grad_accum_steps=2)
    trainer = Trainer(cfg)
    trainer.fit()
    ckpt = os.path.join(cfg.runtime.out_dir, "checkpoints", "step_10")
    assert os.path.isdir(ckpt)

    cfg2 = _smoke_cfg(tmp_path)  # grad_accum_steps=1
    cfg2.runtime.resume = ckpt
    with pytest.raises(ValueError, match="grad_accum_steps"):
        Trainer(cfg2)

    # same value resumes fine
    cfg3 = _smoke_cfg(tmp_path, grad_accum_steps=2)
    cfg3.runtime.resume = ckpt
    assert int(Trainer(cfg3).state.step) == 10


def test_fit_with_grad_accumulation(tmp_path):
    """train.grad_accum_steps=2: fit runs, all micro-steps count, the
    schedule advances per optimizer step."""
    cfg = _smoke_cfg(tmp_path, grad_accum_steps=2)
    trainer = Trainer(cfg)
    assert trainer.grad_accum == 2
    state = trainer.fit()
    assert int(state.step) == 10  # micro-steps
    lines = [json.loads(l) for l in open(os.path.join(cfg.runtime.out_dir, "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)
