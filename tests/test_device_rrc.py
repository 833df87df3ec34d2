"""On-device RandomResizedCrop (ops/device_rrc.py) + the device-resident
training mode (data.device_resident): geometry oracles, box-sampling bounds,
train-step equivalence to the host-fed path, and an end-to-end trainer fit.

Reference semantics: RandomResizedCrop(176) + RandomHorizontalFlip in
DataLoader workers (/root/reference/data.py:44-52).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vision_toolbox_tpu.ops.device_rrc import (
    crop_resize_flip,
    random_resized_crop_flip,
    sample_rrc_boxes,
)


def _imgs(b=2, h=8, w=8, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((b, h, w, c), np.float32))


def _box(b, i, j, h, w):
    f = lambda v: jnp.full((b,), v, jnp.float32)
    return f(i), f(j), f(h), f(w)


def test_identity_resize():
    x = _imgs(b=2, h=8, w=8)
    i, j, h, w = _box(2, 0.0, 0.0, 8.0, 8.0)
    out = crop_resize_flip(x, i, j, h, w, None, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_flip_is_horizontal_reverse():
    x = _imgs(b=2, h=8, w=8)
    i, j, h, w = _box(2, 0.0, 0.0, 8.0, 8.0)
    flip = jnp.array([True, False])
    out = np.asarray(crop_resize_flip(x, i, j, h, w, flip, 8))
    np.testing.assert_allclose(out[0], np.asarray(x)[0, :, ::-1], atol=1e-5)
    np.testing.assert_allclose(out[1], np.asarray(x)[1], atol=1e-5)


def test_integer_box_equals_slice():
    x = _imgs(b=2, h=8, w=8)
    i, j, h, w = _box(2, 2.0, 3.0, 4.0, 4.0)
    out = crop_resize_flip(x, i, j, h, w, None, 4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x)[:, 2:6, 3:7], atol=1e-5
    )


def _oracle(x, i, j, h, w, out, antialias=True):
    """Same separable-triangle math in float64 numpy."""
    B, H, W, C = x.shape

    def weights(start, size, src):
        o = np.arange(out)
        step = size / out
        coord = start + (o + 0.5) * step - 0.5
        s = max(step, 1.0) if antialias else 1.0
        pos = np.arange(src)
        wts = np.maximum(0.0, 1.0 - np.abs(pos[None, :] - coord[:, None]) / s)
        return wts / np.maximum(wts.sum(1, keepdims=True), 1e-8)

    res = np.empty((B, out, out, C))
    for b in range(B):
        wy = weights(i[b], h[b], H)
        wx = weights(j[b], w[b], W)
        res[b] = np.einsum("oh,hwc,pw->opc", wy, x[b].astype(np.float64), wx)
    return res


def test_downscale_matches_oracle():
    x = _imgs(b=3, h=16, w=16)
    i = jnp.array([0.0, 1.5, 3.0])
    j = jnp.array([2.0, 0.0, 4.5])
    h = jnp.array([12.0, 14.5, 9.0])
    w = jnp.array([10.0, 16.0, 11.5])
    out = crop_resize_flip(x, i, j, h, w, None, 6)
    want = _oracle(np.asarray(x), np.asarray(i), np.asarray(j),
                   np.asarray(h), np.asarray(w), 6)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_sample_rrc_boxes_bounds():
    rng = jax.random.PRNGKey(0)
    i, j, h, w = sample_rrc_boxes(rng, 256, 64, 64)
    for v in (i, j, h, w):
        assert v.shape == (256,)
    i, j, h, w = map(np.asarray, (i, j, h, w))
    assert (i >= -1e-4).all() and (j >= -1e-4).all()
    assert (i + h <= 64 + 1e-3).all() and (j + w <= 64 + 1e-3).all()
    assert (h > 0).all() and (w > 0).all()
    # area within the scale range (valid attempts) or the full-frame fallback
    area = h * w / (64.0 * 64.0)
    assert (area <= 1.0 + 1e-4).all() and (area >= 0.08 * 0.9).all()


def test_sample_rrc_boxes_degenerate_full_frame():
    # scale=(1,1), ratio=(1,1) on a square source: every attempt is the full
    # frame, so the crop must be exactly (0, 0, H, W)
    i, j, h, w = sample_rrc_boxes(jax.random.PRNGKey(1), 8, 32, 32,
                                  scale=(1.0, 1.0), ratio=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(h), 32.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), 32.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(i), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j), 0.0, atol=1e-3)


def test_rrc_jits_and_changes_with_rng():
    x = _imgs(b=4, h=32, w=32)
    f = jax.jit(lambda r, x: random_resized_crop_flip(r, x, 16))
    a = f(jax.random.PRNGKey(0), x)
    b = f(jax.random.PRNGKey(1), x)
    assert a.shape == (4, 16, 16, 3)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # deterministic per key
    np.testing.assert_array_equal(np.asarray(a), np.asarray(f(jax.random.PRNGKey(0), x)))


def test_device_data_step_matches_host_fed_step():
    """With a degenerate RRC (full frame, no flip) the device-resident step
    must produce EXACTLY the update of the standard step fed store[idx]."""
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier,
        TrainState,
        make_train_step,
        sgd_with_param_groups,
        warmup_cosine_schedule,
    )
    from vision_toolbox_tpu.train.step import make_device_data_train_step

    model = ImageClassifier(backbone=create_backbone("darknet19"), num_classes=10)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    tx = sgd_with_param_groups(
        variables["params"], warmup_cosine_schedule(0.1, 10, 10), momentum=0.9,
        weight_decay=1e-4,
    )

    rng = np.random.default_rng(3)
    store = jnp.asarray(rng.integers(0, 256, (32, 16, 16, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 10, 32).astype(np.int32))
    idx = jnp.asarray([5, 1, 30, 7, 22, 9, 0, 14], jnp.int32)
    step_rng = jax.random.PRNGKey(7)
    kwargs = dict(label_smoothing=0.1, mixup_alpha=0.2, cutmix_alpha=1.0)

    dev_step = make_device_data_train_step(
        10, 16, rrc_scale=(1.0, 1.0), rrc_ratio=(1.0, 1.0), hflip_p=0.0, **kwargs
    )
    state = TrainState.create(model.apply, variables, tx)
    new_dev, m_dev = dev_step(state, store, labels, idx, step_rng)

    host_step = make_train_step(10, **kwargs)
    state = TrainState.create(model.apply, variables, tx)
    new_host, m_host = host_step(state, store[idx], labels[idx], step_rng)

    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_dev.params),
                    jax.tree_util.tree_leaves(new_host.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_trainer_device_resident_fit(tmp_path):
    """End-to-end: raw shards -> HBM store -> index loader -> fit 1 epoch."""
    from vision_toolbox_tpu.data.raw_shards import write_shard
    from vision_toolbox_tpu.train.config import Config
    from vision_toolbox_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    shard_dir = tmp_path / "train_raw"
    shard_dir.mkdir()
    write_shard(str(shard_dir / "s0.vtraw"),
                rng.integers(0, 256, (64, 24, 24, 3), np.uint8),
                rng.integers(0, 10, 64))

    cfg = Config()
    cfg.model.backbone = "darknet19"
    cfg.model.num_classes = 10
    cfg.model.bf16 = False
    cfg.data.train_dir = str(shard_dir)
    cfg.data.val_dir = None
    cfg.data.raw_shards = True
    cfg.data.device_resident = True
    cfg.data.batch_size = 16
    cfg.data.train_crop_size = 16
    cfg.data.trivial_augment = False
    cfg.data.random_erasing_p = 0.0
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 1
    cfg.runtime.out_dir = str(tmp_path / "run")
    cfg.runtime.log_every = 2

    trainer = Trainer(cfg)
    assert trainer._device_store is not None
    state = trainer.fit()
    assert int(state.step) == 4  # 64 images / batch 16
    assert np.isfinite(
        float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
    )


def test_device_resident_requires_raw_shards(tmp_path):
    from vision_toolbox_tpu.train.config import Config
    from vision_toolbox_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.backbone = "darknet19"
    cfg.model.num_classes = 10
    cfg.data.train_dir = str(tmp_path)  # not a shard dir
    cfg.data.synthetic = False
    cfg.data.device_resident = True
    cfg.runtime.out_dir = str(tmp_path / "run")
    with pytest.raises(ValueError, match="raw_shards"):
        Trainer(cfg)
