"""Trainer-level pipeline parallelism: a "pipe" axis in runtime.mesh_shape
runs the production fit loop (augment → fwd/bwd → optimizer → eval →
checkpoint/resume) on the stacked TrainState with the GPipe forward
(parallel/pipeline.py). The schedule must be invisible: same final params as
the plain DP trainer, and checkpoints must stay interchangeable with the
sequential model via the layout converters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.train.config import Config
from vision_toolbox_tpu.train.trainer import Trainer


def _vit_cfg(out_dir, mesh_shape=None, **runtime):
    cfg = Config()
    cfg.model.backbone = "vit_ti_16"
    cfg.model.backbone_kwargs = {"img_size": 32}
    cfg.model.num_classes = 10
    cfg.model.bf16 = False
    cfg.data.synthetic = True
    cfg.data.batch_size = 16
    cfg.data.train_crop_size = 32
    cfg.data.val_crop_size = 32
    cfg.data.trivial_augment = False
    cfg.data.random_erasing_p = 0.0
    cfg.train.mixup_alpha = 0.0
    cfg.train.cutmix_alpha = 0.0
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 1
    cfg.runtime.out_dir = str(out_dir)
    cfg.runtime.log_every = 5
    cfg.runtime.mesh_shape = mesh_shape
    for k, v in runtime.items():
        setattr(cfg.runtime, k, v)
    return cfg


def test_pipeline_trainer_matches_plain_dp(tmp_path):
    """10 production train steps under dp2×pp4 produce the same params as the
    plain 8-way DP trainer (same seed → same synthetic data, same rng folds);
    the GPipe schedule is pure re-ordering, so only f32 reassociation noise
    may remain."""
    pp = Trainer(_vit_cfg(tmp_path / "pp", {"data": 2, "pipe": 4}))
    assert pp.pp_stages == 4 and pp.pp_microbatches == 8
    pp_state = pp.fit()

    plain = Trainer(_vit_cfg(tmp_path / "plain"))
    plain_state = plain.fit()

    from vision_toolbox_tpu.parallel.pipeline import classifier_params_from_pipeline

    got = classifier_params_from_pipeline(jax.device_get(pp_state.params))
    want = jax.device_get(plain_state.params)
    ga = jax.tree_util.tree_leaves_with_path(got)
    wa = jax.tree_util.tree_leaves_with_path(want)
    assert [k for k, _ in ga] == [k for k, _ in wa]
    for (k, a), (_, b) in zip(ga, wa):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=str(k)
        )


def test_pipeline_trainer_checkpoint_interchange_and_resume(tmp_path):
    """The pp checkpoint resumes bit-exactly into a pp trainer, and its params
    convert to the standard layout that the sequential ImageClassifier
    evaluates — param trees stay the checkpoint interface."""
    cfg = _vit_cfg(tmp_path / "run", {"data": 2, "pipe": 4})
    tr = Trainer(cfg)
    state = tr.fit()

    ckpt = str(tmp_path / "run" / "checkpoints" / "step_10")
    cfg2 = _vit_cfg(tmp_path / "resume", {"data": 2, "pipe": 4}, resume=ckpt)
    tr2 = Trainer(cfg2)
    assert int(tr2.state.step) == 10
    a = jax.tree.leaves(state.params["backbone_stacked"])[0]
    b = jax.tree.leaves(tr2.state.params["backbone_stacked"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored stacked blocks are committed back onto the pipe axis
    assert b.sharding.spec == jax.sharding.PartitionSpec("pipe")

    # interchange: pipeline layout -> standard layout -> sequential model
    from vision_toolbox_tpu.parallel.pipeline import classifier_params_from_pipeline

    std = classifier_params_from_pipeline(jax.device_get(state.params))
    # probe at the configured (nominal) batch: the pp apply_fn is bound to
    # the microbatch plan, like the jitted steps it backs
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    seq_logits = tr.model.apply({"params": std}, x, train=False)
    pp_logits = tr.state.apply_fn({"params": state.params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(seq_logits), rtol=2e-4, atol=2e-4
    )


def test_pipeline_trainer_interleaved_matches_plain_dp(tmp_path):
    """runtime.pipeline_interleave=3 (12 layers = 4 stages x 3 chunks) runs
    the same production steps; final params must still match the plain DP
    trainer after converting back to canonical layer order."""
    cfg = _vit_cfg(tmp_path / "ppi", {"data": 2, "pipe": 4})
    cfg.runtime.pipeline_interleave = 3
    pp = Trainer(cfg)
    assert pp.pp_microbatches == 4  # interleave caps M at S
    pp_state = pp.fit()

    plain = Trainer(_vit_cfg(tmp_path / "plain2"))
    plain_state = plain.fit()

    from vision_toolbox_tpu.parallel.pipeline import classifier_params_from_pipeline

    got = classifier_params_from_pipeline(
        jax.device_get(pp_state.params), stages=4, interleave=3
    )
    want = jax.device_get(plain_state.params)
    ga = jax.tree_util.tree_leaves_with_path(got)
    wa = jax.tree_util.tree_leaves_with_path(want)
    assert [k for k, _ in ga] == [k for k, _ in wa]
    for (k, a), (_, b) in zip(ga, wa):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=str(k)
        )


def test_pipeline_trainer_rejections(tmp_path):
    """Unsupported configs must fail loudly at setup, not silently train a
    different model."""
    # BN backbone (batch_stats) is not pipelinable
    cfg = _vit_cfg(tmp_path / "a", {"data": 2, "pipe": 4})
    cfg.model.backbone = "darknet19"
    cfg.model.backbone_kwargs = {}
    with pytest.raises(ValueError, match="stacked-transformer"):
        Trainer(cfg)

    # dropout needs rng streams the stage fn doesn't carry
    cfg = _vit_cfg(tmp_path / "b", {"data": 2, "pipe": 4})
    cfg.model.drop_out = 0.1
    with pytest.raises(ValueError, match="rng streams"):
        Trainer(cfg)

    # pp composes with plain DP only
    cfg = _vit_cfg(tmp_path / "c", {"data": 2, "pipe": 4}, param_sharding="fsdp")
    with pytest.raises(ValueError, match="data parallelism only"):
        Trainer(cfg)

    # batch must split into microbatches divisible by dp
    cfg = _vit_cfg(tmp_path / "d", {"data": 2, "pipe": 4})
    cfg.data.batch_size = 12
    with pytest.raises(ValueError, match="microbatch"):
        Trainer(cfg)
