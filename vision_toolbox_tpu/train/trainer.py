"""Trainer: the full fit loop replacing Lightning's Trainer + callbacks
(SURVEY.md §2.2). One object wires model, data, sharded steps, metrics
logging (JSONL + stdout), per-epoch orbax checkpoints with best-val/acc
tracking, and resume.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import create_backbone
from ..parallel.mesh import batch_sharding, create_mesh, shard_batch
from .classifier import ImageClassifier
from .config import Config, save_config
from .optim import sgd_with_param_groups, warmup_cosine_schedule
from .step import (
    TrainState,
    make_eval_accumulate_step,
    make_train_step,
    shard_train_step,
)


class SyntheticData:
    """Random-data stand-in for smoke runs and benches (data.synthetic=true)."""

    def __init__(self, batch_size: int, crop: int, num_classes: int, steps: int):
        self.batch_size, self.crop, self.num_classes, self.steps = batch_size, crop, num_classes, steps
        rng = np.random.default_rng(0)
        self._images = rng.random((batch_size, crop, crop, 3), np.float32)
        self._labels = rng.integers(0, num_classes, batch_size).astype(np.int32)

    def __len__(self):
        return self.steps

    def __iter__(self) -> Iterator:
        for _ in range(self.steps):
            yield self._images, self._labels


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        if cfg.runtime.mesh_shape:
            self.mesh = create_mesh(
                tuple(cfg.runtime.mesh_shape.keys()),
                tuple(int(v) for v in cfg.runtime.mesh_shape.values()),
            )
        else:
            self.mesh = create_mesh(cfg.runtime.mesh_axes)
        # pipeline parallelism: a "pipe" axis in the mesh switches to the
        # stacked TrainState + GPipe forward (parallel/pipeline.py)
        self.pp_stages = int((cfg.runtime.mesh_shape or {}).get("pipe", 1))
        self.pp_microbatches = 0
        compute_dtype = jnp.bfloat16 if cfg.model.bf16 else jnp.float32
        backbone = create_backbone(
            cfg.model.backbone, dtype=compute_dtype, **cfg.model.backbone_kwargs
        )
        # drop_out / drop_path overrides (classifier.py:69-76): linen modules
        # are frozen dataclasses, so "walk and set" becomes "replace fields"
        overrides = {}
        for field_name, value in (
            ("dropout", cfg.model.drop_out),
            ("stochastic_depth", cfg.model.drop_path),
            ("drop_path", cfg.model.drop_path),
        ):
            if value is not None and hasattr(backbone, field_name):
                overrides[field_name] = value
        if overrides:
            # linen modules are frozen dataclasses but carry .clone(), not
            # .replace() (that's flax.struct) — .replace here raised
            # AttributeError for every backbone
            backbone = backbone.clone(**overrides)
        self.model = ImageClassifier(
            backbone=backbone,
            num_classes=cfg.model.num_classes,
            dtype=compute_dtype,
        )

        self._device_store = None
        self.train_loader, self.val_loader, self.steps_per_epoch = self._build_data()
        self.steps_per_epoch *= max(1, cfg.data.echo)  # echoes are real optimizer steps

        rng = jax.random.PRNGKey(cfg.train.seed)
        img = cfg.data.train_crop_size
        variables = self.model.init(
            {"params": rng}, jnp.zeros((1, img, img, 3)), train=False
        )
        if self.pp_stages > 1:
            variables = {"params": self._setup_pipeline(variables)}
        # gradient accumulation: k micro-batches average into one optimizer
        # step (beyond-reference; lets small slices run the big-batch recipe).
        # The schedule advances per OPTIMIZER step, so scale steps/epoch down.
        self.grad_accum = max(1, cfg.train.grad_accum_steps)
        # linear LR scaling: lr @ batch 1024 (README.md:85)
        schedule = warmup_cosine_schedule(
            cfg.train.lr,
            cfg.train.epochs,
            max(1, -(-self.steps_per_epoch // self.grad_accum)),
            cfg.train.warmup_epochs,
            cfg.train.warmup_factor,
            cfg.train.decay_factor,
        )
        self.schedule = schedule
        from .optim import make_optimizer

        tx = make_optimizer(
            cfg.train.optimizer, variables["params"], schedule,
            momentum=cfg.train.momentum,
            weight_decay=cfg.train.weight_decay,
            norm_weight_decay=cfg.train.norm_weight_decay,
            bias_weight_decay=cfg.train.bias_weight_decay,
        )
        if self.grad_accum > 1:
            import optax

            tx = optax.MultiSteps(tx, every_k_schedule=self.grad_accum).gradient_transformation()
        if self.pp_stages > 1:
            from ..parallel.pipeline import make_classifier_pipeline_apply

            apply_fn = make_classifier_pipeline_apply(
                self.model, self.mesh,
                num_microbatches=self.pp_microbatches,
                remat=cfg.runtime.pipeline_remat,
                interleave=cfg.runtime.pipeline_interleave,
            )
        else:
            apply_fn = self.model.apply
        self.state = TrainState.create(apply_fn, variables, tx)

        step_kwargs = dict(
            label_smoothing=cfg.train.label_smoothing,
            mixup_alpha=cfg.train.mixup_alpha,
            cutmix_alpha=cfg.train.cutmix_alpha,
            trivial_augment=cfg.data.trivial_augment,
            random_erasing_p=cfg.data.random_erasing_p,
            compute_dtype=compute_dtype,
        )
        if self._device_store is not None:
            from .step import make_device_data_train_step, shard_device_data_train_step

            self.train_step = shard_device_data_train_step(
                make_device_data_train_step(
                    cfg.model.num_classes, cfg.data.train_crop_size, **step_kwargs
                ),
                self.mesh,
            )
        else:
            self.train_step = shard_train_step(
                make_train_step(cfg.model.num_classes, **step_kwargs),
                self.mesh,
            )
        from ..parallel.mesh import replicated

        self.eval_step = jax.jit(
            make_eval_accumulate_step(compute_dtype),
            in_shardings=(
                None,
                batch_sharding(self.mesh),
                batch_sharding(self.mesh),
                replicated(self.mesh),
            ),
        )

        os.makedirs(cfg.runtime.out_dir, exist_ok=True)
        save_config(cfg, cfg.runtime.out_dir)
        self._log_file = open(os.path.join(cfg.runtime.out_dir, "metrics.jsonl"), "a")
        # optional experiment-tracker mirror (ref configs/base.yaml:25-32 —
        # WandbLogger role); JSONL + stdout stay the source of truth
        from .tracking import make_tracker
        from .config import _to_dict

        self.tracker = make_tracker(
            cfg.runtime.tracker, cfg.runtime.out_dir, _to_dict(cfg)
        )
        self._tracker_step = 0
        self.best_acc = -1.0

        if cfg.runtime.resume:
            from ..utils.checkpoint import restore_train_state

            self.state = restore_train_state(
                cfg.runtime.resume, self.state,
                expect_meta={
                    "grad_accum_steps": self.grad_accum,
                    "pipeline_stages": self.pp_stages,
                    "pipeline_interleave": cfg.runtime.pipeline_interleave,
                },
            )
            print(f"resumed from {cfg.runtime.resume} at step {int(self.state.step)}")
            # restore places arrays on one device; commit them to the mesh
            # (replicated) or the first sharded train step sees conflicting
            # placements vs the batch. tp/fsdp/pp re-place below anyway.
            if cfg.runtime.param_sharding == "replicated" and self.pp_stages == 1:
                from ..parallel.mesh import replicated as _rep

                self.state = jax.device_put(self.state, _rep(self.mesh))

        # TP / FSDP parameter placement (beyond the reference's DP-only story):
        # commit shardings with device_put AFTER any resume so restored params
        # get placed too; GSPMD propagates them through the jitted step.
        if cfg.runtime.param_sharding != "replicated":
            if cfg.runtime.param_sharding not in ("tp", "fsdp"):
                raise ValueError(
                    f"runtime.param_sharding must be replicated|tp|fsdp, "
                    f"got {cfg.runtime.param_sharding!r}"
                )
            from ..parallel.sharding import shard_train_state

            self.state = shard_train_state(
                self.state,
                self.mesh,
                fsdp=cfg.runtime.param_sharding == "fsdp",
                min_size=cfg.runtime.sharding_min_size,
            )
        if self.pp_stages > 1:
            # commit: stacked blocks (and their optimizer mirrors) layer-wise
            # over the pipe axis, everything else replicated; done AFTER any
            # resume so restored arrays get placed too
            from ..parallel.pipeline import pipeline_state_shardings

            self.state = jax.device_put(
                self.state, pipeline_state_shardings(self.state, self.mesh)
            )

    # ------------------------------------------------------------------
    def _setup_pipeline(self, variables) -> dict:
        """Validate the config supports GPipe training and convert the param
        tree to the pipeline layout (parallel/pipeline.py). Returns params."""
        from ..models.cait import CaiT
        from ..models.deit import DeiT
        from ..models.mlp_mixer import MLPMixer
        from ..models.vit import ViT
        from ..parallel.pipeline import (
            classifier_params_to_pipeline,
            pipeline_block_prefix,
        )

        cfg = self.cfg
        backbone = self.model.backbone
        if "data" not in self.mesh.axis_names:
            raise ValueError(
                "pipeline parallelism needs a 'data' axis in runtime.mesh_shape "
                "(size 1 is fine) — the batch is sharded over it"
            )
        if type(backbone) not in (ViT, DeiT, CaiT, MLPMixer):
            raise ValueError(
                "pipeline parallelism covers the stacked-transformer families "
                f"ViT/DeiT/DeiT3/CaiT/MLP-Mixer; got {type(backbone).__name__}"
            )
        for f in ("dropout", "stochastic_depth"):
            if getattr(backbone, f, 0.0):
                raise ValueError(
                    "pipeline stages carry no rng streams; set model.drop_out / "
                    f"model.drop_path to 0 (backbone.{f}={getattr(backbone, f)})"
                )
        if variables.get("batch_stats"):
            raise ValueError("pipelined backbones must be norm-stat-free")
        if cfg.runtime.param_sharding != "replicated":
            raise ValueError(
                "pipeline parallelism composes with data parallelism only; "
                "set runtime.param_sharding=replicated"
            )
        S, dp, B = self.pp_stages, self.mesh.shape["data"], cfg.data.batch_size
        v = cfg.runtime.pipeline_interleave
        M = cfg.runtime.pipeline_microbatches
        if not M:
            # interleave caps M at S (collision-free window); plain GPipe
            # prefers 4S for bubble amortization
            candidates = (S, S // 2, 1) if v > 1 else (4 * S, 2 * S, S)
            M = next(
                (m for m in candidates if m and B % m == 0 and (B // m) % dp == 0), 0
            )
            if not M:
                raise ValueError(
                    f"no feasible microbatch count for batch {B} over {S} stages "
                    f"x dp={dp}; set runtime.pipeline_microbatches explicitly"
                )
        self.pp_microbatches = M
        self.pp_prefix = pipeline_block_prefix(backbone)
        return classifier_params_to_pipeline(
            variables["params"], self.pp_prefix, stages=S, interleave=v
        )

    # ------------------------------------------------------------------
    @property
    def _local_batch(self) -> int:
        """Per-host rows of the global batch: each process feeds
        1/process_count of every batch (the reference's per-rank batch
        division, data.py:65-66) and `shard_batch` assembles the global
        array from the local slices."""
        if self.cfg.data.batch_size % jax.process_count() != 0:
            raise ValueError(
                f"data.batch_size={self.cfg.data.batch_size} must be divisible "
                f"by process_count={jax.process_count()}: a silent floor would "
                "shrink the effective global batch while steps_per_epoch and "
                "the lr schedule still assume the configured one"
            )
        return max(1, self.cfg.data.batch_size // jax.process_count())

    def _build_data(self):
        cfg = self.cfg
        local_bs = self._local_batch
        if cfg.data.synthetic or cfg.data.train_dir is None:
            steps = max(1, cfg.data.train_size // max(cfg.data.batch_size, 1)) if cfg.data.train_size else 10
            train = SyntheticData(local_bs, cfg.data.train_crop_size, cfg.model.num_classes, steps)
            val = SyntheticData(local_bs, cfg.data.val_crop_size, cfg.model.num_classes, 2)
            return train, val, len(train)

        from ..data import DataLoader, ImageFolder, train_transform, val_transform

        if cfg.data.device_resident and not cfg.data.raw_shards:
            raise ValueError(
                "data.device_resident requires data.raw_shards=true "
                "(pre-decode with scripts/make_raw_shards.py)"
            )
        if cfg.data.raw_shards:
            from ..data.raw_shards import (
                DeviceIndexLoader,
                RawShardDataset,
                RawShardLoader,
            )

            train_ds = RawShardDataset(cfg.data.train_dir, preload=cfg.data.raw_preload)
            if cfg.data.device_resident:
                if jax.process_count() > 1:
                    raise NotImplementedError(
                        "data.device_resident is single-process (per-host "
                        "stores are future work)"
                    )
                from ..parallel.mesh import replicated

                images = np.concatenate(
                    [np.asarray(s.images) for s in train_ds.shards]
                )
                labels = train_ds._labels_flat
                print(
                    f"device-resident store: {images.nbytes / 1e9:.2f} GB "
                    f"({len(images)} images @ {train_ds.h}px) -> HBM, one-time"
                )
                self._device_store = (
                    jax.device_put(images, replicated(self.mesh)),
                    jax.device_put(labels.astype(np.int32), replicated(self.mesh)),
                )
                train = DeviceIndexLoader(
                    len(images), labels, local_bs, seed=cfg.train.seed
                )
            else:
                train = RawShardLoader(
                    train_ds, local_bs, cfg.data.train_crop_size,
                    training=True, seed=cfg.train.seed,
                )
            val = None
            if cfg.data.val_dir:
                val_ds = RawShardDataset(cfg.data.val_dir, preload=cfg.data.raw_preload)
                val = RawShardLoader(
                    val_ds, local_bs, min(cfg.data.val_crop_size, val_ds.h),
                    training=False,
                )
            return train, val, len(train)

        if cfg.data.webdataset:
            import glob

            from ..data.wds_loader import WebDatasetLoader

            train_shards = sorted(glob.glob(cfg.data.train_dir))
            val_shards = sorted(glob.glob(cfg.data.val_dir)) if cfg.data.val_dir else []
            num_batches = (
                cfg.data.train_size // cfg.data.batch_size if cfg.data.train_size else None
            )
            train = WebDatasetLoader(
                train_shards, local_bs,
                transform=lambda r, im: train_transform(r, im, cfg.data.train_crop_size),
                training=True, num_batches=num_batches, seed=cfg.train.seed,
                num_streams=cfg.data.num_workers,  # ref num_workers: 8 (base.yaml)
            )
            val = (
                WebDatasetLoader(
                    val_shards, local_bs,
                    transform=lambda r, im: val_transform(
                        im, cfg.data.val_resize_size, cfg.data.val_crop_size
                    ),
                    training=False,
                    num_batches=(cfg.data.val_size // cfg.data.batch_size) or None
                    if cfg.data.val_size
                    else None,
                    num_streams=cfg.data.num_workers,
                )
                if val_shards
                else None
            )
            steps = num_batches if num_batches else 1
            return train, val, steps

        train_ds = ImageFolder(cfg.data.train_dir)
        val_ds = ImageFolder(cfg.data.val_dir) if cfg.data.val_dir else None
        if cfg.data.native_decode:
            from ..data.native import NativeJPEGLoader, native_available

            if not native_available():
                raise RuntimeError("data.native_decode=true but native/libvttdata.so "
                                   "is unavailable (run `make -C native`)")
            train = NativeJPEGLoader(
                train_ds, local_bs, cfg.data.train_crop_size,
                num_threads=cfg.data.num_workers, seed=cfg.train.seed,
            )
        else:
            train = DataLoader(
                train_ds, local_bs,
                transform=lambda r, im: train_transform(r, im, cfg.data.train_crop_size),
                shuffle=True, drop_last=True, num_workers=cfg.data.num_workers,
                seed=cfg.train.seed,
            )
        val = (
            DataLoader(
                val_ds, local_bs,
                transform=lambda r, im: val_transform(
                    im, cfg.data.val_resize_size, cfg.data.val_crop_size
                ),
                num_workers=cfg.data.num_workers,
            )
            if val_ds
            else None
        )
        return train, val, len(train)

    # ------------------------------------------------------------------
    def _log(self, record: dict):
        record = {k: (float(v) if hasattr(v, "item") else v) for k, v in record.items()}
        self._log_file.write(json.dumps(record) + "\n")
        self._log_file.flush()
        if "step" in record:
            self._tracker_step = int(record["step"])
        self.tracker.log(record, self._tracker_step)
        print("  ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}" for k, v in record.items()))

    def fit(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.train.seed + 1)
        from ..data.loader import prefetch_to_device

        # Preemption-safe: TPU VMs are commonly preemptible; SIGTERM/SIGINT
        # request a checkpoint at the next step boundary instead of dying
        # mid-epoch (resume with runtime.resume=<ckpt>). The reference relies
        # on Lightning's last-epoch ckpt and loses partial epochs.
        import signal

        self._preempted = False

        def _request_stop(signum, frame):
            self._preempted = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # not in the main thread
                pass

        self._trace_open = False
        try:
            return self._fit_loop(cfg, rng, prefetch_to_device)
        finally:
            # If training ended (or was preempted) before the profiled window
            # closed, the trace would be left open/corrupt — always stop it.
            if self._trace_open:
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
                self._trace_open = False
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
            self.tracker.finish()

    def _fit_loop(self, cfg, rng, prefetch_to_device):
        profiled = False
        # Resume continues the epoch count from the restored optimizer step
        # instead of re-running the whole horizon (the reference gets this
        # from Lightning's `fit(ckpt_path=...)`). A mid-epoch preemption
        # checkpoint restarts its epoch from the top — the schedule is a pure
        # function of state.step and clips at the horizon, so the few extra
        # micro-steps at the end train at eta_min.
        start_epoch = min(
            int(self.state.step) // max(1, self.steps_per_epoch), cfg.train.epochs
        )
        for epoch in range(start_epoch, cfg.train.epochs):
            t0 = time.time()
            n_images = 0
            for images, labels in prefetch_to_device(iter(self.train_loader), self.mesh):
                step_now = int(self.state.step)
                if cfg.runtime.profile_steps and step_now == 2 and not profiled:
                    # skip compile steps, then trace N steady-state steps
                    profiled = True
                    trace_dir = os.path.join(cfg.runtime.out_dir, "profile")
                    jax.profiler.start_trace(trace_dir)
                    self._trace_open = True
                if (
                    cfg.runtime.profile_steps
                    and profiled
                    and step_now == 2 + cfg.runtime.profile_steps
                ):
                    jax.profiler.stop_trace()
                    self._trace_open = False
                    self._log({"profile_trace": os.path.join(cfg.runtime.out_dir, "profile")})
                for _ in range(max(1, cfg.data.echo)):
                    # each echo folds a new step count into the RNG, so the
                    # device-side augmentation differs per echo
                    if self._device_store is not None:
                        # `images` is the (B,) index vector here — the pixel
                        # batch is gathered from the HBM-resident store
                        self.state, metrics = self.train_step(
                            self.state, *self._device_store, images, rng
                        )
                    else:
                        self.state, metrics = self.train_step(self.state, images, labels, rng)
                n_images += images.shape[0]
                step = int(self.state.step)
                if self._preempted:
                    path = self.save(epoch)
                    self._log({"preempted_at_step": step, "checkpoint": path})
                    return self.state
                if step % cfg.runtime.log_every == 0:
                    self._log(
                        {
                            "epoch": epoch,
                            "step": step,
                            "train/loss": metrics["loss"],
                            # lr actually applied at micro-step `step` (the
                            # optimizer's schedule count is the number of
                            # completed optimizer updates BEFORE that step)
                            "lr": float(self.schedule((step - 1) // self.grad_accum)),
                        }
                    )
            dt = time.time() - t0
            record = {"epoch": epoch, "epoch_time_s": dt, "train_ips": n_images / dt}

            if self.val_loader is not None:
                record.update(self.evaluate())
            self._log(record)

            if (epoch + 1) % cfg.runtime.checkpoint_every_epochs == 0:
                self.save(epoch, record.get("val/acc"))
        return self.state

    def evaluate(self) -> dict:
        if self.val_loader is None:
            # reference CLI degrades gracefully without val data (Lightning)
            print("evaluate: no validation data configured (data.val_dir unset)")
            return {}
        nominal = self._local_batch
        # device-side accumulator [loss_sum, correct, correct5, count]: the
        # whole val epoch runs with zero host syncs, ONE readback at the end
        # (each float() costs a ~24 ms tunnel roundtrip — see CLAUDE.md)
        acc = jnp.zeros((4,), jnp.float32)
        for images, labels in self._val_batches():
            acc = self.eval_step(self.state, images, labels, acc)
        loss_sum, acc_sum, acc5_sum, total = np.asarray(acc, np.float64)
        if total == 0:
            return {}
        return {
            "val/loss": loss_sum / total,
            "val/acc": acc_sum / total,
            "val/acc5": acc5_sum / total,
        }

    def _val_batches(self):
        """Yield (padded, sharded) val batches; device-cache them when small.

        The val set is deterministic (center crop, fixed order), so after the
        first val epoch the padded sharded device arrays can be reused as-is
        — the per-epoch host->device re-transfer is pure waste (through the
        dev-tunnel's ~31 MB/s link a 3k-image @224 val set costs ~15 s/epoch;
        on a real PCIe host it still costs a full copy). Capped by
        runtime.cache_val_limit_mb so ImageNet-scale val sets stream.
        """
        cached = getattr(self, "_val_cache", None)
        if cached is not None and cached[0] is self.val_loader:
            yield from cached[1]
            return
        cfg = self.cfg.runtime
        collect = cfg.cache_val_on_device
        budget = cfg.cache_val_limit_mb * 1e6
        batches = []
        nominal = self._local_batch
        for images, labels in self.val_loader:
            b = images.shape[0]
            if b != nominal:
                # pad the ragged final batch to the jitted shape; label -1
                # marks padding, which the mask-aware eval step excludes
                images = np.concatenate(
                    [np.asarray(images), np.zeros((nominal - b, *images.shape[1:]), images.dtype)]
                )
                labels = np.concatenate(
                    [np.asarray(labels, np.int32), np.full((nominal - b,), -1, np.int32)]
                )
            images, labels = shard_batch((images, labels), self.mesh)
            if collect:
                batches.append((images, labels))
                if sum(im.nbytes for im, _ in batches) > budget:
                    collect, batches = False, []
            yield images, labels
        if collect and batches:
            # keyed to the loader object: swapping val_loader (or rebuilding
            # it at a new batch size) invalidates the cache
            self._val_cache = (self.val_loader, batches)

    def save(self, epoch: int, val_acc: float | None = None):
        from ..utils.checkpoint import save_train_state

        path = save_train_state(
            os.path.join(self.cfg.runtime.out_dir, "checkpoints"), self.state,
            step=int(self.state.step),
            meta={
                "grad_accum_steps": self.grad_accum,
                "pipeline_stages": self.pp_stages,
                "pipeline_interleave": self.cfg.runtime.pipeline_interleave,
            },
        )
        # ModelCheckpoint(monitor=val/acc, mode=max) equivalent (configs/base.yaml:33-36)
        if val_acc is not None and val_acc > self.best_acc:
            self.best_acc = val_acc
            best = os.path.join(self.cfg.runtime.out_dir, "best")
            import shutil

            if os.path.isdir(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
        return path
