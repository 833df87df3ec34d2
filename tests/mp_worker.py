"""Worker process for the real multi-process distributed test.

Each worker is a separate OS process with its OWN jax runtime and 2 virtual
CPU devices, joined into one cluster via ``jax.distributed.initialize`` —
the regime `shard_for_host` and `make_array_from_process_local_data` were
written for but (before round 3) had never executed in. The TPU-native
equivalent of the reference's real-multi-process DDP
(/root/reference/configs/base.yaml:17-19, data.py:65-66).

Invoked by tests/test_multiprocess.py:
    python tests/mp_worker.py <proc_id> <nproc> <coordinator_port> <out_json>
"""

from __future__ import annotations

import functools
import json
import os
import sys


def main() -> None:
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")  # the TPU plugin ignores the env var
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=proc_id
    )

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vision_toolbox_tpu.data.datasets import shard_for_host
    from vision_toolbox_tpu.models.base import create_backbone
    from vision_toolbox_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        replicated,
        shard_batch,
    )
    from vision_toolbox_tpu.train.classifier import ImageClassifier
    from vision_toolbox_tpu.train.optim import sgd_with_param_groups
    from vision_toolbox_tpu.train.step import (
        TrainState,
        make_eval_step,
        make_train_step,
        shard_train_step,
    )

    assert jax.process_count() == nproc, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local, (n_global, nproc, n_local)

    # --- per-host shard assignment: disjoint, complete (uses jax.process_index) ---
    shards = [f"shard_{i:03d}.tar" for i in range(7)]
    mine = shard_for_host(shards)
    record: dict = {"proc": proc_id, "my_shards": mine, "n_global_devices": n_global}

    # --- global mesh over ALL processes' devices ---
    mesh = create_mesh(("data",))

    model = ImageClassifier(
        backbone=create_backbone("darknet19", dtype=jnp.float32), num_classes=10
    )
    # host init (identical on every process, seed 0) → numpy (uncommitted) →
    # jitted state build with replicated out_shardings = one GLOBAL state tree
    host_vars = jax.tree.map(
        np.asarray,
        model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), train=False),
    )
    tx = sgd_with_param_groups(host_vars["params"], 0.005, momentum=0.9, weight_decay=2e-5)

    @functools.partial(jax.jit, out_shardings=replicated(mesh))
    def init_state(variables):
        return TrainState.create(model.apply, variables, tx)

    state = init_state(host_vars)

    train_step = shard_train_step(
        make_train_step(num_classes=10, trivial_augment=False, random_erasing_p=0.0),
        mesh,
    )
    eval_step = jax.jit(
        make_eval_step(),
        in_shardings=(None, batch_sharding(mesh), batch_sharding(mesh)),
    )

    # --- deterministic GLOBAL batches; each process feeds only its local rows.
    # Mesh device order is jax.devices() order, so process p's addressable
    # slice of a batch-sharded array is the contiguous row block
    # [p*local : (p+1)*local] — exactly what a per-host loader would produce.
    data_rng = np.random.default_rng(123)
    global_batch, rows_per_proc = 16, 16 // nproc
    lo, hi = proc_id * rows_per_proc, (proc_id + 1) * rows_per_proc

    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(3):
        g_images = data_rng.random((global_batch, 32, 32, 3), np.float32)
        g_labels = data_rng.integers(0, 10, global_batch).astype(np.int32)
        images, labels = shard_batch((g_images[lo:hi], g_labels[lo:hi]), mesh)
        assert images.shape == (global_batch, 32, 32, 3), images.shape  # global view
        state, metrics = train_step(state, images, labels, rng)
        losses.append(float(metrics["loss"]))  # fully-replicated → addressable

    g_images = data_rng.random((global_batch, 32, 32, 3), np.float32)
    g_labels = data_rng.integers(0, 10, global_batch).astype(np.int32)
    images, labels = shard_batch((g_images[lo:hi], g_labels[lo:hi]), mesh)
    ev = eval_step(state, images, labels)
    record.update(
        losses=losses,
        eval_loss=float(ev["loss"]),
        eval_acc=float(ev["acc"]),
        eval_count=float(ev["count"]),
    )

    # --- multi-host WDS ingestion: per-host disjoint shards, parallel reader
    # streams, global-batch assembly — every sample must appear EXACTLY once
    # across all processes (the wds ddp_equalize/exactly-once contract).
    import io
    import tarfile
    import time

    from vision_toolbox_tpu.data.wds_loader import WebDatasetLoader

    shared = os.path.join(os.path.dirname(os.path.abspath(out_path)), "wds_shards")
    marker = os.path.join(shared, "done")
    n_samples = 16
    if proc_id == 0:
        from PIL import Image

        os.makedirs(shared, exist_ok=True)
        idx = 0
        for s in range(4):
            with tarfile.open(os.path.join(shared, f"{s:04d}.tar"), "w") as tf:
                for _ in range(4):
                    buf = io.BytesIO()
                    Image.new("RGB", (8, 8), ((idx * 15) % 256, 0, 0)).save(buf, format="JPEG")
                    data = buf.getvalue()
                    info = tarfile.TarInfo(f"{idx:06d}.jpg")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                    cls = str(idx).encode()
                    info = tarfile.TarInfo(f"{idx:06d}.cls")
                    info.size = len(cls)
                    tf.addfile(info, io.BytesIO(cls))
                    idx += 1
        with open(marker, "w") as f:
            f.write("ok")
    else:
        for _ in range(600):
            if os.path.exists(marker):
                break
            time.sleep(0.1)

    shards16 = [os.path.join(shared, f"{s:04d}.tar") for s in range(4)]
    loader = WebDatasetLoader(
        shards16,
        batch_size=8 // nproc,  # global batch 8: each host contributes 1/nproc
        transform=lambda r, im: np.asarray(im.resize((8, 8)), np.float32) / 255.0,
        training=False,
        num_streams=2,  # parallel tar readers per host
    )
    hist_fn = jax.jit(
        lambda l: jnp.zeros((n_samples,), jnp.int32).at[l].add(1),
        in_shardings=(batch_sharding(mesh),),
        out_shardings=replicated(mesh),
    )
    hist = np.zeros(n_samples, np.int64)
    n_batches = 0
    for b_images, b_labels in loader:
        gi, gl = shard_batch((b_images, b_labels), mesh)
        assert gi.shape[0] == 8, gi.shape  # assembled global view
        hist += np.asarray(hist_fn(gl))
        n_batches += 1
    record.update(wds_hist=hist.tolist(), wds_batches=n_batches)

    # --- pipeline parallelism across the process boundary: ViT blocks
    # sharded layer-wise over a GLOBAL 4-device "pipe" axis (2 stages per
    # host); the GPipe microbatch relays cross hosts via gloo
    # collective-permute (parallel/pipeline.py). The replicated result must
    # match each host's LOCAL sequential forward.
    try:
        from vision_toolbox_tpu.parallel.pipeline import vit_pipeline_forward

        vit = create_backbone("vit_ti_16", img_size=16)
        host_v = jax.tree.map(np.asarray, vit.init_variables(0, 16))
        xb = data_rng.random((8, 16, 16, 3), np.float32)
        pmesh = create_mesh(("pipe",))

        @functools.partial(jax.jit, out_shardings=replicated(pmesh))
        def _rep(t):
            return t

        got = jax.jit(
            lambda v, x: vit_pipeline_forward(vit, v, x, mesh=pmesh, num_microbatches=4)
        )(_rep(host_v), _rep(jnp.asarray(xb)))
        want = vit.apply(host_v, xb)  # local, sequential
        record["pp_max_diff"] = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
    except Exception as e:  # surfaced (skip-or-fail) by the driver test
        record["pp_error"] = repr(e)

    with open(out_path, "w") as f:
        json.dump(record, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
