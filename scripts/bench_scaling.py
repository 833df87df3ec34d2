#!/usr/bin/env python
"""Multi-chip scaling harness (round-3 verdict item #6a).

Sweeps mesh shapes (pure DP, DP×TP, FSDP/ZeRO-3) over the production train
step, records the collective traffic XLA actually inserted (per-step bytes by
collective kind, parsed from the compiled HLO) and the per-device memory
analysis, and — when real multi-chip hardware is present — wall-clock
steps/s with a fenced host readback.

On this 1-chip worker it runs the whole sweep on a virtual CPU mesh (the
collective-byte and memory numbers are backend-independent: GSPMD inserts the
same collectives); on a real slice it is one flag away:

    # virtual mesh (default): 8 CPU devices
    python scripts/bench_scaling.py --devices 2,4,8

    # real TPU slice: time the steps too
    python scripts/bench_scaling.py --backend tpu --time

Plays the role of the reference's multi-GPU scaling story
(/root/reference/configs/base.yaml:17-22, Lightning DDP over NCCL) measured
the GSPMD way: mesh + committed shardings, collectives read back from the
compiled program rather than asserted from the launcher config.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLL_RE = re.compile(
    r"=\s+((?:\([^)]*\))|(?:\w+\[[^\]]*\]\S*))\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute)\b"
)


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape literal or tuple of them: 'f32[8,16]{1,0}'."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Per-collective-kind {count, bytes} from a compiled HLO dump. Bytes are
    the collective's OUTPUT shape per device — a stable, backend-independent
    proxy for the traffic each device sources on the interconnect."""
    stats: dict[str, dict] = {}
    for shape_str, kind in _COLL_RE.findall(hlo_text):
        ent = stats.setdefault(kind, {"count": 0, "bytes": 0})
        ent["count"] += 1
        ent["bytes"] += _shape_bytes(shape_str)
    return stats


def parse_config(spec: str):
    """'dp8' | 'dp4tp2' | 'dp2pp4' | 'dp2pp4v3' | 'dp2sp4' | 'fsdp8' ->
    (axes, sizes, mode, interleave). The vV suffix (pp only) selects the
    Megatron-style interleaved schedule with V chunks per device."""
    m = re.fullmatch(r"(dp|fsdp)(\d+)(?:(tp|pp|sp)(\d+))?(?:v(\d+))?", spec)
    if not m:
        raise SystemExit(
            f"bad config {spec!r}: use dpN | dpNtpM | dpNppM[vV] | dpNspM | fsdpN"
        )
    kind, n, sub, k, v = m.group(1), int(m.group(2)), m.group(3), m.group(4), m.group(5)
    if v and sub != "pp":
        raise SystemExit(f"bad config {spec!r}: the vV interleave suffix needs ppM")
    if kind == "fsdp":
        if sub:
            raise SystemExit(f"bad config {spec!r}: fsdp composes with dp only")
        return ("data",), (n,), "fsdp", 1
    if sub == "tp":
        return ("data", "model"), (n, int(k)), "tp", 1
    if sub == "pp":  # pipeline parallelism (parallel/pipeline.py, ViT models)
        return ("data", "pipe"), (n, int(k)), "pp", int(v or 1)
    if sub == "sp":  # sequence parallelism (ViT token_sharding hook)
        return ("data", "seq"), (n, int(k)), "sp", 1
    return ("data",), (n,), "replicated", 1


def _compiled_stats(compiled):
    """Collective traffic + memory analysis of one compiled step."""
    coll = collective_bytes(compiled.as_text())
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
        }
    except Exception:
        pass  # memory analysis is backend-dependent; optional
    return coll, mem


def _attach_timing(row, advance, carry, batch, steps):
    """2 warmup + best-of-3×steps with a host-readback fence (CLAUDE.md:
    block_until_ready returns early over the tunnel). ``advance(carry) ->
    (carry, fence_scalar)``."""
    for _ in range(2):
        carry, fence = advance(carry)
    float(fence)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            carry, fence = advance(carry)
        float(fence)
        best = min(best, (time.perf_counter() - t0) / steps)
    row["ms_per_step"] = round(best * 1e3, 2)
    row["img_per_s"] = round(batch / best, 1)


def _print_row(spec, row, extra=""):
    kinds = ", ".join(
        f"{k}×{v['count']} {v['bytes'] / 2**20:.1f}MB"
        for k, v in sorted(row["collectives"].items())
    ) or "none"
    t = f"  {row['ms_per_step']} ms/step  {row['img_per_s']} img/s" if "ms_per_step" in row else ""
    print(f"  {spec}: mesh {row['mesh']}{extra}  collectives: {kinds}{t}", flush=True)


def run_pp_config(spec, mesh, model_name, batch, img, dtype, do_time, steps, interleave=1):
    """Pipeline-parallel leg: GPipe over the 'pipe' axis (parallel/pipeline.py)
    with the stacked-blocks train state; collective bytes show the ppermute
    relays + the data-axis grad all-reduce instead of DP's full-tree sync.
    The step matches the other configs' shape (label-smoothed CE, SGD with
    3-group weight decay) so timing rows are comparable. ``interleave>1``
    runs the Megatron interleaved schedule (device-major chunk layout, M
    capped at the stage count)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.parallel import shard_batch
    from vision_toolbox_tpu.parallel.pipeline import (
        interleave_block_params,
        pipeline_param_sharding,
        stack_block_params,
        vit_pipeline_forward_stacked,
    )
    from vision_toolbox_tpu.train import sgd_with_param_groups
    from vision_toolbox_tpu.train.classifier import cross_entropy

    if not model_name.startswith(("vit_", "deit")):
        raise SystemExit(f"{spec}: pipeline parallelism needs a ViT-family --model "
                         f"(vit_* | deit_* | deit3_*)")
    dp, pp = mesh.shape["data"], mesh.shape["pipe"]
    v = interleave
    vit = create_backbone(model_name, img_size=img, dtype=dtype)
    if vit.depth % (pp * v):
        print(f"  {spec}: SKIP (depth {vit.depth} % {pp} stages x {v} chunks != 0)")
        return None
    # microbatches: amortize the (S-1)-step bubble when the batch allows;
    # the interleaved schedule's collision-free window caps M at S
    cand = (pp, pp // 2, 1) if v > 1 else (4 * pp, 2 * pp, pp)
    M = next((m for m in cand if m and batch % m == 0 and (batch // m) % dp == 0), None)
    if M is None:
        print(f"  {spec}: SKIP (batch {batch} not divisible into microbatches over dp{dp})")
        return None

    vvars = vit.init_variables(0, img)
    stacked, rest = stack_block_params(vvars["params"])
    stacked = interleave_block_params(stacked, pp, v)
    stacked = jax.device_put(stacked, pipeline_param_sharding(stacked, mesh))
    head_k = jax.random.normal(jax.random.PRNGKey(5), (vit.d_model, 1000), jnp.float32) * vit.d_model**-0.5
    params = {"blocks": stacked, "rest": rest,
              "head": {"kernel": head_k, "bias": jnp.zeros((1000,))}}
    tx = sgd_with_param_groups(params, 0.1, momentum=0.9, weight_decay=2e-5)
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        feats = vit_pipeline_forward_stacked(
            vit, params["blocks"], params["rest"], x.astype(dtype),
            mesh=mesh, batch_axis="data", num_microbatches=M, train=True,
            interleave=v,
        )
        logits = feats.astype(jnp.float32) @ params["head"]["kernel"] + params["head"]["bias"]
        return cross_entropy(logits, y, label_smoothing=0.1)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, img, img, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 1000)
    images, labels = shard_batch((images, labels), mesh)

    compiled = step.lower(params, opt_state, images, labels).compile()
    coll, mem = _compiled_stats(compiled)
    row = {
        "config": spec,
        "mesh": dict(mesh.shape),
        "devices": dp * pp,
        "global_batch": batch,
        "microbatches": M,
        "stages": pp,
        "interleave": v,
        "collectives": coll,
        "collective_mb_per_step": round(sum(e["bytes"] for e in coll.values()) / 2**20, 2),
        "memory": mem,
    }
    if do_time:
        def advance(carry):
            p, o = carry
            loss, p, o = step(p, o, images, labels)
            return (p, o), loss

        _attach_timing(row, advance, (params, opt_state), batch, steps)
    _print_row(spec, row, extra=f" ({pp} stages, {M} microbatches"
                                + (f", interleave {v}" if v > 1 else "") + ")")
    return row


def run_config(spec: str, model_name: str, batch: int, img: int, dtype, do_time: bool, steps: int):
    import jax
    import jax.numpy as jnp

    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.parallel import create_mesh, shard_batch
    from vision_toolbox_tpu.parallel.sharding import shard_train_state
    from vision_toolbox_tpu.train import (
        ImageClassifier, TrainState, make_train_step, sgd_with_param_groups,
        shard_train_step,
    )

    axes, sizes, mode, interleave = parse_config(spec)
    n_dev = 1
    for s in sizes:
        n_dev *= s
    if n_dev > len(jax.devices()):
        print(f"  {spec}: SKIP (needs {n_dev} devices, have {len(jax.devices())})")
        return None
    mesh = create_mesh(axes, sizes, devices=jax.devices()[:n_dev])
    if mode == "pp":
        return run_pp_config(spec, mesh, model_name, batch, img, dtype, do_time,
                             steps, interleave=interleave)

    backbone_kwargs = {}
    if model_name.startswith(("vit_", "deit", "cait", "swin", "mlp_mixer")):
        backbone_kwargs["img_size"] = img  # size-dependent PE/masks
    if mode == "sp":
        if not model_name.startswith(("vit_", "deit")):
            raise SystemExit(f"{spec}: sequence parallelism needs a ViT-family "
                             f"--model (vit_* | deit_* | deit3_*)")
        from jax.sharding import NamedSharding, PartitionSpec as P

        # the default cls-token config shards too: _blocks pads T to a seq
        # multiple with masked zero tokens (models/vit.py)
        backbone_kwargs["token_sharding"] = NamedSharding(mesh, P("data", "seq"))
    model = ImageClassifier(
        backbone=create_backbone(model_name, dtype=dtype, **backbone_kwargs),
        num_classes=1000, dtype=dtype,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False
    )
    tx = sgd_with_param_groups(variables["params"], 0.1, momentum=0.9, weight_decay=2e-5)
    state = TrainState.create(model.apply, variables, tx)
    if mode == "tp":
        state = shard_train_state(state, mesh, min_size=2**16)
    elif mode == "fsdp":
        state = shard_train_state(state, mesh, fsdp=True, min_size=2**16)

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, img, img, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 1000)
    images, labels = shard_batch((images, labels), mesh)
    rng = jax.random.PRNGKey(3)

    step = shard_train_step(
        make_train_step(1000, mixup_alpha=0, cutmix_alpha=0, compute_dtype=dtype), mesh
    )
    lowered = step.lower(state, images, labels, rng)
    compiled = lowered.compile()
    coll, mem = _compiled_stats(compiled)
    if mode == "sp" and "all-gather" not in coll:
        # the token constraint was skipped (ViT._constrain warns when T is
        # un-shardable) — recording this row would publish a pure-DP
        # measurement under an spN label
        print(f"  {spec}: SKIP (no all-gather in the compiled step — the "
              f"token sharding did not apply; check T % seq == 0)")
        return None

    row = {
        "config": spec,
        "mesh": dict(zip(axes, sizes)),
        "devices": n_dev,
        "global_batch": batch,
        "collectives": coll,
        "collective_mb_per_step": round(
            sum(e["bytes"] for e in coll.values()) / 2**20, 2
        ),
        "memory": mem,
    }

    if do_time:
        def advance(st):
            st, metrics = step(st, images, labels, rng)
            return st, metrics["loss"]

        _attach_timing(row, advance, state, batch, steps)
    _print_row(spec, row)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="cpu", choices=("cpu", "tpu"),
                    help="cpu = virtual mesh (default on this 1-chip worker)")
    ap.add_argument("--devices", default="8",
                    help="virtual CPU device count(s), comma-separated (max used)")
    ap.add_argument("--configs", default=None,
                    help="comma-separated dpN|dpNtpM|dpNppM[vV]|dpNspM|fsdpN "
                         "(default: sweep from --devices; pp/sp need vit_*/deit3_*; "
                         "ppMvV = Megatron-interleaved with V chunks/device)")
    ap.add_argument("--model", default="cspdarknet53")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--time", action="store_true", help="wall-clock steps (real hardware)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="artifacts/scaling.json")
    args = ap.parse_args()

    dev_counts = sorted(int(d) for d in args.devices.split(","))
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(dev_counts))
    dtype_name = "bfloat16" if args.backend == "tpu" else "float32"
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.backend == "tpu" else jnp.float32

    if args.configs:
        configs = args.configs.split(",")
    else:
        configs = [f"dp{n}" for n in dev_counts]
        top = max(dev_counts)
        if top >= 4:
            configs += [f"dp{top // 2}tp2", f"fsdp{top}"]
        if top >= 8:
            configs.append(f"dp{top // 4}tp4")
        if args.model.startswith(("vit_", "deit3_")) and top >= 4:
            # pipeline + sequence parallel legs (sp needs the gap variant,
            # so the default sweep adds them for plain-ViT models only;
            # deit_* supports pp via --configs)
            # pp4v3: Megatron-interleaved (depth-12 ViTs split 4 stages x 3
            # chunks; other depths SKIP gracefully)
            configs += [f"dp{top // 4}pp4", f"dp{top // 4}pp4v3", f"dp{top // 2}sp2"]

    print(f"scaling sweep: backend={jax.default_backend()} devices={len(jax.devices())} "
          f"model={args.model} global_batch={args.batch}@{args.img} dtype={dtype_name}")
    rows = []
    for spec in configs:
        row = run_config(spec, args.model, args.batch, args.img, dtype, args.time, args.steps)
        if row is not None:
            rows.append(row)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "backend": jax.default_backend(),
        "model": args.model,
        "global_batch": args.batch,
        "img": args.img,
        "dtype": dtype_name,
        "rows": rows,
    }, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
