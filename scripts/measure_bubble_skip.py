#!/usr/bin/env python
"""Measure the GPipe bubble-skip FLOP saving (parallel/pipeline.py).

On the virtual 8-device CPU mesh every device's work serializes onto this
host's single core, so wall-clock ~= TOTAL compute across devices — exactly
the quantity bubble-skip reduces. With S stages and M microbatches the
schedule runs (M+S-1) steps x S devices = S(M+S-1) stage slots of which only
S*M hold real microbatches; skip should cut total compute by the bubble
fraction (S-1)/(M+S-1). A/B/A bracket per the measurement rules (CLAUDE.md).

On real multi-chip hardware the saving is energy/co-tenancy, not wall-clock
(the critical path is unchanged); this harness prices the FLOP claim.
"""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--microbatches", type=int, default=4)
    ap.add_argument("--d", type=int, default=1024, help="feature width")
    ap.add_argument("--rows", type=int, default=256, help="rows per microbatch")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(args.stages, 1))

    from vision_toolbox_tpu.parallel import create_mesh
    from vision_toolbox_tpu.parallel.pipeline import pipeline_apply

    S, M, L = args.stages, args.microbatches, args.layers
    mesh = create_mesh(("pipe",), (S,), devices=jax.devices()[:S])
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    stacked = {"w": jax.random.normal(ks[0], (L, args.d, args.d)) * args.d**-0.5}
    x = jax.random.normal(ks[1], (M * args.rows, args.d))

    def stage_fn(p, h):
        def body(c, w):
            return jnp.tanh(c @ w), None

        y, _ = jax.lax.scan(body, h, p["w"])
        return y

    def run(skip):
        f = jax.jit(
            lambda p, x: pipeline_apply(
                stage_fn, p, x, mesh=mesh, num_microbatches=M, skip_bubbles=skip
            )
        )
        f(stacked, x).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            f(stacked, x).block_until_ready()
        return (time.perf_counter() - t0) / args.iters

    a1 = run(True)
    b = run(False)
    a2 = run(True)
    bubble = (S - 1) / (M + S - 1)
    print(f"S={S} M={M} steps={M+S-1} bubble fraction={bubble:.3f}")
    print(f"skip_bubbles=True : {a1*1e3:8.1f} ms   (re-check {a2*1e3:.1f} ms)")
    print(f"skip_bubbles=False: {b*1e3:8.1f} ms")
    print(f"total-compute saving: {1 - min(a1, a2) / b:.1%} (predicted {bubble:.1%})")


if __name__ == "__main__":
    main()
