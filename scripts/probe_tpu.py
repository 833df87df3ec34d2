#!/usr/bin/env python
"""TPU tunnel health probe — run BEFORE committing to any long TPU job.

Three checks, each with a hard timeout, reported on one line each:
  1. relay     — is the local tunnel relay (/root/.tpu_init.py, forwards
                 localhost 8082-8117) listening? If not, nothing else can
                 work and every jax call hangs forever (observed round 4).
  2. compile   — does a FRESH-shape jitted matmul compile within 60 s?
                 (catches the remote-compile wedge even when the relay is up)
  3. throughput— 500 chained 2048² bf16 matmuls with one readback: reports
                 sustained TFLOP/s (healthy v5e: ~110; the transient wedge
                 shows normal compute but seconds-long dispatches).

Exit code 0 only if all requested checks pass.
"""

from __future__ import annotations

import socket
import sys
import time


def check_relay() -> bool:
    for port in (8093, 8082, 8083):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                print(f"relay: OK (listener on :{port})")
                return True
        except OSError:
            continue
    print("relay: DEAD — no listener on 8082/8083/8093; `ps aux | grep "
          "tpu_init` will show the relay missing. Not restartable from "
          "inside the VM (CLAUDE.md).")
    return False


def check_compile_and_throughput() -> bool:
    # run in a subprocess so a hung compile can be killed by our deadline
    import subprocess

    code = r"""
import time, jax, jax.numpy as jnp
n = int(time.time()) % 97 + 160  # fresh shape -> forces a remote compile
x = jnp.ones((n, n), jnp.bfloat16)
t0 = time.perf_counter()
float(jnp.sum(jax.jit(lambda a: a @ a.T)(x).astype(jnp.float32)))
print(f"compile: OK ({time.perf_counter()-t0:.1f}s for a fresh shape)")
y = jnp.ones((2048, 2048), jnp.bfloat16)
@jax.jit
def chain(a):
    for _ in range(500):
        a = jnp.dot(a, a) * 1e-3
    return a
float(jnp.sum(chain(y).astype(jnp.float32)))
t0 = time.perf_counter()
float(jnp.sum(chain(y).astype(jnp.float32)))
dt = time.perf_counter() - t0
print(f"throughput: {8590/dt/1000:.1f} TFLOP/s sustained "
      f"({dt*1e3:.0f} ms for 500 chained 2048^2 bf16 matmuls; healthy v5e ~110)")
"""
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=180,
                           capture_output=True, text=True)
        out = (r.stdout or "").strip()
        if out:
            print(out)
        if r.returncode != 0:
            print(f"compile: FAILED (rc={r.returncode}) {r.stderr.strip()[-300:]}")
            return False
        return "throughput:" in out
    except subprocess.TimeoutExpired:
        print("compile: HUNG >180s — remote-compile wedge or dead tunnel")
        return False


def main():
    ok = check_relay()
    if ok:
        ok = check_compile_and_throughput()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
