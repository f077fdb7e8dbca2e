"""int8 vs bf16 conv throughput on TPU — feasibility probe for a quantized
(int8) U-Net serving path.

TPU v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS peak) and int8
activations halve the HBM traffic of the bandwidth-bound 256² layers (the
round-3 trace attribution shows those run at the ~650-900 GB/s floor).  If
XLA's int8 conv emitters realize a useful fraction of either, post-training
quantization roughly halves the fused pipeline's device time.

Measurement notes (two earlier versions of this probe were wrong):
  * `acc += conv(x+i, k).sum()` inside fori_loop gets algebraically
    simplified by XLA (sum-of-conv -> function of sum(x), sum(k)): measured
    "9 PFLOP/s".  The loop body must CHAIN: each iteration's input is the
    previous output, so no iteration can be elided or hoisted.
  * with K repeats too small, the ~40 ms relay dispatch+fetch round-trip
    dominates wall time (looked like >peak TFLOP/s at K=8).  K=64 puts
    compute at ~10x the overhead.

The chain projects cout back to cin with a 1x1 conv and requantizes (shift
for int8, scale for bf16) — exactly the shape of a real quantized inference
layer, and its FLOPs are counted.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_probe7.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("PROBE_N", 128))   # frames per chunk
K = int(os.environ.get("PROBE_K", 64))    # chained repeats inside one jit


def conv(x, k, out_dtype):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [(1, 1), (1, 1)] if k.shape[0] == 3 else [(0, 0), (0, 0)]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=dn,
        preferred_element_type=out_dtype)


@jax.jit
def chain_bf16(x, k, p):
    def body(i, x):
        y = conv(x, k, jnp.bfloat16)
        z = conv(y, p, jnp.bfloat16)
        return z * jnp.bfloat16(0.125)

    return jax.lax.fori_loop(0, K, body, x).max()


@jax.jit
def chain_int8(x, k, p):
    def body(i, x):
        y = conv(x, k, jnp.int32)
        y8 = (y >> 7).astype(jnp.int8)       # requant: shift + saturate-cast
        z = conv(y8, p, jnp.int32)
        return (z >> 7).astype(jnp.int8)

    return jax.lax.fori_loop(0, K, body, x).max()


def timeit(label, fn, *args, flops=None, reps=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K
    msg = f"{label:44s} {dt * 1e3:8.3f} ms"
    if flops:
        msg += f"  {flops / dt / 1e12:6.1f} TFLOP/s"
    print(msg, flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0].device_kind}  (K={K}, N={N})",
          flush=True)
    rng = np.random.default_rng(0)
    # (H, cin, cout): the distinct U-Net 3x3 conv shapes at chunk=128
    shapes = [
        (256, 32, 32), (256, 64, 32),
        (128, 64, 64), (128, 128, 64),
        (64, 128, 128),
        (32, 256, 256),
        (16, 512, 512),
    ]
    for h, cin, cout in shapes:
        x8 = jnp.asarray(rng.integers(-4, 4, (N, h, h, cin)), jnp.int8)
        k8 = jnp.asarray(rng.integers(-4, 4, (3, 3, cin, cout)), jnp.int8)
        p8 = jnp.asarray(rng.integers(-4, 4, (1, 1, cout, cin)), jnp.int8)
        xb, kb, pb = (a.astype(jnp.bfloat16) for a in (x8, k8, p8))
        flops = N * h * h * cout * cin * (9 + 1) * 2  # 3x3 + 1x1 proj
        tb = timeit(f"bf16 {h}² {cin}->{cout}(->{cin})", chain_bf16,
                    xb, kb, pb, flops=flops)
        ti = timeit(f"int8 {h}² {cin}->{cout}(->{cin})", chain_int8,
                    x8, k8, p8, flops=flops)
        print(f"  -> int8 speedup {tb / ti:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
