"""Op-level microbenchmarks — the analogue of the reference's
google-benchmark suite (benchmarks/Vec3Benchmarks.cpp and friends), but
measuring what matters on TPU: per-op throughput over large ray batches
rather than scalar op latency (a loop-carried scalar dependency is
meaningless under XLA fusion).

Usage: python benchmarks/run_benchmarks.py [n_rays_log2]
Prints one line per op: name, ms/iter, Gelem/s.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pt_three_ways_tpu.ops import rng, vecmath as vm
from pt_three_ways_tpu.ops.gather import onehot_gather


def bench(name, fn, *args, n=0, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rate = n / dt / 1e9 if n else 0.0
    print(f"{name:28s} {dt*1e3:9.3f} ms   {rate:8.2f} Gelem/s")


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    key = rng.base_key(0)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (3, n), jnp.float32)
    b = jax.random.normal(k2, (3, n), jnp.float32)
    an = jax.jit(vm.normalise)(a)
    bn = jax.jit(vm.normalise)(b)
    u = jax.random.uniform(k1, (n,), jnp.float32)
    v = jax.random.uniform(k2, (n,), jnp.float32)
    print(f"backend={jax.default_backend()} n={n}")

    bench("dot", jax.jit(vm.dot), a, b, n=n)
    bench("cross", jax.jit(vm.cross), a, b, n=n)
    bench("normalise", jax.jit(vm.normalise), a, n=n)
    bench("reflect", jax.jit(vm.reflect), an, bn, n=n)
    bench(
        "reflectance",
        jax.jit(lambda x, y: vm.reflectance(x, y, jnp.float32(1.0), jnp.float32(1.5))),
        bn, an, n=n,
    )
    bench("onb_from_z", jax.jit(lambda z: vm.onb_from_z(z).x), an, n=n)
    bench(
        "hemisphere_sample",
        jax.jit(lambda z, u, v: vm.hemisphere_sample(vm.onb_from_z(z), u, v)),
        an, u, v, n=n,
    )
    bench(
        "cone_sample",
        jax.jit(lambda d, u, v: vm.cone_sample(d, jnp.full_like(u, 0.2), u, v)),
        an, u, v, n=n,
    )
    bench("threefry uniforms [3,N]", jax.jit(lambda k: rng.uniforms(k, (3, n))), key, n=3 * n)

    coef = jax.random.normal(k1, (22, 968), jnp.float32)
    idx = jax.random.randint(k2, (n,), 0, 968)
    bench("onehot_gather [22,968]", jax.jit(onehot_gather), coef, idx, n=22 * n)


if __name__ == "__main__":
    main()
