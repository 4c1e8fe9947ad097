"""Measure effective intra-program HBM bandwidth for array layouts on TPU.

Uses a lax.scan of elementwise updates so per-iteration cost is a real HBM
round-trip inside ONE compiled program (no Python dispatch overhead), plus
a fori-of-tiny-ops probe to estimate fixed per-fusion overhead.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

N = 200


def bw(shape):
    x = jnp.ones(shape, jnp.float32)

    @jax.jit
    def f(a):
        def body(c, _):
            return c * 1.000001 + 0.5, None
        out, _ = lax.scan(body, a, None, length=N)
        return out

    y = f(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = f(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / N
    nbytes = x.size * 4 * 2
    print(f"{str(shape):>24}: {dt*1e6:8.2f} us/iter  {nbytes/dt/1e9:8.1f} GB/s")


for shape in [(128, 128, 9, 9), (16384, 81), (81, 16384), (12, 16384, 81),
              (128, 128, 5, 5), (16384, 25), (25, 16384),
              (128, 129, 9), (16512, 9), (9, 16512), (16, 16512, 9),
              (16, 9, 16512),
              (4096, 4096)]:
    bw(shape)

# fixed per-op overhead: scan body with K SEQUENTIALLY DEPENDENT tiny fusions
x = jnp.ones((8, 128), jnp.float32)


def chain(K):
    @jax.jit
    def f(a):
        def body(c, _):
            for i in range(K):
                c = jnp.sin(c) * 1.0001  # sin blocks fusion collapse
            return c, None
        out, _ = lax.scan(body, a, None, length=N)
        return out

    y = f(x); jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = f(x); jax.block_until_ready(y)
    return (time.perf_counter() - t0) / N


t1, t8 = chain(1), chain(8)
print(f"tiny-op chain: 1 op {t1*1e6:.2f} us, 8 ops {t8*1e6:.2f} us "
      f"-> per-op overhead ~{(t8-t1)/7*1e6:.2f} us")
