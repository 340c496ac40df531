"""TPU microbenchmarks for modular-multiplication strategy selection
(docs/DESIGN.md roadmap items 1-2).

The axon tunnel adds ~10 ms dispatch latency per jit call, so every
measurement chains R dependent repetitions INSIDE one jit (feedback through
the output so XLA cannot hoist loop-invariant work) and divides by R.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pcd_tpu.fields.constants import MNT4_Q as MNT4_298_FQ  # noqa: E402

R = 100  # in-graph repetitions


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def chain(op):
    """y_{i+1} = op(y_i, x), R times, inside one jit."""

    @jax.jit
    def run(y, x):
        def body(i, y):
            return op(y, x)

        return jax.lax.fori_loop(0, R, body, y)

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    n = 1 << 20

    key = jax.random.PRNGKey(0)
    a32 = jax.random.randint(key, (n,), 0, 1 << 16, dtype=jnp.int32
                             ).astype(jnp.uint32)
    b32 = jax.random.randint(key, (n,), 1, 1 << 16, dtype=jnp.int32
                             ).astype(jnp.uint32)

    t = timeit(chain(lambda y, x: (y * x) & 0xFFFF), a32, b32)
    print(f"u32 mul(+mask): {n * R / t / 1e9:.1f} Gops/s", flush=True)

    t = timeit(chain(lambda y, x: y * x % jnp.float32(65521.0)),
               a32.astype(jnp.float32), b32.astype(jnp.float32))
    print(f"f32 mul(+mod):  {n * R / t / 1e9:.1f} Gops/s", flush=True)

    t = timeit(chain(lambda y, x: (y * x) >> 3), a32.astype(jnp.int32),
               b32.astype(jnp.int32))
    print(f"i32 mul(+shift): {n * R / t / 1e9:.1f} Gops/s", flush=True)

    # -- int8 MXU at limb-reduction shapes --------------------------------
    m = 1 << 16
    K8, K8o = 40, 80
    x8 = jax.random.randint(key, (m, K8), 0, 127, dtype=jnp.int32
                            ).astype(jnp.int8)
    w8 = jax.random.randint(key, (K8o, K8), 0, 127, dtype=jnp.int32
                            ).astype(jnp.int8)
    w2 = jax.random.randint(key, (K8o, K8o), 0, 127, dtype=jnp.int32
                            ).astype(jnp.int8)

    @jax.jit
    def mm8_chain(x, w, w2):
        def body(i, x):
            s = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # (m, K8o) -> feed back to int8 with data dependency
            return (s & 63).astype(jnp.int8) @ (w2 & 1).astype(jnp.int8)[:, :K8]

        return jax.lax.fori_loop(0, R, body, x)

    t = timeit(mm8_chain, x8, w8, w2)
    ops = m * K8 * K8o * R  # count only the first matmul
    print(f"int8 matmul chained ({m}x{K8}@{K8}x{K8o}): "
          f"{ops / t / 1e12:.2f} Tops/s "
          f"({m * R / t / 1e6:.1f} M rows/s)", flush=True)

    # bigger matmul to see MXU peak
    M2, K2, N2 = 4096, 512, 512
    xb = jax.random.normal(key, (M2, K2), dtype=jnp.bfloat16)
    wbig = jax.random.normal(key, (K2, N2), dtype=jnp.bfloat16)

    @jax.jit
    def mmb_chain(x, w):
        def body(i, x):
            s = (x @ w).astype(jnp.bfloat16)
            return s[:, :K2] if N2 >= K2 else s

        return jax.lax.fori_loop(0, R, body, x)

    t = timeit(mmb_chain, xb, wbig)
    print(f"bf16 matmul {M2}x{K2}x{N2}: "
          f"{2 * M2 * K2 * N2 * R / t / 1e12:.1f} TFLOP/s", flush=True)

    # -- current mont_mul (chained) ---------------------------------------
    from pcd_tpu.ops.limbs import ctx_for

    fp = ctx_for(MNT4_298_FQ)
    for batch in (1 << 14, 1 << 16, 1 << 18):
        rng = np.random.default_rng(1)
        xs = [int(rng.integers(0, 1 << 62)) for _ in range(batch)]
        A = jnp.asarray(fp.encode(xs))
        B = jnp.asarray(fp.encode(xs[::-1]))

        @jax.jit
        def mm_chain(y, x):
            def body(i, y):
                return fp.mont_mul(y, x)

            return jax.lax.fori_loop(0, R, body, y)

        t = timeit(mm_chain, A, B, iters=3)
        print(f"mont_mul CIOS (batch {batch}): "
              f"{batch * R / t / 1e6:.2f} M/s", flush=True)

    # -- EC add (chained) --------------------------------------------------
    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.ops.ec_tensor import ec_ctx

    cyc = mnt_cycle()
    ec = ec_ctx(cyc.main.g1)
    batch = 1 << 16
    g = cyc.main.g1_gen
    pts = [g * (i + 1) for i in range(64)] * (batch // 64)
    X, Y, Z = (jnp.asarray(c) for c in ec.encode_points(pts))

    @jax.jit
    def add_chain(P, Q):
        def body(i, P):
            return ec.add(P, Q)

        return jax.lax.fori_loop(0, R, body, P)

    t = timeit(add_chain, (X, Y, Z), (Y, X, Z), iters=3)
    print(f"EC complete add (batch {batch}): {batch * R / t / 1e6:.2f} M/s",
          flush=True)


if __name__ == "__main__":
    main()
