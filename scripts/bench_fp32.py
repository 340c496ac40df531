"""TPU benchmark: f32/8-bit-limb path (fp32/ec32) vs the u32 CIOS path.
Chained in-graph repetitions amortize the ~10 ms axon dispatch latency."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pcd_tpu.fields.constants import MNT4_Q

R = 50


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    from pcd_tpu.ops.fp32 import fp32_ctx

    p = MNT4_Q
    fp = fp32_ctx(p)
    rng = np.random.default_rng(3)
    for batch in (1 << 16, 1 << 18):
        xs = [int.from_bytes(rng.bytes(37), "little") % p
              for _ in range(batch)]
        A = jnp.asarray(fp.encode(xs))
        B = jnp.asarray(fp.encode(xs[::-1]))

        @jax.jit
        def mm_chain(y, x):
            def body(i, y):
                return fp.mul(y, x)

            return jax.lax.fori_loop(0, R, body, y)

        t = timeit(mm_chain, A, B)
        print(f"fp32 mont_mul (batch {batch}): {batch * R / t / 1e6:.1f} M/s",
              flush=True)
        # correctness spot check on device output
        out = fp.decode(np.asarray(mm_chain(A, B))[:4])
        Rm = fp.R
        expect = [x * pow(y, R, p) % p
                  for x, y in zip(xs[:4], [xs[-1], xs[-2], xs[-3], xs[-4]])]
        assert out == expect, "fp32 chain mismatch on TPU!"
        print("  correctness OK", flush=True)

    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.ops.ec32 import ec32_ctx
    from pcd_tpu.ops.ec_tensor import ec_ctx

    cyc = mnt_cycle()
    ec = ec32_ctx(cyc.main.g1)
    ecu = ec_ctx(cyc.main.g1)
    g = cyc.main.g1_gen
    for batch in (1 << 16, 1 << 18):
        base = [g * (i % 1024 + 1) for i in range(batch)]
        P = tuple(jnp.asarray(c) for c in ec.encode_points(base))
        Q = tuple(jnp.asarray(c) for c in
                  ec.encode_points([pt + g for pt in base[:batch]]))

        @jax.jit
        def add_chain(Pv, Qv):
            def body(i, acc):
                return ec.add(acc, Qv)

            return jax.lax.fori_loop(0, R, body, Pv)

        t = timeit(add_chain, P, Q)
        print(f"ec32 fused add (batch {batch}): {batch * R / t / 1e6:.2f} M/s",
              flush=True)
        outP = add_chain(P, Q)
        got = ec.decode_point(tuple(np.asarray(c)[0] for c in outP))
        assert got == base[0] + (base[0] + g) * R, "ec32 chain mismatch!"
        print("  correctness OK", flush=True)

        Pu = tuple(jnp.asarray(c) for c in ecu.encode_points(base))
        Qu = tuple(jnp.asarray(c) for c in
                   ecu.encode_points([pt + g for pt in base]))

        @jax.jit
        def add_chain_u32(Pv, Qv):
            def body(i, acc):
                return ecu.add(acc, Qv)

            return jax.lax.fori_loop(0, R, body, Pv)

        t = timeit(add_chain_u32, Pu, Qu)
        print(f"u32  add (batch {batch}): {batch * R / t / 1e6:.2f} M/s",
              flush=True)


if __name__ == "__main__":
    main()
