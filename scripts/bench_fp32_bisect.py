"""Perf-bisect the fused ec32 add kernel: full vs matmul-stubbed vs
schoolbook-stubbed variants tell whether the MXU matmuls or the VPU
shifted-accumulate dominates."""

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
    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.ops import fp32 as fp32_mod
    from pcd_tpu.ops.ec32 import ec32_ctx

    print("devices:", jax.devices(), flush=True)
    cyc = mnt_cycle()
    ec = ec32_ctx(cyc.main.g1)
    fp = ec.fp
    g = cyc.main.g1_gen
    batch = 1 << 16
    base = [g * (i % 512 + 1) for i in range(batch)]
    P = tuple(jnp.asarray(c) for c in ec.encode_points(base))
    Q = tuple(jnp.asarray(c) for c in ec.encode_points(base[::-1]))

    def chain():
        @jax.jit
        def add_chain(Pv, Qv):
            def body(i, acc):
                return ec.add(acc, Qv)

            return jax.lax.fori_loop(0, R, body, Pv)

        return add_chain

    t = timeit(chain(), P, Q)
    print(f"full fused add: {batch * R / t / 1e6:.2f} M/s", flush=True)

    # stub out the two matmuls (perf-only, wrong math)
    orig_mul = fp32_mod.Fp32Ctx.mul

    def mul_nomatmul(self, a, b, N0=None, P0=None):
        k, kp, k2p = self.k, self.kp, self.k2p
        a, b = jnp.broadcast_arrays(a, b)
        t = jnp.zeros(a.shape[:-1] + (k2p,), dtype=jnp.float32)
        zcol = jnp.zeros(a.shape[:-1] + (1,), dtype=jnp.float32)
        for i in range(k):
            prod = a[..., i : i + 1] * b[..., :kp]
            if i:
                prod = jnp.concatenate(
                    [jnp.broadcast_to(zcol, a.shape[:-1] + (i,)), prod],
                    axis=-1)
            pad_r = k2p - prod.shape[-1]
            if pad_r:
                prod = jnp.concatenate(
                    [prod, jnp.broadcast_to(zcol, a.shape[:-1] + (pad_r,))],
                    axis=-1)
            t = t + prod
        t = self.settle(t)
        return t[..., :kp]  # WRONG result, same VPU work minus matmuls

    fp32_mod.Fp32Ctx.mul = mul_nomatmul
    t = timeit(chain(), P, Q)
    print(f"no-matmul variant: {batch * R / t / 1e6:.2f} M/s", flush=True)

    # stub the schoolbook too: elementwise product only + settle
    def mul_noschool(self, a, b, N0=None, P0=None):
        a, b = jnp.broadcast_arrays(a, b)
        return self.settle(a * b)

    fp32_mod.Fp32Ctx.mul = mul_noschool
    t = timeit(chain(), P, Q)
    print(f"elementwise-only variant: {batch * R / t / 1e6:.2f} M/s",
          flush=True)

    # matmuls only: skip schoolbook, feed a directly
    def mul_matmulonly(self, a, b, N0=None, P0=None):
        if N0 is None:
            N0 = jnp.asarray(self.N0, dtype=jnp.bfloat16)
        if P0 is None:
            P0 = jnp.asarray(self.P0, dtype=jnp.bfloat16)
        k, kp = self.k, self.kp
        a, b = jnp.broadcast_arrays(a, b)
        m = jnp.dot(a.astype(jnp.bfloat16), N0,
                    preferred_element_type=jnp.float32)
        mp = jnp.dot(m.astype(jnp.bfloat16), P0,
                     preferred_element_type=jnp.float32)
        return self.settle(mp[..., :kp])

    fp32_mod.Fp32Ctx.mul = mul_matmulonly
    t = timeit(chain(), P, Q)
    print(f"matmul-only variant: {batch * R / t / 1e6:.2f} M/s", flush=True)

    fp32_mod.Fp32Ctx.mul = orig_mul


if __name__ == "__main__":
    main()
