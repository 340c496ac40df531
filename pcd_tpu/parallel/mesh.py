"""Device-mesh utilities and sharded collective kernels (SURVEY.md §2c —
the TPU-native replacement for the reference's single-process rayon
parallelism; reference has no distributed backend at all, Cargo.toml:45).

Parallelism mapping:
  DP  — MSM point shards across chips, EC tree-reduction after all_gather
        (collectives ride ICI); independent PCD DAG-node proofs farmed
        across hosts (pcd_tpu/parallel/farm.py)
  TP  — window/bucket-parallel Pippenger within one MSM
        (sharded_msm_windows below; oracle-tested in tests/test_dist.py)
  PP  — main-prove(i+1) overlapped with help-prove(i)
        (pcd_tpu/parallel/pipeline.py)
  SP  — witness vectors / constraint rows sharded over chips
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_msm(msm_ctx, mesh: Mesh, axis: str = "shard"):
    """Build a jitted sharded-MSM callable: points and digit columns are
    sharded over `axis`; each chip runs the local Pippenger kernel; partial
    results are all_gathered and tree-combined with EC adds (replicated
    output).

    Returns fn((X, Y, Z), digits) -> (X, Y, Z) single point, where inputs
    have global shapes (n, K) / (nwin, n) and n % n_devices == 0.
    """
    ec = msm_ctx.ec
    ndev = mesh.shape[axis]

    def local(X, Y, Z, digits):
        part = msm_ctx.msm_digits((X, Y, Z), digits)
        # gather partials from every chip: (ndev, K)
        gx = jax.lax.all_gather(part[0], axis)
        gy = jax.lax.all_gather(part[1], axis)
        gz = jax.lax.all_gather(part[2], axis)

        def body(i, acc):
            return ec.add(acc, (gx[i], gy[i], gz[i]))

        return jax.lax.fori_loop(0, ndev, body, ec.identity(()))

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(None, axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,  # scan carries inside use unvarying inits
    )

    @jax.jit
    def run(Pts, digits):
        return shmapped(Pts[0], Pts[1], Pts[2], digits)

    return run


def sharded_window_sums(msm_ctx, mesh: Mesh, axis: str = "shard"):
    """Sharded Pippenger window sums: points + digit columns sharded over
    `axis`, each chip computes its local per-window bucket sums, partials
    are all_gathered and tree-combined with BATCHED EC adds (one add per
    device over the whole window axis).  The Horner tail (c doublings +
    one add per window on batch-1 data) runs on host — same split as the
    single-chip f32 path (ops/msm_tensor.msm_to_host), which keeps the
    fused f32 kernels (the round-2 5-7x win) usable under shard_map.

    Returns fn((X, Y, Z), digits) -> stacked (nwin_pad, ...) window-sum
    coords, replicated."""
    ec = msm_ctx.ec
    ndev = mesh.shape[axis]

    def local(X, Y, Z, digits):
        ws = msm_ctx._window_sums_impl((X, Y, Z), digits)
        g = tuple(jax.lax.all_gather(c, axis) for c in ws)  # (ndev, nwin,...)

        def body(i, acc):
            return ec.add(acc, tuple(c[i] for c in g))

        return jax.lax.fori_loop(1, ndev, body,
                                 tuple(c[0] for c in g))

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(None, axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(Pts, digits):
        return shmapped(Pts[0], Pts[1], Pts[2], digits)

    return run


def sharded_msm_windows(msm_ctx, mesh: Mesh, axis: str = "shard"):
    """TP variant (SURVEY.md §2c 'bucket-parallel Pippenger'): the WINDOW
    axis — and with it the whole bucket phase — is sharded over chips;
    every chip holds the full point set and computes the bucket
    scatter/suffix-scan for its window subset only.  No cross-chip
    traffic during accumulation; the per-window sums (nwin points, tiny)
    are all_gathered at the end for the Horner tail.

    Complements `sharded_window_sums` (DP over points): DP wins when the
    point set dwarfs HBM per chip; TP wins when points fit everywhere and
    the bucket phase dominates (large c, moderate n).

    Returns fn((X, Y, Z), digits) -> stacked (nwin_padded, ...) window-sum
    coords, replicated, nwin_padded = ceil(nwin/ndev)*ndev."""
    ndev = mesh.shape[axis]

    def local(X, Y, Z, digits):
        ws = msm_ctx._window_sums_impl((X, Y, Z), digits)
        return tuple(jax.lax.all_gather(c, axis, tiled=True) for c in ws)

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None), P(None), P(None), P(axis, None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(Pts, digits):
        nwin, n = digits.shape
        # per-device window count must be a multiple of the kernel's
        # internal vmap chunk, or the local zero-padding would interleave
        # garbage rows into the tiled all_gather layout
        step = ndev * msm_ctx.window_chunk(n)
        pad = (-nwin) % step
        if pad:
            # zero-digit windows sum to identity and are ignored by the
            # Horner tail (which walks msm_ctx.nwin windows only)
            digits = jnp.pad(digits, [(0, pad), (0, 0)])
        return shmapped(Pts[0], Pts[1], Pts[2], digits)

    return run


def shard_batch(arr, mesh: Mesh, axis_name: str, dim: int = 0):
    """Place an array sharded along `dim` over the mesh axis."""
    spec = [None] * arr.ndim
    spec[dim] = axis_name
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))
