"""Shared size-dispatching MSM / fixed-base helpers for SNARK backends.

Small workloads use host Python points; large ones run on the device data
plane (fixed-base gathers, Pippenger MSM) with keys kept device-resident
as DevicePointVec.

The device path is TPU-only: XLA-CPU aborts (or takes tens of minutes)
compiling the large segmented-scan MSM graphs, and the host Python
Pippenger over GMP-class ints beats XLA-CPU at every size anyway.
"""

from __future__ import annotations

DEVICE_THRESHOLD = 16384


def _device_ok() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def native_prove_ok(cfg) -> bool:
    """True when the C++ host tier can run this cycle's whole prove data
    plane (threaded batch-affine Pippenger, CSR matvec, mixed-radix NTT).
    In auto mode the host tier ORCHESTRATES the prove (witness replay,
    matvec, quotient pipeline) while the commitment MSMs are offloaded
    to the TPU stream tier whenever one is attached (stream_enabled
    below) — the round-3 either/or dispatch became a round-4 overlap."""
    from ..msm.host import _native, _native_curve_ok

    return (_native() is not None and _native_curve_ok(cfg.g1)
            and _native_curve_ok(cfg.g2))


def fb_mul(cfg, which: str, scalars, scalar_bits: int, as_host: bool = False,
           force_host: bool = False):
    """[s_i] G batch for G = cfg's G1/G2 generator.  The host C++
    windowed fixed-base is preferred over the device gather path when it
    can take the curve (measured faster at every size — full MNT-298
    setup 57.9 s host vs 135 s device, round 3)."""
    if not force_host and len(scalars) >= DEVICE_THRESHOLD:
        from ..msm.host import _native, _native_curve_ok

        curve = cfg.g1 if which == "g1" else cfg.g2
        if _native() is not None and _native_curve_ok(curve):
            force_host = True
    if force_host or len(scalars) < DEVICE_THRESHOLD or not _device_ok():
        from ..msm.host import (FixedBaseTable, _native, _native_curve_ok,
                                fixed_base_many)

        curve = cfg.g1 if which == "g1" else cfg.g2
        base = cfg.g1_gen if which == "g1" else cfg.g2_gen
        if len(scalars) >= 64 and _native_curve_ok(curve) \
                and _native() is not None:
            return fixed_base_many(base, scalars, scalar_bits)
        key = ("_fbt_" + which, scalar_bits)
        tbl = getattr(cfg, "_fb_cache", None)
        if tbl is None:
            tbl = {}
            object.__setattr__(cfg, "_fb_cache", tbl)
        if key not in tbl:
            tbl[key] = FixedBaseTable(base, scalar_bits, window=8)
        return [tbl[key].mul(int(s)) for s in scalars]
    import jax.numpy as jnp

    from ..ops.fixed_base import DevicePointVec, fixed_base_device

    curve = cfg.g1 if which == "g1" else cfg.g2
    base = cfg.g1_gen if which == "g1" else cfg.g2_gen
    fb = fixed_base_device(curve, base, scalar_bits)
    digits = jnp.asarray(fb.digits_from_ints(scalars))
    vec = DevicePointVec(curve, fb.mul_digits_padded(digits))
    return vec.to_host() if as_host else vec


def msm_any(query, scalars, scalar_bits: int):
    """MSM over a host point list or a DevicePointVec; returns a host point."""
    from ..ops.fixed_base import DevicePointVec

    if isinstance(query, DevicePointVec):
        import jax.numpy as jnp

        from ..ops.msm_tensor import msm_ctx_for

        mctx = msm_ctx_for(query.curve, scalar_bits, len(query))
        digits = jnp.asarray(mctx.digits_from_ints(scalars))
        arrays = query.as_f32() if mctx.backend == "f32" else query.arrays
        return mctx.msm_to_host(arrays, digits)
    from ..msm.host import msm as host_msm
    from ..native import EncodedPoints

    if isinstance(query, EncodedPoints):
        # pre-marshalled table: no host-side zero filtering (the C++
        # bucket loop skips zero digits at negligible cost).  Mirror the
        # zip() truncation semantics of the list path below.
        n = min(len(query), len(scalars))
        if len(query) != n:
            query = query.slice(0, n)
        return host_msm(query, scalars if len(scalars) == n
                        else scalars[:n])
    import numpy as np

    if isinstance(scalars, np.ndarray):
        # limb fast-path scalars meeting a small plain-list query
        from ..native import limbs_to_ints

        scalars = limbs_to_ints(scalars)
    nz = [(pt, s) for pt, s in zip(query, scalars) if int(s)]
    if not nz:
        return query[0].curve.infinity()
    return host_msm([a for a, _ in nz], [b for _, b in nz])


def host_query(owner, name: str):
    """owner.<name> is a FIXED host point list consumed by repeated MSMs
    (a pk query table / SRS powers).  Returns a pre-marshalled
    EncodedPoints cached on the owner — the Python-side marshalling of a
    production-size table costs more than the native MSM itself.
    DevicePointVec queries pass through untouched."""
    q = getattr(owner, name)
    from ..ops.fixed_base import DevicePointVec

    if isinstance(q, DevicePointVec) or not isinstance(q, list):
        return q
    cache = getattr(owner, "_host_enc", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(owner, "_host_enc", cache)
        except Exception:
            return q
    enc = cache.get(name)
    if enc is None:
        from ..msm.host import encode_query

        enc = encode_query(q)
        cache[name] = enc
    return enc


# -- stream-MSM offload (shared by the Groth16/GM17 provers) ------------
# Threshold: the stream tier's fixed per-MSM cost (suffix scan + window
# dispatch) is ~0.2 s; below ~24k rows the host tier finishes first AND
# there is no host work left to overlap.  At the 31k-row HelpCircuit
# the offload overlaps the host witness replay + quotient pipeline, so
# the help prove stops being half the warm IVC step (round-4 span
# profile: help_prove ~3.0 s of the 6.2 s step, msm_b2 alone 0.78 s).
STREAM_MIN = 24_000


def stream_enabled(backend: str) -> bool:
    """Stream offload is default-ON whenever a TPU is attached;
    PCD_TPU_STREAM=0 opts out, backend='host' pins the host tier."""
    import os

    if os.environ.get("PCD_TPU_STREAM", "1") == "0":
        return False
    if backend == "host":
        return False
    return _device_ok()


def stream_table(pk, nm: str, curve, scalar_bits: int):
    """(stream ctx, XY table, inf mask) for a pk query table, cached on
    the pk; None when the table isn't native-encoded or the coordinate
    field is unsupported."""
    from ..native import EncodedPoints
    from ..ops.msm_stream import stream_ctx, stream_ok

    if not stream_ok(curve):
        return None
    sctx = stream_ctx(curve, scalar_bits)
    tables = getattr(pk, "_stream_tables", None)
    if tables is None:
        tables = {}
        try:
            pk._stream_tables = tables
        except Exception:
            return None
    hit = tables.get(nm)
    if hit is None:
        enc = host_query(pk, nm)
        if not isinstance(enc, EncodedPoints):
            return None
        hit = sctx.table_from_limbs(enc.xs, enc.ys, enc.inf)
        # force the encode/doubling build to finish before anything else
        # queues: its multi-GB transients must not overlap live MSM
        # queues (and block_until_ready is unreliable over the tunnel)
        float(hit[0][0, 0])
        tables[nm] = hit
    return (sctx,) + hit


def devsched_enabled() -> bool:
    """Device-side scheduling (ops/msm_stream_dev.py): only the scalar
    limbs cross the wire (~40 B/point vs ~94 B/point of packed schedule)
    and the counting placement runs on the chip — measured 1.5x the
    host-scheduled stream rate SUSTAINED (bench.py tiers).  Default OFF
    in the prover: its fused accumulate program costs minutes of XLA
    compile per (table, shape) key on this box (compiles run server-side
    over the tunnel, so the persistent client cache cannot amortize
    them), which exceeds a whole 3-step IVC chain; long-running chain or
    repeated-MSM deployments amortize it and should set
    PCD_TPU_DEVSCHED=1.  bench.py measures the devsched tier directly."""
    import os

    return os.environ.get("PCD_TPU_DEVSCHED", "0") == "1"


def stream_msm_async(pk, nm: str, curve, scalar_bits: int, scal_limbs,
                     sched_cache=None):
    """Dispatch one query MSM to the TPU stream tier without blocking
    (fully: host-scheduled variant) or up to the histogram fetch
    (device-scheduled variant); returns an opaque future for
    stream_collect, or None.  scal_limbs: (n, NL) u64 canonical limbs
    (truncated/validated against the table length).

    sched_cache: optional per-prove dict.  When the table carries in-row
    infinity flags the host schedule is TABLE-AGNOSTIC (placement
    depends only on the scalars), so the a/b1/b2 commitment MSMs — the
    same z vector against three tables — share ONE schedule and ONE
    schedule upload; the schedule wire is the warm IVC step's critical
    path (round-5 span: stream_dispatch_h ~2-14 s/step)."""
    import numpy as np

    tab = stream_table(pk, nm, curve, scalar_bits)
    if tab is None:
        return None
    sctx, XY, inf = tab
    qn = len(getattr(pk, nm))
    sl = np.ascontiguousarray(scal_limbs[:qn])
    if sl.shape[0] != qn:
        return None
    if devsched_enabled():
        import jax

        from ..ops.msm_stream_dev import devsched_ctx

        dm = devsched_ctx(curve, scalar_bits, sctx.c, sctx.L)
        W = jax.device_put(dm.limbs_u32(sl))
        inf_dev = None
        if np.asarray(inf).any() and not dm.inf_flagged():
            # tables without a pad limb can't carry the in-row infinity
            # flag; fall back to the P1 digit mask for those fields
            cache = getattr(pk, "_stream_inf_dev", None)
            if cache is None:
                cache = {}
                try:
                    pk._stream_inf_dev = cache
                except Exception:
                    cache = None
            if cache is not None and nm in cache:
                inf_dev = cache[nm]
            else:
                inf_dev = jax.device_put(np.asarray(inf, dtype=bool))
                if cache is not None:
                    cache[nm] = inf_dev
        act, ws = dm.window_sums(XY, W, inf_dev)
        if not act:
            return ("const", sctx.curve.infinity())
        return ("dev", dm, act, ws)
    fp = sctx.ec.fp
    flagged = fp.kp > fp.k   # infinities handled in-kernel via pad limb
    sched = None
    key = (sctx.c, sctx.L, qn)
    if flagged and sched_cache is not None:
        sched = sched_cache.get(key)
    if sched is None:
        sched = sctx.schedule_any(sl, None if flagged else inf)
        if flagged and sched_cache is not None:
            sched_cache[key] = sched
    return ("host", sctx, sctx.window_sums_async(XY, sched))


def stream_collect(fut):
    """Block on a dispatched stream MSM and Horner-combine on host."""
    import numpy as np

    if fut[0] == "const":
        return fut[1]
    if fut[0] == "dev":
        _, dm, act, ws = fut
        return dm.horner_host(act, tuple(np.asarray(c) for c in ws))
    _, sctx, ws = fut
    return sctx.horner_host(tuple(np.asarray(c) for c in ws))


def subrange(query, start: int, stop=None):
    from ..native import EncodedPoints
    from ..ops.fixed_base import DevicePointVec

    if isinstance(query, (DevicePointVec, EncodedPoints)):
        n = len(query)
        return query.slice(start, n if stop is None else stop)
    return query[start:stop]
