"""Round benchmark — run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: Pippenger MSM throughput on MNT4-298 G1 at n = 2^18
(production MainCircuit scale), measured on EVERY available tier — the
TPU device tier (device-scheduled stream MSM, ops/msm_stream_dev.py:
scalar limbs cross the wire, digits/sort/placement/accumulate run on
chip) and the host C++ tier (pcd_tpu/native threaded batch-affine
Pippenger) — and reporting the best; both appear in extra.tiers.

Each tier's value is its SUSTAINED throughput over PIPE back-to-back
MSMs (total points / wall): that is the prover's steady state — every
prove queues the a/b1/b2/l/h commitment MSMs, so uploads of MSM k+1
overlap device compute of MSM k on the TPU tier, while the host tier is
compute-bound and sustains its single-shot rate.  Single-shot warm
walls for both tiers are in extra (extra.single).  Per-call scalar
marshalling (host: scalar->limb rows; device: that plus the limb
upload) stays inside the timers.  vs_baseline is the ratio against the
1.0 Mpoints/s/chip nominal target (BASELINE.md).

extra fields:
  tiers                per-tier sustained Mpoints/s
  single               per-tier single-shot Mpoints/s
  msm_2_18_warm_s      wall seconds of one warm 2^18 MSM on the best tier
  msm_8192             round-1 continuity metric (Mpoints/s)
  ivc_step_s           warm MNT4-298 Groth16 IVC step seconds, if a pk
                       checkpoint exists (.bench_cache/, created by
                       scripts/real_cycle_smoke.py --save-pk); the
                       BASELINE.md north-star is >= 1 step/s
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def _emit(obj):
    print(json.dumps(obj))
    sys.stdout.flush()


def _fail_line(error: str):
    """Always emit the one JSON line, even when every backend is down
    (VERDICT r2 weak #2: bench.py must degrade, not die)."""
    _emit({
        "metric": "msm_mnt4_298_g1_throughput_2e18",
        "value": 0.0,
        "unit": "Mpoints/s/chip",
        "vs_baseline": 0.0,
        "extra": {"error": error[:400]},
    })


def _probe_backend(timeout_s: int = 240, attempts: int = 3,
                   backoff_s: float = 15.0, _run=None) -> str | None:
    """Initialize the accelerator in a THROWAWAY subprocess first: TPU
    tunnel failures on this machine can hang device init forever, which
    would hang the whole bench.  Retries with backoff (VERDICT r4 item 2:
    one wedged probe erased the whole round's TPU evidence in
    BENCH_r04.json).  Returns an error string or None on success.
    _run is injected by tests."""
    code = ("import jax, numpy as np, jax.numpy as jnp;"
            "x = jnp.ones((8, 128));"
            "print(float(np.asarray(x @ x.T).sum()), jax.default_backend())")
    run = _run or (lambda: subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout_s))
    errs = []
    for i in range(attempts):
        if i:
            time.sleep(backoff_s)
        try:
            r = run()
        except subprocess.TimeoutExpired:
            errs.append(f"attempt {i + 1}: probe hung (> {timeout_s}s)")
            continue
        if r.returncode == 0:
            return None
        errs.append(f"attempt {i + 1}: rc={r.returncode}: "
                    + (r.stderr or r.stdout)[-120:])
    return "; ".join(errs)


def _inputs(n):
    import numpy as np

    from pcd_tpu.curves import models as M

    cfg = M.mnt4_298()
    g = cfg.g1_gen
    base = [g]
    for _ in range(4095):
        base.append(base[-1] + g)
    pts = [base[i % 4096] for i in range(n)]
    rng = np.random.default_rng(42)
    r = cfg.g1.order
    scalars = [(int(x) * 0x9E3779B97F4A7C15) % r
               for x in rng.integers(1, 1 << 63, size=n)]
    return cfg, pts, scalars


PIPE = 3  # back-to-back MSMs per sustained measurement


def _bench_host(pts, scalars, reps=3):
    """Host C++ tier.  The point table is pre-marshalled once (the
    framework does the same for pk query tables via encode_query); the
    per-call scalar->limb marshalling stays inside the timer because
    every prove pays it.  Returns (sustained Mpts/s, single warm
    seconds, single Mpts/s) — the host tier is compute-bound, so the
    sustained rate is just PIPE consecutive MSMs / wall."""
    from pcd_tpu import native
    from pcd_tpu.msm.host import encode_query
    from pcd_tpu.msm.host import msm as host_msm

    if not native.available():
        raise RuntimeError("native tier unavailable")
    n = len(pts)
    enc = encode_query(pts)
    host_msm(enc.slice(0, 4096), scalars[:4096])  # warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        host_msm(enc, scalars)
        times.append(time.time() - t0)
    single = min(times)
    t0 = time.time()
    for _ in range(PIPE):
        host_msm(enc, scalars)
    sus = PIPE * n / (time.time() - t0) / 1e6
    return sus, single, n / single / 1e6


def _bench_tpu(cfg, pts, scalars, reps=3):
    """Device tier (device-scheduled stream MSM, ops/msm_stream_dev.py).
    Points live on device (pk queries are device-resident in
    production); the per-call scalar->limb-rows marshalling + the limb
    upload + the on-chip schedule all stay inside the timer.  Sustained:
    PIPE MSMs dispatched back-to-back before collecting (the prover's
    stream offload queues its commitment MSMs exactly like this), so
    uploads ride the wire while earlier MSMs compute."""
    import numpy as np

    import jax

    from pcd_tpu.ops.msm_stream import stream_ctx
    from pcd_tpu.ops.msm_stream_dev import DevSchedMSM

    n = len(pts)
    sctx = stream_ctx(cfg.g1, cfg.Fr.BITS)
    dm = DevSchedMSM(sctx)
    XY, inf = sctx.encode_table(pts)
    limbs = sctx.limb_rows(scalars)
    dm.msm_limbs(XY, limbs, inf)  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        dm.msm_limbs(XY, limbs, inf)
        times.append(time.time() - t0)
    single = min(times)
    infd = (jax.device_put(np.asarray(inf, dtype=bool))
            if np.asarray(inf).any() else None)
    t0 = time.time()
    futs = []
    for _ in range(PIPE):
        W = jax.device_put(dm.limbs_u32(sctx.limb_rows(scalars)))
        futs.append(dm.window_sums(XY, W, infd))
    for act, ws in futs:
        dm.horner_host(act, tuple(np.asarray(c) for c in ws))
    sus = PIPE * n / (time.time() - t0) / 1e6
    return sus, single, n / single / 1e6


def _ivc_step():
    """(seconds, tier) of a warm recursive IVC step, from a pk checkpoint
    if present.  Runs the framework's own auto dispatch (device/native/
    Python tiers); tier records what actually ran (VERDICT r4 item 2c)."""
    ckpt = os.path.join(".bench_cache", "pcd_mnt4_groth16_pk.bin")
    if not os.path.exists(ckpt):
        return None
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate
    from pcd_tpu.utils.rng import ChaChaRng
    from pcd_tpu.utils.serialize import pcd_pk_from_bytes

    class Pred(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    pcd = configs.mnt4_groth16()
    F = pcd.ic.main_field
    pred = Pred(F)
    with open(ckpt, "rb") as f:
        pk = pcd_pk_from_bytes(pcd, f.read())
    rng = ChaChaRng(b"bench ivc")
    one = F.from_int(1)
    # base case: warms every compile + records the witness programs
    p1 = pcd.prove(pk, pred, one, one, [], [], rng)
    # warm recursive step (the north-star quantity)
    t0 = time.time()
    pcd.prove(pk, pred, F.from_int(2), one, [one], [p1], rng)
    dt = time.time() - t0
    import jax

    from pcd_tpu.snark import msm_dispatch
    tier = "host"
    try:
        from pcd_tpu import native
        if native.available():
            tier = "cpu-native"
    except Exception:
        pass
    if jax.default_backend() == "tpu" and msm_dispatch.stream_enabled("auto"):
        tier = tier + "+tpu-stream"
    return dt, tier


def _config_cache():
    import jax

    # persistent XLA cache: the fused stream-MSM programs take minutes
    # to compile cold; cached compiles survive across bench runs when
    # compilation happens client-side
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _tier_main(which: str):
    """Subprocess entry (`--tier tpu` / `--tier ivc`): the device-facing
    measurements run ISOLATED so a tunnel that wedges mid-measurement
    only costs that tier, never the whole round's artifact (VERDICT r4
    item 2 — one wedged probe erased all of BENCH_r04's TPU data)."""
    _config_cache()
    out = {}
    if which == "tpu":
        n = 1 << 18
        cfg, pts, scalars = _inputs(n)
        sus, wsingle, rsingle = _bench_tpu(cfg, pts, scalars)
        out = {"sus": sus, "single_s": wsingle, "single": rsingle}
        try:
            out["msm8192"] = _bench_tpu(cfg, pts[:8192],
                                        scalars[:8192])[2]
        except Exception:
            pass
    elif which == "ivc":
        step = _ivc_step()
        if step is not None:
            out = {"ivc_step_s": step[0], "tier": step[1]}
    _emit(out)


def _run_tier(which: str, timeout_s: int):
    """Run one isolated tier measurement; returns its dict or raises."""
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--tier", which],
        capture_output=True, text=True, timeout=timeout_s)
    if r.returncode != 0:
        raise RuntimeError(f"tier {which} rc={r.returncode}: "
                           + (r.stderr or r.stdout)[-200:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    if "--tier" in sys.argv:
        _tier_main(sys.argv[sys.argv.index("--tier") + 1])
        return
    tpu_err = _probe_backend()
    import jax

    if tpu_err is not None:
        # host-only run: keep jax off the wedged device plugin
        jax.config.update("jax_platforms", "cpu")
    _config_cache()
    n = 1 << 18
    try:
        cfg, pts, scalars = _inputs(n)
    except Exception as e:
        _fail_line(f"input construction failed: {type(e).__name__}: {e}")
        return
    tiers = {}
    warm = {}
    single = {}
    tpu_data = None
    try:
        (tiers["cpu-native"], warm["cpu-native"],
         single["cpu-native"]) = _bench_host(pts, scalars)
    except Exception as e:
        tiers["cpu-native"] = 0.0
        warm["cpu-native-error"] = f"{type(e).__name__}: {e}"[:200]
    if tpu_err is None:
        try:
            tpu_data = _run_tier("tpu", 3600)
            tiers["tpu"] = tpu_data["sus"]
            warm["tpu"] = tpu_data["single_s"]
            single["tpu"] = tpu_data["single"]
        except Exception as e:
            tiers["tpu"] = 0.0
            warm["tpu-error"] = f"{type(e).__name__}: {e}"[:200]
    best_tier = max(tiers, key=tiers.get)
    mpts = tiers[best_tier]
    if mpts <= 0.0:
        _fail_line("all tiers failed: "
                   + json.dumps({**warm, "tpu_probe": tpu_err or "ok"}))
        return
    extra = {
        "backend": best_tier,
        "tiers": {k: round(v, 4) for k, v in tiers.items()},
        "single": {k: round(v, 4) for k, v in single.items()},
        "msm_2_18_warm_s": round(warm[best_tier], 2),
    }
    if tpu_err is not None:
        extra["tpu_error"] = tpu_err[:300]
    try:
        # best tier AT THIS SIZE (the stream tier's fixed finish-phase
        # cost dominates small MSMs; production dispatch keeps them on
        # the host tier — snark/msm_dispatch.STREAM_MIN)
        small = [_bench_host(pts[:8192], scalars[:8192])[2]]
        if tpu_data is not None and "msm8192" in tpu_data:
            small.append(tpu_data["msm8192"])
        extra["msm_8192"] = round(max(small), 4)
    except Exception:
        pass
    try:
        if tpu_err is None:
            ivc = _run_tier("ivc", 3600)
        else:
            ivc = {}
            step = _ivc_step()
            if step is not None:
                ivc = {"ivc_step_s": step[0], "tier": step[1]}
        if ivc.get("ivc_step_s"):
            extra["ivc_step_s"] = round(ivc["ivc_step_s"], 1)
            extra["ivc_steps_per_s"] = round(1.0 / ivc["ivc_step_s"], 4)
            extra["ivc_tier"] = ivc["tier"]
    except Exception as e:  # never lose the headline metric
        extra["ivc_error"] = f"{type(e).__name__}: {e}"[:300]
    obj = {
        "metric": "msm_mnt4_298_g1_throughput_2e18",
        "value": round(mpts, 4),
        "unit": "Mpoints/s/chip",
        "vs_baseline": round(mpts / 1.0, 4),
        "extra": extra,
    }
    _emit(obj)
    # builder-run artifact (VERDICT r4 item 2b): `python bench.py --out
    # BENCH_SELF_r05.json` commits the same object with a timestamp so
    # claimed numbers always have a JSON behind them
    if "--out" in sys.argv:
        path = sys.argv[sys.argv.index("--out") + 1]
        obj["captured_unix"] = int(time.time())
        with open(path, "w") as f:
            json.dump(obj, f, indent=1)


if __name__ == "__main__":
    main()
