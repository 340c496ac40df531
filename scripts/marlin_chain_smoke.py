"""Marlin PCD chains on the toy cycle, run on the REAL TPU (the pytest
conftest forces CPU, where the 1.5M-point KZG SRS commits are
host-bound).  Mirrors reference tests/mnt4_marlin.rs:141-204:
circuit-specific 2-step chain + negative check, and (--universal) the
universal-setup + index path.  Writes marlin_chain_smoke.json."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    if "--cpu" in sys.argv:
        # grind the toy chain on host (no TPU required; device init can
        # hang when the tunnel is down).  Must be set via jax.config —
        # the axon plugin overrides the JAX_PLATFORMS env var at import.
        import jax

        jax.config.update("jax_platforms", "cpu")
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate
    from pcd_tpu.snark.marlin.native import MarlinBound
    from pcd_tpu.utils.rng import ChaChaRng

    class Pred(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    t_start = time.time()
    stats = {}
    uni_only = "--universal-only" in sys.argv
    if uni_only and "--universal" not in sys.argv:
        sys.argv.append("--universal")

    def mark(name, t0):
        dt = time.time() - t0
        stats[name] = round(dt, 1)
        print(f"[{time.time()-t_start:8.1f}s] {name}: {dt:.1f}s", flush=True)
        return time.time()

    real = "--real" in sys.argv
    # --real: the REAL MNT4-298/MNT6-298 cycle (reference
    # tests/mnt4_marlin.rs:141-204 runs there); default: toy cycle
    pcd = configs.mnt4_marlin() if real else configs.toy_marlin()
    F = pcd.ic.main_field
    pred = Pred(F)
    rng = ChaChaRng(b"marlin chain smoke")

    if uni_only:
        run_universal(pcd, pred, stats, mark, t_start, real)
        return

    t0 = time.time()
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    t0 = mark("setup", t0)

    one = F.from_int(1)
    p1 = pcd.prove(pk, pred, one, one, [], [], rng)
    t0 = mark("prove_base", t0)
    ok1 = pcd.verify(vk, pred, one, p1)
    stats["base_verifies"] = bool(ok1)
    print("BASE VERIFIES:", ok1, flush=True)

    two = F.from_int(2)
    p2 = pcd.prove(pk, pred, two, one, [one], [p1], rng)
    t0 = mark("prove_step2", t0)
    ok2 = pcd.verify(vk, pred, two, p2)
    stats["step2_verifies"] = bool(ok2)
    print("STEP 2 VERIFIES:", ok2, flush=True)
    stats["neg_check_rejects"] = not pcd.verify(vk, pred, one, p2)
    print("NEG CHECK REJECTS:", stats["neg_check_rejects"], flush=True)

    if "--universal" in sys.argv:
        run_universal(pcd, pred, stats, mark, t_start, real)
        return

    _finish(stats, t_start, real, uni_only=False)


def run_universal(pcd, pred, stats, mark, t_start, real):
    import time

    from pcd_tpu.snark.marlin.native import MarlinBound
    from pcd_tpu.utils.rng import ChaChaRng

    F = pcd.ic.main_field
    one, two = F.from_int(1), F.from_int(2)
    rng2 = ChaChaRng(b"marlin universal smoke")
    t0 = time.time()
    pp = pcd.universal_setup(MarlinBound(max_degree=16), rng2)
    t0 = mark("universal_setup", t0)
    upk, uvk = pcd.index(pp, pred, rng2)
    t0 = mark("index", t0)
    q1 = pcd.prove(upk, pred, one, one, [], [], rng2)
    t0 = mark("u_prove_base", t0)
    stats["u_base_verifies"] = bool(pcd.verify(uvk, pred, one, q1))
    q2 = pcd.prove(upk, pred, two, one, [one], [q1], rng2)
    t0 = mark("u_prove_step2", t0)
    stats["u_step2_verifies"] = bool(pcd.verify(uvk, pred, two, q2))
    stats["u_neg_rejects"] = not pcd.verify(uvk, pred, one, q2)
    print("UNIVERSAL:", stats["u_base_verifies"],
          stats["u_step2_verifies"], stats["u_neg_rejects"], flush=True)
    _finish(stats, t_start, real,
            uni_only="--universal-only" in sys.argv)


def _finish(stats, t_start, real, uni_only):
    stats["total_s"] = round(time.time() - t_start, 1)
    if real:
        out = ("/root/repo/real_cycle_smoke_marlin_universal.json"
               if uni_only else "/root/repo/real_cycle_smoke_marlin.json")
    else:
        out = "/root/repo/marlin_chain_smoke.json"
    with open(out, "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
