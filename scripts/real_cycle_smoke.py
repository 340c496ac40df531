"""Real-cycle (MNT4-298/MNT6-298) mnt4_groth16 PCD smoke run — the
reference's CI-equivalent base case (tests/mnt4_groth16.rs:84-87 under
cfg(ci)) plus, when --full is given, a step-2 recursive proof.

Records timings + constraint counts (establishing BASELINE.md's
"to be measured" table).  Runs on the real TPU by default.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate
    from pcd_tpu.r1cs.system import ConstraintSystem
    from pcd_tpu.pcd.ec_cycle import MainCircuit, HelpCircuit
    from pcd_tpu.utils.rng import ChaChaRng

    class Counter(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    from pcd_tpu.utils import profiling

    profiling.enable()
    t_start = time.time()
    pcd = configs.mnt4_groth16()
    F = pcd.ic.main_field
    pred = Counter(F)
    rng = ChaChaRng(b"real cycle smoke v1")
    stats = {}

    def mark(name, t0):
        dt = time.time() - t0
        stats[name] = round(dt, 1)
        print(f"[{time.time()-t_start:8.1f}s] {name}: {dt:.1f}s", flush=True)
        return time.time()

    # 1. measure circuit sizes first
    t0 = time.time()
    crh_pp = pcd.ic.crh.setup(ChaChaRng(b"sizing"))
    cs = ConstraintSystem(F)
    MainCircuit(pcd.ic, pred, crh_pp).generate_constraints(cs)
    stats["main_constraints"] = cs.num_constraints
    stats["main_vars"] = cs.num_instance + cs.num_witness
    print(f"MainCircuit: {cs.num_constraints} constraints, "
          f"{cs.num_instance} instance, {cs.num_witness} witness", flush=True)
    t0 = mark("main_synthesis", t0)

    # 2. full setup
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    t0 = mark("setup", t0)

    # help circuit size (synthesized during setup; re-measure cheaply)
    cs2 = ConstraintSystem(pcd.ic.help_field)
    HelpCircuit(pcd.ic, pk.main_pvk).generate_constraints(cs2)
    stats["help_constraints"] = cs2.num_constraints
    print(f"HelpCircuit: {cs2.num_constraints} constraints", flush=True)
    t0 = time.time()

    # 3. base-case prove + verify
    one = F.from_int(1)
    proof_1 = pcd.prove(pk, pred, one, one, [], [], rng)
    t0 = mark("prove_base", t0)
    ok = pcd.verify(vk, pred, one, proof_1)
    t0 = mark("verify", t0)
    stats["base_verifies"] = bool(ok)
    print("BASE CASE VERIFIES:", ok, flush=True)

    if "--full" in sys.argv:
        two = F.from_int(2)
        proof_2 = pcd.prove(pk, pred, two, one, [one], [proof_1], rng)
        t0 = mark("prove_step2", t0)
        ok2 = pcd.verify(vk, pred, two, proof_2)
        stats["step2_verifies"] = bool(ok2)
        print("STEP 2 VERIFIES:", ok2, flush=True)
        stats["neg_check_rejects"] = not pcd.verify(vk, pred, one, proof_2)
        print("NEG CHECK REJECTS:", stats["neg_check_rejects"], flush=True)

    stats["total_s"] = round(time.time() - t_start, 1)
    print(profiling.profile_report(min_seconds=0.5), flush=True)
    with open("/root/repo/real_cycle_smoke.json", "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
