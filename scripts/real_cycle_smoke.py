"""Real-cycle (MNT4-298/MNT6-298) PCD smoke runs — the reference's
integration tests at production parameters (tests/mnt4_groth16.rs:77-121,
mnt4_gm17.rs:78-117, mnt4_mix_*.rs): base case + recursive step 2 +
negative check, per config.

Usage:
  python scripts/real_cycle_smoke.py [--config groth16|gm17|mix_g16gm17|
                                      mix_gm17g16] [--full] [--save-pk]

Artifacts: real_cycle_smoke_<config>.json (plus the historical
real_cycle_smoke.json name for groth16), and with --save-pk a proving-key
checkpoint in .bench_cache/ that bench.py uses for the warm-IVC metric.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIGS = {
    "groth16": "mnt4_groth16",
    "gm17": "mnt4_gm17",
    "mix_g16gm17": "mnt4_mix_groth16_gm17",
    "mix_gm17g16": "mnt4_mix_gm17_groth16",
}


def main():
    if "--cpu" in sys.argv:
        # host run: the auto backend stays on the Python/C++ host tier
        # (the pcd_tpu/native Pippenger+NTT make real scale feasible on
        # CPU; device init can hang when the TPU tunnel is down).  Must
        # go through jax.config — axon overrides the env var at import.
        import jax

        jax.config.update("jax_platforms", "cpu")
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate
    from pcd_tpu.pcd.ec_cycle import HelpCircuit, MainCircuit
    from pcd_tpu.r1cs.system import ConstraintSystem
    from pcd_tpu.utils.rng import ChaChaRng

    which = "groth16"
    for i, a in enumerate(sys.argv):
        if a == "--config" and i + 1 < len(sys.argv):
            which = sys.argv[i + 1]
    factory = getattr(configs, CONFIGS[which])

    class Counter(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    from pcd_tpu.utils import profiling

    profiling.enable()
    t_start = time.time()
    pcd = factory()
    F = pcd.ic.main_field
    pred = Counter(F)
    rng = ChaChaRng(b"real cycle smoke v2 " + which.encode())
    stats = {"config": which}

    def mark(name, t0):
        dt = time.time() - t0
        stats[name] = round(dt, 1)
        print(f"[{time.time()-t_start:8.1f}s] {name}: {dt:.1f}s", flush=True)
        return time.time()

    # 1. circuit sizes
    t0 = time.time()
    crh_pp = pcd.ic.crh.setup(ChaChaRng(b"sizing"))
    cs = ConstraintSystem(F)
    MainCircuit(pcd.ic, pred, crh_pp).generate_constraints(cs)
    stats["main_constraints"] = cs.num_constraints
    stats["main_vars"] = cs.num_instance + cs.num_witness
    print(f"MainCircuit[{which}]: {cs.num_constraints} constraints, "
          f"{cs.num_instance} instance, {cs.num_witness} witness", flush=True)
    t0 = mark("main_synthesis", t0)

    # 2. full setup
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    t0 = mark("setup", t0)

    if "--save-pk" in sys.argv and which == "groth16":
        from pcd_tpu.utils.serialize import pcd_pk_to_bytes

        os.makedirs("/root/repo/.bench_cache", exist_ok=True)
        blob = pcd_pk_to_bytes(pcd, pk)
        with open("/root/repo/.bench_cache/pcd_mnt4_groth16_pk.bin",
                  "wb") as f:
            f.write(blob)
        stats["pk_checkpoint_mb"] = round(len(blob) / 1e6, 1)
        t0 = mark("save_pk", t0)

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
        # warm step: replays the recorded witness program, all caches hot
        three = F.from_int(3)
        t0 = time.time()
        proof_3 = pcd.prove(pk, pred, three, one, [two], [proof_2], rng)
        t0 = mark("prove_step3_warm", t0)
        stats["step3_verifies"] = bool(pcd.verify(vk, pred, three, proof_3))

    stats["total_s"] = round(time.time() - t_start, 1)
    print(profiling.profile_report(min_seconds=0.5), flush=True)
    out = f"/root/repo/real_cycle_smoke_{which}.json"
    with open(out, "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
