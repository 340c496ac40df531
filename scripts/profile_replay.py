"""Profile the witness-program replay interpreter at real MNT-298 scale:
op histogram, LC-term totals, cProfile of run() — drives the optimization
of r1cs/program.py toward the <=1 s replay target."""

import cProfile
import io
import os
import pstats
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from pcd_tpu import configs
from pcd_tpu.pcd.ec_cycle import MainCircuit
from pcd_tpu.r1cs import program as prog_mod
from pcd_tpu.r1cs.program import compile_witness_program
from pcd_tpu.r1cs.system import ConstraintSystem


class Pred:
    PRIOR_MSG_LEN = 1

    def __init__(self, F):
        self.F = F

    def default_message(self):
        return self.F.zero()

    default_witness = default_message

    def new_message_var(self, cs, msg):
        from pcd_tpu.gadgets.fp import fpvar_class

        return fpvar_class(cs).new_witness(msg)

    new_witness_var = new_message_var

    def message_var_to_bytes(self, v):
        return v.to_bytes()

    def flatten_message(self, m):
        return [m.n if hasattr(m, "n") else int(m)]

    flatten_witness = flatten_message

    def generate_constraints(self, cs, msg, wit, priors, base):
        (priors[0] + wit).enforce_equal(msg)


OPNAMES = {0: "MUL_VV", 1: "MUL_VG", 2: "MUL_GG", 3: "INV_V", 4: "INV_G",
           5: "BITS_V", 6: "BITS_G", 7: "ISZERO", 8: "INV0", 9: "HINT",
           10: "LC"}


def main():
    pcd = configs.mnt4_groth16()
    ic = pcd.ic
    pred = Pred(ic.main_field)
    from pcd_tpu.utils.rng import ChaChaRng

    rng = ChaChaRng(b"profile replay")
    crh_pp = ic.crh.setup(rng)
    circ = MainCircuit(ic, pred, crh_pp)

    t0 = time.time()
    cs = ConstraintSystem(ic.main_field)
    circ.generate_constraints(cs)
    print(f"synthesis {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    prog = compile_witness_program(cs)
    print(f"compile {time.time()-t0:.1f}s", flush=True)

    hist = Counter()
    lc_terms = Counter()
    nbits = 0
    for e in prog.ops:
        nm = OPNAMES[e[0]]
        hist[nm] += 1
        if nm in ("MUL_VG", "INV_G", "ISZERO", "INV0", "LC"):
            lc_terms[nm] += len(e[2][0]) if nm != "MUL_VG" else len(e[3][0])
        elif nm == "MUL_GG":
            lc_terms[nm] += len(e[2][0]) + len(e[3][0])
        elif nm == "BITS_G":
            lc_terms[nm] += len(e[4][0])
            nbits += e[2]
        elif nm == "BITS_V":
            nbits += e[2]
    print("op histogram:", dict(hist))
    print("LC terms by op:", dict(lc_terms))
    print("total bits produced:", nbits)
    print("hint groups:", len(prog.hints),
          "hint input lcs terms:",
          sum(len(lc[0]) for _, lcs in prog.hints for lc in lcs))

    ext = circ.external_inputs()
    t0 = time.time()
    z = prog.run(ext)
    print(f"replay {time.time()-t0:.2f}s", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    prog.run(ext)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(15)
    print(s.getvalue())


if __name__ == "__main__":
    main()
