"""Time real-scale (MNT-298) MainCircuit synthesis vs witness-program
replay — the VERDICT round-2 item 1 'done' metric (replay <= 1 s)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from pcd_tpu import configs
from pcd_tpu.pcd.ec_cycle import MainCircuit
from pcd_tpu.r1cs.program import compile_witness_program
from pcd_tpu.r1cs.system import ConstraintSystem


def main():
    pcd = configs.mnt4_groth16()
    ic = pcd.ic

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

        def generate_constraints(self, cs, msg_var, witness_var,
                                 prior_msg_vars, base_case_bool):
            (prior_msg_vars[0] + witness_var).enforce_equal(msg_var)

    pred = Pred(ic.main_field)
    from pcd_tpu.utils.rng import ChaChaRng

    rng = ChaChaRng(b"time replay")
    crh_pp = ic.crh.setup(rng)

    circ = MainCircuit(ic, pred, crh_pp)

    t0 = time.time()
    cs = ConstraintSystem(ic.main_field)
    circ.generate_constraints(cs)
    t_synth = time.time() - t0
    print(f"synthesis: {t_synth:.2f}s  constraints={cs.num_constraints} "
          f"witnesses={cs.num_witness}")

    t0 = time.time()
    prog = compile_witness_program(cs)
    t_compile = time.time() - t0
    print(f"compile(+selfcheck replay): {t_compile:.2f}s  "
          f"ops={len(prog.ops)} ext={prog.num_ext}")

    ext = circ.external_inputs()
    assert ext == prog.record_ext, "flatten order mismatch"

    t0 = time.time()
    z = prog.run(ext)
    t_replay = time.time() - t0
    print(f"replay: {t_replay:.2f}s  ({t_synth / t_replay:.1f}x vs synthesis)")


if __name__ == "__main__":
    main()
