"""Regenerate the bench.py proving-key checkpoint: real-cycle
mnt4_groth16 setup + pcd_pk_to_bytes into .bench_cache/ (~3 min warm)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate
    from pcd_tpu.utils.rng import ChaChaRng
    from pcd_tpu.utils.serialize import pcd_pk_to_bytes

    class Counter(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    t0 = time.time()
    pcd = configs.mnt4_groth16()
    pred = Counter(pcd.ic.main_field)
    rng = ChaChaRng(b"real cycle smoke v2 groth16")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    print(f"setup {time.time()-t0:.1f}s", flush=True)
    os.makedirs("/root/repo/.bench_cache", exist_ok=True)
    blob = pcd_pk_to_bytes(pcd, pk)
    with open("/root/repo/.bench_cache/pcd_mnt4_groth16_pk.bin", "wb") as f:
        f.write(blob)
    print(f"saved {len(blob)/1e6:.1f} MB, total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
