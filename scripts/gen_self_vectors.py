"""Generate SELF-golden serialization vectors (VERDICT r4 item 7).

Real arkworks vectors remain structurally blocked on this machine (no
vendored arkworks deps, no Rust toolchain — tests/fixtures/ark_vectors/
README.md), so this pins the repo's OWN byte layouts instead: field
elements, G1/G2 points (native + ark-compat modes, compressed and
uncompressed), CRH outputs, and toy-cycle Groth16 vk/proof/pk blobs.
Consensus-critical bytes (SURVEY.md D15/D16) previously had roundtrip
tests only; this makes any layout drift an immediate test failure.

Usage:  python scripts/gen_self_vectors.py          # writes the fixture
The pin test (tests/test_self_vectors.py) recomputes every vector and
compares against tests/fixtures/self_vectors/vectors.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "self_vectors",
    "vectors.json")

_HEX_MAX = 256   # store raw hex for small vectors (drift diagnosis)


def _entry(data: bytes) -> dict:
    e = {"len": len(data), "sha256": hashlib.sha256(data).hexdigest()}
    if len(data) <= _HEX_MAX:
        e["hex"] = data.hex()
    return e


def build_vectors() -> dict:
    """name -> bytes, all derived deterministically (fixed seeds)."""
    from pcd_tpu.curves import models as M
    from pcd_tpu.utils.rng import ChaChaRng
    from pcd_tpu.utils import serialize as S

    out = {}

    # -- field elements: canonical to_bytes (LE limb layout) -------------
    for name, cfg in (("mnt4", M.mnt4_298()), ("mnt6", M.mnt6_298()),
                      ("toy4", M.toy_mnt4())):
        for fname in ("Fq", "Fr"):
            F = getattr(cfg, fname)
            v = F.from_int(3)
            acc = b""
            for _ in range(4):
                v = v * v + F.from_int(1)
                acc += v.to_bytes()
            out[f"field/{name}.{fname}"] = acc

    # -- curve points: native layout + ark-compat modes ------------------
    for name, cfg in (("mnt4", M.mnt4_298()), ("mnt6", M.mnt6_298())):
        for gname in ("g1", "g2"):
            gen = getattr(cfg, gname + "_gen")
            pt = gen * 0x1234567
            buf = []
            S._write_point(buf, pt)
            S._write_point(buf, gen.curve.infinity())
            out[f"point/{name}.{gname}.native"] = b"".join(buf)
            out[f"point/{name}.{gname}.ark_comp"] = (
                S.ark_point_to_bytes(pt, compressed=True)
                + S.ark_point_to_bytes(gen.curve.infinity(), compressed=True))
            out[f"point/{name}.{gname}.ark_uncomp"] = \
                S.ark_point_to_bytes(pt, compressed=False)

    # -- CRH outputs (generator derivation pins the ChaCha20 stream + TE
    # point sampling, D16) ------------------------------------------------
    from pcd_tpu.crh.bowe_hopwood import BoweHopwoodCRH
    from pcd_tpu.crh.pedersen import PedersenCRH, PedersenCRHCompressor

    te = M.ed_on_mnt4_298()
    msg = bytes(range(64))
    for cname, crh in (("bowe_hopwood", BoweHopwoodCRH(te)),
                       ("pedersen", PedersenCRH(te)),
                       ("pedersen_compressor", PedersenCRHCompressor(te))):
        pp = crh.setup(ChaChaRng(b"self-vector crh seed"))
        h = crh.evaluate(pp, msg)
        out[f"crh/{cname}"] = crh.output_to_bytes(h)

    # -- toy-cycle Groth16: vk / proof / pk blobs -------------------------
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate

    class Pred(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = Pred(F)
    rng = ChaChaRng(b"self-vector pcd seed")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    one = F.from_int(1)
    proof = pcd.prove(pk, pred, one, one, [], [], rng)
    assert pcd.verify(vk, pred, one, proof)
    out["pcd/toy_groth16.vk"] = S.snark_vk_to_bytes(pcd.ic.help_snark,
                                                    vk.help_vk)
    out["pcd/toy_groth16.proof"] = S.pcd_proof_to_bytes(pcd, proof)
    out["pcd/toy_groth16.pk"] = S.pcd_pk_to_bytes(pcd, pk)
    return out


def main():
    vecs = build_vectors()
    obj = {k: _entry(v) for k, v in sorted(vecs.items())}
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    print(f"wrote {len(obj)} vectors -> {FIXTURE}")


if __name__ == "__main__":
    main()
