"""arkworks golden-vector loader (VERDICT r3 item 7).

Consumes tests/fixtures/ark_vectors/*.json — records produced by a real
arkworks toolchain (see the fixture README for the generator snippet) —
and checks our ark-serialize-compatible codecs byte-for-byte.  Skips
cleanly while the directory holds no vectors (the deps are not vendored
in this image); the synthetic self-vector tests below exercise the SAME
loader/checker code paths so dropping real vectors in requires no code
changes.  Reference: ec_cycle_pcd/mod.rs:123-141 (vk/proof bytes are
CRH inputs, so the layout is consensus-critical).
"""

import glob
import json
import os

import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.utils.serialize import ark_point_from_bytes, ark_point_to_bytes

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "ark_vectors")


def _curves():
    m4 = M.mnt4_298()
    m6 = M.mnt6_298()
    return {
        "mnt4_298_g1": (m4.g1, m4.g1_gen),
        "mnt4_298_g2": (m4.g2, m4.g2_gen),
        "mnt6_298_g1": (m6.g1, m6.g1_gen),
        "mnt6_298_g2": (m6.g2, m6.g2_gen),
    }


def _coord_to_hexes(e):
    if hasattr(e, "to_prime_coeffs"):
        return [hex(int(c.n)) for c in e.to_prime_coeffs()]
    return hex(int(e.n))


def _check_sw_point(rec, curves):
    curve, _ = curves[rec["curve"]]
    data = bytes.fromhex(rec["bytes_hex"])
    pt, off = ark_point_from_bytes(curve, data,
                                   compressed=rec["compressed"])
    assert off == len(data)
    if rec.get("infinity"):
        assert pt.is_infinity(), rec
    else:
        assert hex_eq(_coord_to_hexes(pt.x), rec["x"])
        assert hex_eq(_coord_to_hexes(pt.y), rec["y"])
    # round-trip: our serializer must reproduce the exact bytes
    assert ark_point_to_bytes(pt, compressed=rec["compressed"]) == data


def hex_eq(a, b):
    norm = lambda v: (int(v, 16) if isinstance(v, str)
                      else [int(x, 16) for x in v])
    return norm(a) == norm(b)


def _vector_files():
    return sorted(glob.glob(os.path.join(FIXDIR, "*.json")))


def test_golden_vectors_present_or_skip():
    files = _vector_files()
    if not files:
        pytest.skip("no arkworks golden vectors dropped in yet "
                    "(tests/fixtures/ark_vectors/*.json)")
    curves = _curves()
    n = 0
    for f in files:
        with open(f) as fh:
            for rec in json.load(fh):
                if rec["kind"] == "sw_point":
                    _check_sw_point(rec, curves)
                    n += 1
    assert n > 0


@pytest.mark.parametrize("name", ["mnt4_298_g1", "mnt4_298_g2"])
@pytest.mark.parametrize("compressed", [True, False])
def test_self_vectors(name, compressed):
    """Synthetic vectors through the same record checker: proves the
    loader works end-to-end today, so real vectors are drop-in."""
    curves = _curves()
    curve, gen = curves[name]
    for k, pt in ((1, gen), (7, gen * 7), (0, curve.infinity())):
        rec = {
            "kind": "sw_point",
            "curve": name,
            "compressed": compressed,
            "bytes_hex": ark_point_to_bytes(pt, compressed=compressed).hex(),
            "infinity": pt.is_infinity(),
        }
        if not pt.is_infinity():
            rec["x"] = _coord_to_hexes(pt.x)
            rec["y"] = _coord_to_hexes(pt.y)
        _check_sw_point(rec, curves)
