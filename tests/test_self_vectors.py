"""Self-golden serialization vectors (VERDICT r4 item 7): pin TODAY's
exact bytes for every consensus-critical layout against tomorrow's
refactor.  Vectors cover field elements, G1/G2 points (native +
ark-compat modes), CRH outputs (ChaCha20 generator derivation), and
toy-cycle Groth16 pk/vk/proof blobs.

Regenerate INTENTIONALLY with `python scripts/gen_self_vectors.py`
(a layout change is a breaking-format event and must be deliberate)."""

import hashlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "self_vectors", "vectors.json")


@pytest.mark.pcd_toy
def test_byte_layouts_pinned():
    assert os.path.exists(FIXTURE), \
        "missing fixture — run scripts/gen_self_vectors.py"
    with open(FIXTURE) as f:
        want = json.load(f)
    import gen_self_vectors as G

    got = G.build_vectors()
    assert sorted(got) == sorted(want), \
        (sorted(set(want) - set(got)), sorted(set(got) - set(want)))
    drift = []
    for name, data in got.items():
        w = want[name]
        if (len(data) != w["len"]
                or hashlib.sha256(data).hexdigest() != w["sha256"]):
            detail = ""
            if "hex" in w and len(data) <= 256:
                detail = f" want={w['hex'][:64]}.. got={data.hex()[:64]}.."
            drift.append(name + detail)
    assert not drift, "byte-layout drift in: " + "; ".join(drift)
