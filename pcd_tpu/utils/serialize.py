"""Canonical serialization for proofs and verifying keys (SURVEY.md D15;
role of ark-serialize).  PCD is itself checkpointable computation — any
(message, proof) pair is a resumable state (reference README.md:5) — so
proof/vk byte round-trips are the checkpoint/resume primitive.

Layouts (little-endian; field elements use the canonical 8*ceil(bits/64)
byte layout of pcd_tpu.fields.prime):
  G1/G2 point:  per-coordinate prime-subfield limbs, then 1 flag byte
                (0 = affine, 1 = infinity; infinity stores zero coords)
  proof/vk:     fixed field order per scheme, length-prefixed vectors
"""

from __future__ import annotations

import struct


def _write_point(out, pt):
    if pt.is_infinity():
        F = pt.curve.F
        zero = F.zero() if hasattr(F, "zero") else F.from_int(0)
        coords = zero.to_prime_coeffs() if hasattr(zero, "to_prime_coeffs") \
            else [zero]
        per = len(coords)
        blank = b"\x00" * (coords[0].BYTES if hasattr(coords[0], "BYTES")
                           else len(coords[0].to_bytes()))
        for _ in range(2 * per):
            out.append(blank)
        out.append(b"\x01")
        return
    for coord in (pt.x, pt.y):
        cs = coord.to_prime_coeffs() if hasattr(coord, "to_prime_coeffs") \
            else [coord]
        for c in cs:
            out.append(c.to_bytes())
    out.append(b"\x00")


def _read_point(curve, buf, off):
    F = curve.F
    prime = F.prime_subfield()
    deg = F.extension_degree_over_prime()
    nb = prime.BYTES
    coords = []
    for _ in range(2):
        cs = []
        for _ in range(deg):
            cs.append(prime.from_bytes(bytes(buf[off : off + nb])))
            off += nb
        coords.append(F.from_prime_coeffs(cs) if deg > 1 else cs[0])
    flag = buf[off]
    off += 1
    if flag == 1:
        return curve.infinity(), off
    return curve.point(coords[0], coords[1]), off


def _point_size(curve):
    F = curve.F
    prime = F.prime_subfield()
    return 2 * F.extension_degree_over_prime() * prime.BYTES + 1


# ---------------------------------------------------------------- Groth16
def groth16_proof_to_bytes(proof) -> bytes:
    out = []
    _write_point(out, proof.a)
    _write_point(out, proof.b)
    _write_point(out, proof.c)
    return b"".join(out)


def groth16_proof_from_bytes(cfg, data: bytes):
    from ..snark.groth16.native import Groth16Proof

    off = 0
    a, off = _read_point(cfg.g1, data, off)
    b, off = _read_point(cfg.g2, data, off)
    c, off = _read_point(cfg.g1, data, off)
    return Groth16Proof(a=a, b=b, c=c)


def groth16_vk_to_bytes(vk) -> bytes:
    out = []
    _write_point(out, vk.alpha_g1)
    _write_point(out, vk.beta_g2)
    _write_point(out, vk.gamma_g2)
    _write_point(out, vk.delta_g2)
    out.append(struct.pack("<I", len(vk.gamma_abc)))
    for p in vk.gamma_abc:
        _write_point(out, p)
    return b"".join(out)


def groth16_vk_from_bytes(cfg, data: bytes):
    from ..snark.groth16.native import Groth16VK

    off = 0
    alpha, off = _read_point(cfg.g1, data, off)
    beta, off = _read_point(cfg.g2, data, off)
    gamma, off = _read_point(cfg.g2, data, off)
    delta, off = _read_point(cfg.g2, data, off)
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    abc = []
    for _ in range(n):
        p, off = _read_point(cfg.g1, data, off)
        abc.append(p)
    return Groth16VK(alpha_g1=alpha, beta_g2=beta, gamma_g2=gamma,
                     delta_g2=delta, gamma_abc=abc)


# ---------------------------------------------------------------- GM17
def gm17_proof_to_bytes(proof) -> bytes:
    out = []
    _write_point(out, proof.a)
    _write_point(out, proof.b)
    _write_point(out, proof.c)
    return b"".join(out)


def gm17_proof_from_bytes(cfg, data: bytes):
    from ..snark.gm17.native import GM17Proof

    off = 0
    a, off = _read_point(cfg.g1, data, off)
    b, off = _read_point(cfg.g2, data, off)
    c, off = _read_point(cfg.g1, data, off)
    return GM17Proof(a=a, b=b, c=c)


def gm17_vk_to_bytes(vk) -> bytes:
    out = []
    _write_point(out, vk.alpha_g1)
    _write_point(out, vk.alpha_g2)
    _write_point(out, vk.gamma_g1)
    _write_point(out, vk.gamma_g2)
    _write_point(out, vk.delta_g2)
    out.append(struct.pack("<I", len(vk.query)))
    for p in vk.query:
        _write_point(out, p)
    return b"".join(out)


def gm17_vk_from_bytes(cfg, data: bytes):
    from ..snark.gm17.native import GM17VK

    off = 0
    a1, off = _read_point(cfg.g1, data, off)
    a2, off = _read_point(cfg.g2, data, off)
    g1, off = _read_point(cfg.g1, data, off)
    g2, off = _read_point(cfg.g2, data, off)
    d2, off = _read_point(cfg.g2, data, off)
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    q = []
    for _ in range(n):
        p, off = _read_point(cfg.g1, data, off)
        q.append(p)
    return GM17VK(alpha_g1=a1, alpha_g2=a2, gamma_g1=g1, gamma_g2=g2,
                  delta_g2=d2, query=q)


# ---------------------------------------------------------------- Marlin
_MARLIN_EVAL_ORDER = None


def _marlin_orders():
    from ..snark.marlin.native import _B1_POLYS, _B3_POLYS

    from ..snark.marlin.native import _R1_COMMS

    evs = list(_B1_POLYS) + list(_B3_POLYS) + [f"sigma_{n}" for n in "ABC"]
    comm1 = sorted(_R1_COMMS)
    comm3 = [f"g_3{n}" for n in "ABC"] + [f"h_3{n}" for n in "ABC"]
    return evs, comm1, comm3


def marlin_proof_to_bytes(proof, Fr) -> bytes:
    evs, comm1, comm3 = _marlin_orders()
    out = []
    for nm in sorted(comm1):
        _write_point(out, proof.comms1[nm].c)
    for nm in ("g_1", "h_1"):
        _write_point(out, proof.comms2[nm].c)
    _write_point(out, proof.comms2["g_1"].shifted)
    for nm in sorted(comm3):
        _write_point(out, proof.comms3[nm].c)
    for nm in [f"g_3{n}" for n in "ABC"]:
        _write_point(out, proof.comms3[nm].shifted)
    out.append(Fr.from_int(proof.sigma3).to_bytes())
    for nm in evs:
        out.append(Fr.from_int(proof.evals[nm]).to_bytes())
    _write_point(out, proof.pi1)
    _write_point(out, proof.pi3)
    return b"".join(out)


def marlin_proof_from_bytes(cfg, data: bytes):
    from ..snark.marlin.kzg import KZGCommitment
    from ..snark.marlin.native import MarlinProof

    Fr = cfg.Fr
    evs, comm1, comm3 = _marlin_orders()
    off = 0
    comms1 = {}
    for nm in sorted(comm1):
        p, off = _read_point(cfg.g1, data, off)
        comms1[nm] = KZGCommitment(c=p)
    g1c, off = _read_point(cfg.g1, data, off)
    h1c, off = _read_point(cfg.g1, data, off)
    g1s, off = _read_point(cfg.g1, data, off)
    comms2 = {"g_1": KZGCommitment(c=g1c, shifted=g1s),
              "h_1": KZGCommitment(c=h1c)}
    c3 = {}
    for nm in sorted(comm3):
        p, off = _read_point(cfg.g1, data, off)
        c3[nm] = KZGCommitment(c=p)
    for nm in [f"g_3{n}" for n in "ABC"]:
        p, off = _read_point(cfg.g1, data, off)
        c3[nm] = KZGCommitment(c=c3[nm].c, shifted=p)
    nb = Fr.BYTES
    sigma3 = Fr.from_bytes(bytes(data[off : off + nb])).n
    off += nb
    evals = {}
    for nm in evs:
        evals[nm] = Fr.from_bytes(bytes(data[off : off + nb])).n
        off += nb
    pi1, off = _read_point(cfg.g1, data, off)
    pi3, off = _read_point(cfg.g1, data, off)
    return MarlinProof(comms1=comms1, comms2=comms2, comms3=c3,
                       sigma3=sigma3, evals=evals, pi1=pi1, pi3=pi3)


# ---------------------------------------------------------------- PCD level
def pcd_proof_to_bytes(pcd, proof) -> bytes:
    """Serialize a PCD proof (= the help SNARK's proof)."""
    ic = pcd.ic
    help_cfg = ic.cycle.help
    name = type(proof).__name__
    if name == "Groth16Proof":
        return b"G16" + groth16_proof_to_bytes(proof)
    if name == "GM17Proof":
        return b"GM7" + gm17_proof_to_bytes(proof)
    if name == "MarlinProof":
        return b"MRL" + marlin_proof_to_bytes(proof, help_cfg.Fr)
    raise TypeError(name)


def pcd_proof_from_bytes(pcd, data: bytes):
    ic = pcd.ic
    help_cfg = ic.cycle.help
    tag, body = data[:3], data[3:]
    if tag == b"G16":
        return groth16_proof_from_bytes(help_cfg, body)
    if tag == b"GM7":
        return gm17_proof_from_bytes(help_cfg, body)
    if tag == b"MRL":
        return marlin_proof_from_bytes(help_cfg, body)
    raise ValueError(f"unknown proof tag {tag!r}")


def marlin_vk_to_bytes(vk) -> bytes:
    out = []
    for nm in sorted(vk.index_comms):
        _write_point(out, vk.index_comms[nm].c)
    _write_point(out, vk.srs_h)
    _write_point(out, vk.srs_tau_h)
    _write_point(out, vk.srs_g)
    out.append(struct.pack("<5Q", vk.n, vk.k_size, vk.input_size,
                           vk.num_instance, vk.max_degree))
    return b"".join(out)


def marlin_vk_from_bytes(cfg, data: bytes):
    from ..snark.marlin.kzg import KZGCommitment
    from ..snark.marlin.native import MarlinIndexVK

    names = sorted([f"{kind}_{m}" for kind in ("row", "col", "val")
                    for m in "ABC"])
    off = 0
    comms = {}
    for nm in names:
        p, off = _read_point(cfg.g1, data, off)
        comms[nm] = KZGCommitment(c=p)
    h, off = _read_point(cfg.g2, data, off)
    tau_h, off = _read_point(cfg.g2, data, off)
    g, off = _read_point(cfg.g1, data, off)
    n, k, hx, ninst, d = struct.unpack_from("<5Q", data, off)
    return MarlinIndexVK(index_comms=comms, n=n, k_size=k, input_size=hx,
                         num_instance=ninst, srs_h=h, srs_tau_h=tau_h,
                         srs_g=g, max_degree=d)


_SCHEME_SERIALIZERS = {
    "Groth16": (groth16_vk_to_bytes, groth16_vk_from_bytes,
                groth16_proof_to_bytes, groth16_proof_from_bytes),
    "GM17": (gm17_vk_to_bytes, gm17_vk_from_bytes,
             gm17_proof_to_bytes, gm17_proof_from_bytes),
    "MarlinSNARK": (marlin_vk_to_bytes, marlin_vk_from_bytes,
                    None, None),  # proof needs Fr: handled below
}


def snark_vk_to_bytes(snark, vk) -> bytes:
    name = type(snark).__name__
    return _SCHEME_SERIALIZERS[name][0](vk)


def snark_vk_from_bytes(snark, data: bytes):
    name = type(snark).__name__
    return _SCHEME_SERIALIZERS[name][1](snark.cfg, data)


def snark_proof_to_bytes(snark, proof) -> bytes:
    name = type(snark).__name__
    if name == "MarlinSNARK":
        return marlin_proof_to_bytes(proof, snark.cfg.Fr)
    return _SCHEME_SERIALIZERS[name][2](proof)


def snark_proof_from_bytes(snark, data: bytes):
    name = type(snark).__name__
    if name == "MarlinSNARK":
        return marlin_proof_from_bytes(snark.cfg, data)
    return _SCHEME_SERIALIZERS[name][3](snark.cfg, data)


# ------------------------------------------------- proving-key checkpoints
# Framework-internal format (the reference never persists keys; this is the
# checkpoint/resume subsystem for long-running deployments and the warm-IVC
# benchmark).  Device query tables serialize as raw u32 limb arrays so a
# load is a single jnp.asarray per coordinate.

def _write_query(out, q):
    import numpy as np

    from ..ops.fixed_base import DevicePointVec

    if isinstance(q, DevicePointVec):
        arrs = [np.asarray(a, dtype=np.uint32) for a in q.arrays]
        shape = arrs[0].shape
        out.append(b"\x01")
        out.append(struct.pack("<B", len(shape)))
        out.append(struct.pack("<" + "I" * len(shape), *shape))
        for a in arrs:
            out.append(a.tobytes())
    else:
        out.append(b"\x00")
        out.append(struct.pack("<I", len(q)))
        for p in q:
            _write_point(out, p)


def _read_query(curve, buf, off):
    import numpy as np

    from ..ops.fixed_base import DevicePointVec

    tag = buf[off]
    off += 1
    if tag == 1:
        import jax.numpy as jnp

        ndim = buf[off]
        off += 1
        shape = struct.unpack_from("<" + "I" * ndim, buf, off)
        off += 4 * ndim
        size = 4 * int(np.prod(shape))
        arrays = []
        for _ in range(3):
            a = np.frombuffer(buf[off : off + size],
                              dtype=np.uint32).reshape(shape)
            arrays.append(jnp.asarray(a))
            off += size
        return DevicePointVec(curve, tuple(arrays)), off
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = []
    for _ in range(n):
        p, off = _read_point(curve, buf, off)
        pts.append(p)
    return pts, off


def groth16_pk_to_bytes(pk) -> bytes:
    out = []
    out.append(groth16_vk_to_bytes(pk.vk))
    _write_point(out, pk.beta_g1)
    _write_point(out, pk.delta_g1)
    for q in (pk.a_query, pk.b_g1_query, pk.b_g2_query, pk.h_query,
              pk.l_query):
        qo = []
        _write_query(qo, q)
        blob = b"".join(qo)
        out.append(struct.pack("<Q", len(blob)))
        out.append(blob)
    out.append(struct.pack("<II", pk.num_instance, pk.domain_size))
    body = b"".join(out)
    # vk length prefix so from_bytes can split
    vk_len = len(groth16_vk_to_bytes(pk.vk))
    return struct.pack("<Q", vk_len) + body


def groth16_pk_from_bytes(cfg, data: bytes):
    from ..snark.groth16.native import Groth16PK

    (vk_len,) = struct.unpack_from("<Q", data, 0)
    off = 8
    vk = groth16_vk_from_bytes(cfg, data[off : off + vk_len])
    off += vk_len
    beta_g1, off = _read_point(cfg.g1, data, off)
    delta_g1, off = _read_point(cfg.g1, data, off)
    queries = []
    for curve in (cfg.g1, cfg.g1, cfg.g2, cfg.g1, cfg.g1):
        (blen,) = struct.unpack_from("<Q", data, off)
        off += 8
        q, _ = _read_query(curve, data[off : off + blen], 0)
        off += blen
        queries.append(q)
    n_inst, dom = struct.unpack_from("<II", data, off)
    return Groth16PK(vk=vk, beta_g1=beta_g1, delta_g1=delta_g1,
                     a_query=queries[0], b_g1_query=queries[1],
                     b_g2_query=queries[2], h_query=queries[3],
                     l_query=queries[4], num_instance=n_inst,
                     domain_size=dom)


def pcd_pk_to_bytes(pcd, pk) -> bytes:
    """ECCyclePCDPK checkpoint (Groth16/Groth16 configs)."""
    ic = pcd.ic
    assert type(ic.main_snark).__name__ == "Groth16" \
        and type(ic.help_snark).__name__ == "Groth16", \
        "pk checkpointing currently covers the Groth16 cycle configs"
    main_b = groth16_pk_to_bytes(pk.main_pk)
    help_b = groth16_pk_to_bytes(pk.help_pk)
    help_vk_b = groth16_vk_to_bytes(pk.help_vk)
    out = [struct.pack("<I", len(pk.crh_pp.seed)), pk.crh_pp.seed]
    for blob in (main_b, help_b, help_vk_b):
        out.append(struct.pack("<Q", len(blob)))
        out.append(blob)
    return b"".join(out)


def pcd_pk_from_bytes(pcd, data: bytes):
    from ..crh.api import CRHParams
    from ..pcd.ec_cycle import ECCyclePCDPK

    ic = pcd.ic
    (slen,) = struct.unpack_from("<I", data, 0)
    off = 4
    seed = bytes(data[off : off + slen])
    off += slen
    blobs = []
    for _ in range(3):
        (blen,) = struct.unpack_from("<Q", data, off)
        off += 8
        blobs.append(data[off : off + blen])
        off += blen
    main_pk = groth16_pk_from_bytes(ic.cycle.main, blobs[0])
    help_pk = groth16_pk_from_bytes(ic.cycle.help, blobs[1])
    help_vk = groth16_vk_from_bytes(ic.cycle.help, blobs[2])
    main_pvk = ic.main_snark.process_vk(main_pk.vk)
    return ECCyclePCDPK(crh_pp=CRHParams(seed=seed), main_pk=main_pk,
                        main_pvk=main_pvk, help_pk=help_pk, help_vk=help_vk)


# ------------------------------------------------- ark-serialize compat
# Compressed/uncompressed short-Weierstrass point layout matching
# ark-serialize (reference Cargo.toml:16 pin; vk/proof bytes are hashed at
# ec_cycle_pcd/mod.rs:123-141, so this layout is consensus-critical for
# cross-checking against future arkworks golden vectors):
#   - a base-field element is ceil((BITS + flag_bits)/8) little-endian
#     bytes; extension elements are c0..c_{d-1} in order
#   - SWFlags live in the top two bits of the LAST byte of the LAST
#     coefficient: bit 7 = positive-y (y > -y), bit 6 = infinity
#   - compressed = x with flags; uncompressed = x plain, then y with flags
#   - infinity serializes zero coordinates with the infinity flag
# The y-sign comparison for extension fields is lexicographic from the
# highest coefficient down (ark_ff's Ord on QuadExt/CubicExt compares c1
# resp. c2 first).  UNVERIFIED against vendored arkworks bytes (deps are
# not on disk — SURVEY.md L1 note); golden-vector tests can be dropped in
# without code changes.

_ARK_POSITIVE_Y = 1 << 7
_ARK_INFINITY = 1 << 6


def _ark_coeff_sizes(prime, flag_bits: int):
    plain = (prime.BITS + 7) // 8
    flagged = (prime.BITS + flag_bits + 7) // 8
    return plain, flagged


def _ark_write_field(out, elem, prime, deg, flags: int | None):
    """Append one (possibly extension) field element; `flags` goes into
    the final coefficient's final byte (None = no flag bits reserved)."""
    plain, flagged = _ark_coeff_sizes(prime, 2 if flags is not None else 0)
    coeffs = elem.to_prime_coeffs() if deg > 1 else [elem]
    for i, c in enumerate(coeffs):
        last = i == deg - 1
        size = flagged if (last and flags is not None) else plain
        b = bytearray(int(c.n).to_bytes(size, "little"))
        if last and flags is not None:
            b[-1] |= flags
        out.append(bytes(b))


def _ark_read_field(curve, buf, off, with_flags: bool):
    F = curve.F
    prime = F.prime_subfield()
    deg = F.extension_degree_over_prime()
    plain, flagged = _ark_coeff_sizes(prime, 2 if with_flags else 0)
    coeffs = []
    flags = 0
    for i in range(deg):
        last = i == deg - 1
        size = flagged if (last and with_flags) else plain
        raw = bytearray(buf[off : off + size])
        off += size
        if last and with_flags:
            flags = raw[-1] & (_ARK_POSITIVE_Y | _ARK_INFINITY)
            raw[-1] &= ~(_ARK_POSITIVE_Y | _ARK_INFINITY) & 0xFF
        n = int.from_bytes(raw, "little")
        if n >= prime.MODULUS:
            raise ValueError("ark point coefficient >= modulus")
        coeffs.append(prime.from_int(n))
    elem = F.from_prime_coeffs(coeffs) if deg > 1 else coeffs[0]
    return elem, flags, off


def _ark_y_is_positive(y) -> bool:
    """arkworks' from_y_sign(y > -y): lexicographic compare, highest
    extension coefficient first."""
    ny = -y
    if hasattr(y, "to_prime_coeffs"):
        a = tuple(int(c.n) for c in reversed(y.to_prime_coeffs()))
        b = tuple(int(c.n) for c in reversed(ny.to_prime_coeffs()))
        return a > b
    return int(y.n) > int(ny.n)


def ark_point_size(curve, compressed: bool = True) -> int:
    prime = curve.F.prime_subfield()
    deg = curve.F.extension_degree_over_prime()
    plain, flagged = _ark_coeff_sizes(prime, 2)
    one = (deg - 1) * plain + flagged
    return one if compressed else (deg * plain + one)


def ark_point_to_bytes(pt, compressed: bool = True) -> bytes:
    curve = pt.curve
    F = curve.F
    prime = F.prime_subfield()
    deg = F.extension_degree_over_prime()
    out = []
    if pt.is_infinity():
        zero = F.from_int(0) if deg == 1 else F.zero()
        if compressed:
            _ark_write_field(out, zero, prime, deg, _ARK_INFINITY)
        else:
            _ark_write_field(out, zero, prime, deg, None)
            _ark_write_field(out, zero, prime, deg, _ARK_INFINITY)
        return b"".join(out)
    sign = _ARK_POSITIVE_Y if _ark_y_is_positive(pt.y) else 0
    if compressed:
        _ark_write_field(out, pt.x, prime, deg, sign)
    else:
        _ark_write_field(out, pt.x, prime, deg, None)
        _ark_write_field(out, pt.y, prime, deg, sign)
    return b"".join(out)


def ark_point_from_bytes(curve, data, compressed: bool = True, off: int = 0):
    """Parse one point; returns (point, next_offset).  Compressed points
    recover y from the curve equation and the sign flag; all points are
    curve-checked (unlike new_verification_key_unchecked in the reference,
    data_structures.rs:153-162 — deserialization here always validates)."""
    if compressed:
        x, flags, off = _ark_read_field(curve, data, off, True)
        if flags & _ARK_INFINITY:
            return curve.infinity(), off
        rhs = x * x * x + curve.a * x + curve.b
        y = rhs.sqrt()
        if y is None:
            raise ValueError("ark point x has no corresponding y")
        want_pos = bool(flags & _ARK_POSITIVE_Y)
        if _ark_y_is_positive(y) != want_pos:
            y = -y
        return curve.point(x, y), off
    x, _, off = _ark_read_field(curve, data, off, False)
    y, flags, off = _ark_read_field(curve, data, off, True)
    if flags & _ARK_INFINITY:
        return curve.infinity(), off
    pos = bool(flags & _ARK_POSITIVE_Y)
    if _ark_y_is_positive(y) != pos:
        raise ValueError("ark point y-sign flag inconsistent with y")
    return curve.point(x, y), off
