"""Derive constants not recoverable from the (non-vendored) reference deps:

1. A complete twisted Edwards curve over MNT4-298's Fr (filling the role of
   `ark-ed-on-mnt4-298`, reference Cargo.toml:31) via CM class-number-1
   construction: 4p = t^2 + D s^2 gives candidate orders p+1±t; pick one of
   the form {4,8}*prime, build the curve from the known j-invariant, convert
   SW -> Montgomery -> complete TE.  Every output is order-verified.
2. G2 generators + cofactors for MNT4-298 / MNT6-298.
3. A toy MNT4/MNT6 cycle (~28-bit) for fast tests + its own TE curve.

Deterministic (fixed seeds). Writes fragments to stdout; progress to stderr.
"""

import math
import random
import sys

sys.path.insert(0, "/root/repo")

from pcd_tpu.fields.prime import make_prime_field
from pcd_tpu.fields.tower import make_ext_field
from pcd_tpu.curves.short_weierstrass import SWCurve
from pcd_tpu.curves.twisted_edwards import TECurve


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def is_prime(n, k=40, _r=random.Random(1)):
    if n < 2:
        return False
    for p in [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(k):
        a = _r.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def cornacchia_4p(p, D):
    """Solve 4p = t^2 + D s^2; return (t, s) or None."""
    # need -D to be a QR mod p
    Fp = make_prime_field(p, f"F_{p % 100000}")
    rt = Fp.from_int(-D % p).sqrt()
    if rt is None:
        return None
    for x0 in (rt.n, p - rt.n):
        # lift to sqrt of -D mod 4p with right parity: want t ≡ x0', use
        # standard cornacchia on 4p: find x ≡ sqrt(-D) mod p, adjust parity
        for cand in (x0, x0 + p, 2 * p - x0, p - x0):
            if (cand * cand + D) % (4 * p) != 0:
                continue
            a, b = 4 * p, cand
            lim = math.isqrt(4 * p)
            while b > lim:
                a, b = b, a % b
            t = b
            rem = 4 * p - t * t
            if rem % D:
                continue
            s2 = rem // D
            s = math.isqrt(s2)
            if s * s == s2:
                return t, s
    return None


CM_JS = {3: 0, 4: 1728, 7: -3375, 8: 8000, 11: -32768,
         19: -884736, 43: -884736000, 67: -147197952000,
         163: -262537412640768000}


def find_4l_order(p, max_cof_bits=48):
    """Search CM class-number-1 candidate orders for one of form cof*prime
    with 4 | N and a smooth cofactor (smallest cofactor preferred).
    Returns list of (D, N, cofactor, ell)."""
    out = []
    for D in CM_JS:
        ts = cornacchia_4p(p, D)
        if ts is None:
            continue
        t, s = ts
        traces = {t, -t}
        if D == 3:  # sextic twists include half traces when integral
            for tt in (t + 3 * s, t - 3 * s, -(t + 3 * s), -(t - 3 * s)):
                if tt % 2 == 0:
                    traces.add(tt // 2)
        if D == 4:  # quartic twists
            traces.update({2 * s, -2 * s})
        for tr in sorted(traces):
            N = p + 1 - tr
            if N % 4:
                continue
            cof, rem = N, 1
            # strip small primes
            m, c = N, 1
            d = 2
            while d < 100000 and d * d <= m:
                while m % d == 0:
                    m //= d
                    c *= d
                d += 1 if d == 2 else 2
            if m > 1 and is_prime(m) and c.bit_length() <= max_cof_bits and c % 4 == 0:
                log(f"  D={D}: N = {c} * prime(~2^{m.bit_length()})")
                out.append((D, N, c, m))
    out.sort(key=lambda x: x[2])
    return out


def find_root_cubic(Fp, a, b):
    """A root of x^3 + a x + b in Fp, or None. Computes gcd(x^p - x, f)."""
    # polynomial arithmetic mod f, coefficients little-endian lists
    def pmulmod(u, v, f):
        res = [Fp.zero()] * (len(u) + len(v) - 1)
        for i, ui in enumerate(u):
            if ui.is_zero():
                continue
            for j, vj in enumerate(v):
                res[i + j] = res[i + j] + ui * vj
        # reduce by monic cubic f (x^3 = -(a x + b) ... general: f = x^3+ax+b)
        while len(res) > 3:
            top = res.pop()
            d = len(res) - 3  # degree of multiplier
            # x^(3+d) = x^d * (-(a x + b))
            res[d + 1] = res[d + 1] - top * a
            res[d] = res[d] - top * b
        while len(res) < 3:
            res.append(Fp.zero())
        return res

    f = [b, a, Fp.one(), ]  # + x^3 implicit (monic)
    # compute x^p mod f by square and multiply
    xp = [Fp.zero(), Fp.one(), Fp.zero()]  # x
    result = [Fp.one(), Fp.zero(), Fp.zero()]
    e = Fp.MODULUS
    base = xp
    while e:
        if e & 1:
            result = pmulmod(result, base, f)
        base = pmulmod(base, base, f)
        e >>= 1
    # g = gcd(x^p - x, f): x^p-x mod f = result - x
    g = list(result)
    g[1] = g[1] - Fp.one()
    # gcd of g (deg<=2) with cubic f — do Euclid on polys
    def pdeg(u):
        d = len(u) - 1
        while d >= 0 and u[d].is_zero():
            d -= 1
        return d

    def pmod(u, v):
        u = list(u)
        dv = pdeg(v)
        inv_lead = v[dv].inv()
        while pdeg(u) >= dv and pdeg(u) >= 0:
            du = pdeg(u)
            c = u[du] * inv_lead
            for i in range(dv + 1):
                u[du - dv + i] = u[du - dv + i] - c * v[i]
        return u[: max(pdeg(u) + 1, 1)]

    A = [b, a, Fp.zero(), Fp.one()]  # full cubic
    B = g
    while pdeg(B) > 0:
        A, B = B, pmod(A, B)
    if pdeg(B) == 0 and not B[0].is_zero():
        return None  # gcd = 1, no roots
    # A is now the gcd (degree >= 1): find a root of A
    dA = pdeg(A)
    if dA == 1:
        return -(A[0] / A[1])
    if dA == 2:
        # quadratic formula
        aa, bb, cc = A[2], A[1], A[0]
        disc = bb * bb - Fp.from_int(4) * aa * cc
        sq = disc.sqrt()
        if sq is None:
            return None
        return (-bb + sq) / (aa * Fp.from_int(2))
    # dA == 3: fully split; just try quadratic after removing one root via
    # trial: all roots of the cubic — find one by random evaluation gcd trick
    # (rare path): brute via factor x^((p-1)/2)... fallback: try small x
    for xi in range(1, 10000):
        x = Fp.from_int(xi)
        if (x * x * x + a * x + b).is_zero():
            return x
    return None


def curve_from_cm(Fp, D, N, rng):
    """Curve y^2=x^3+ax+b over Fp with order exactly N, via known j-invariant.
    Iterates twists; verifies with sample points."""
    j = CM_JS[D]

    def order_is(E, N):
        for _ in range(3):
            P = E.rand_point(rng)
            if not (P * N).is_infinity():
                return False
        return True

    tries = 0
    while True:
        tries += 1
        c = Fp.rand(rng)
        if c.is_zero():
            continue
        if D == 3:
            a, b = Fp.zero(), c
        elif D == 4:
            a, b = c, Fp.zero()
        else:
            jf = Fp.from_int(j % Fp.MODULUS)
            k = jf / (Fp.from_int(1728) - jf)
            a = Fp.from_int(3) * k * c * c
            b = Fp.from_int(2) * k * c * c * c
        E = SWCurve(Fp, a, b, order=N, cofactor=1, name="cm")
        P = None
        for _ in range(60):
            P = E.lift_x(Fp.rand(rng))
            if P is not None:
                break
        if P is None:
            continue
        if (P * N).is_infinity() and order_is(E, N):
            log(f"  curve found after {tries} twists")
            return E


def sw_to_complete_te(E, N, cof, rng):
    """Short-Weierstrass (order N = cof*ell, 4|N) -> complete TE curve.
    Returns (a, d, ell, cof, gx, gy) as ints, or None."""
    Fp = E.F
    x0 = find_root_cubic(Fp, E.a, E.b)
    if x0 is None:
        return None
    c2 = x0 * Fp.from_int(3)
    c4 = x0 * x0 * Fp.from_int(3) + E.a
    if c4.is_zero() or not c4.is_square():
        return None
    for sgn in (1, -1):
        s = c4.sqrt()
        if sgn < 0:
            s = -s
        A = c2 / s
        B = s
        a_te = (A + Fp.from_int(2)) / B
        d_te = (A - Fp.from_int(2)) / B
        if a_te.is_zero() or d_te.is_zero():
            continue
        if not a_te.is_square() or d_te.is_square():
            continue
        # scale a to 1? keep as-is (complete already). Build curve, map gen.
        ell = N // cof
        te = TECurve(Fp, a_te, d_te, order=ell, cofactor=cof, name="te")
        # map a random SW point: (x,y) -> X=(x-x0)/s, Y=y/s^2 -> TE
        for _ in range(60):
            P = E.rand_point(rng)
            X = (P.x - x0) / s
            Y = P.y / (s * s)
            if Y.is_zero() or (X + Fp.one()).is_zero():
                continue
            xe = X / Y
            ye = (X - Fp.one()) / (X + Fp.one())
            pt = TEPointCheck(te, xe, ye)
            if pt is None:
                continue
            g = pt * cof
            if g.is_identity():
                continue
            assert (g * ell).is_identity()
            return a_te.n, d_te.n, ell, cof, g.x.n, g.y.n
    return None


def TEPointCheck(te, x, y):
    from pcd_tpu.curves.twisted_edwards import TEPoint

    p = TEPoint(te, x, y)
    return p if p.is_on_curve() else None


# =================================================================
R4 = 475922286169261325753349249653048451545124878552823515553267735739164647307408490559963137
Q4 = 475922286169261325753349249653048451545124878552823515553267735739164647307408490559963137
# NOTE: fix distinct values below (Q4 is the *other* prime)
Q4 = 475922286169261325753349249653048451545124879242694725395555128576210262817955800483758081
B4_INT = 423894536526684178289416011533888240029318103673896002803341544124054745019340795360841685
B6_INT = 106700080510851735677967319632585352256454251201367587890185989362936000262606668469523074

rng = random.Random(20240817)

if "--stage" in sys.argv:
    stage = sys.argv[sys.argv.index("--stage") + 1]
else:
    stage = "all"

if stage in ("all", "te"):
    log("=== stage 1: TE curve over MNT4.Fr ===")
    Fr4 = make_prime_field(R4, "Fr4")
    cands = find_4l_order(R4)
    assert cands, "no 4l/8l CM order found over Fr4 — widen search"
    D, N, cof, ell = cands[0]
    log(f"using D={D} cof={cof}")
    E = curve_from_cm(Fr4, D, N, rng)
    res = None
    while res is None:
        res = sw_to_complete_te(E, N, cof, rng)
        if res is None:
            log("  TE conversion failed (completeness/2-torsion); next curve")
            E = curve_from_cm(Fr4, D, N, rng)
    a, d, ell, cof, gx, gy = res
    print(f"# derived TE curve over MNT4.Fr (CM D={D}); complete (a sq, d nonsq)")
    print(f"ED_MNT4_A = {a}")
    print(f"ED_MNT4_D = {d}")
    print(f"ED_MNT4_ORDER = {ell}")
    print(f"ED_MNT4_COFACTOR = {cof}")
    print(f"ED_MNT4_G = ({gx}, {gy})")
    sys.stdout.flush()

if stage in ("all", "g2"):
    log("=== stage 2: G2 generators ===")
    Fq4 = make_prime_field(Q4, "Fq4mnt4")
    Fq4_2 = make_ext_field(Fq4, 2, 17, "Fq4sq")
    t4 = Q4 + 1 - R4
    t4_2 = t4 * t4 - 2 * Q4
    n_twist4 = Q4 * Q4 + 1 + t4_2
    assert n_twist4 % R4 == 0
    cof4_g2 = n_twist4 // R4
    A4_TW = Fq4_2.from_int(2 * 17)
    B4_TW = Fq4_2([Fq4.zero(), Fq4.from_int(B4_INT * 17 % Q4)])
    G2_4 = SWCurve(Fq4_2, A4_TW, B4_TW, order=R4, cofactor=cof4_g2, name="mnt4g2")
    g2gen4 = G2_4.hash_to_curve(b"pcd-tpu/mnt4-298/g2-generator/v1")
    assert (g2gen4 * R4).is_infinity() and not g2gen4.is_infinity()
    print("MNT4_G2_COFACTOR =", cof4_g2)
    print("MNT4_G2_GX =", tuple(c.n for c in g2gen4.x.c))
    print("MNT4_G2_GY =", tuple(c.n for c in g2gen4.y.c))
    log("  mnt4 g2 ok")

    Q6, R6 = R4, Q4
    Fq6 = make_prime_field(Q6, "Fq6mnt6")
    Fq6_3 = make_ext_field(Fq6, 3, 5, "Fq6cu")
    t6 = Q6 + 1 - R6
    t6_3 = t6**3 - 3 * Q6 * t6
    n_twist6 = Q6**3 + 1 + t6_3
    assert n_twist6 % R6 == 0
    cof6_g2 = n_twist6 // R6
    A6_TW = Fq6_3([Fq6.zero(), Fq6.zero(), Fq6.from_int(11)])
    B6_TW = Fq6_3.from_int(5 * B6_INT % Q6)
    G2_6 = SWCurve(Fq6_3, A6_TW, B6_TW, order=R6, cofactor=cof6_g2, name="mnt6g2")
    g2gen6 = G2_6.hash_to_curve(b"pcd-tpu/mnt6-298/g2-generator/v1")
    assert (g2gen6 * R6).is_infinity() and not g2gen6.is_infinity()
    print("MNT6_G2_COFACTOR =", cof6_g2)
    print("MNT6_G2_GX =", tuple(c.n for c in g2gen6.x.c))
    print("MNT6_G2_GY =", tuple(c.n for c in g2gen6.y.c))
    log("  mnt6 g2 ok")
    sys.stdout.flush()

if stage in ("all", "toy"):
    log("=== stage 3: toy cycle ===")

    def adic(n, p=2):
        a = 0
        while n % p == 0:
            n //= p
            a += 1
        return a

    x = 1 << 14
    while True:
        x += 1
        q = x * x + x + 1
        r = x * x + 1
        if not (is_prime(q) and is_prime(r)):
            continue
        if adic(r - 1) < 6 or adic(q - 1) < 6:
            continue
        if (r - 1) % 3 != 0:
            continue
        break
    qT, rT = q, r
    log(f"  toy x={x} q={qT} r={rT} adic2(q-1)={adic(qT-1)} adic2(r-1)={adic(rT-1)}")
    print(f"TOY_X = {x}")
    print(f"TOY_Q4 = {qT}")
    print(f"TOY_R4 = {rT}")
    assert (qT * qT + 1) % rT == 0 and (rT * rT - rT + 1) % qT == 0

    FqT = make_prime_field(qT, "FqToy")
    FrT = make_prime_field(rT, "FrToy")
    rngT = random.Random(7)

    def find_curve_with_order(Fp, order, rng):
        p = Fp.MODULUS
        assert 2 * order > p + 1 + 2 * math.isqrt(p) + 10
        tries = 0
        while True:
            tries += 1
            a = Fp.rand(rng)
            b = Fp.rand(rng)
            if (a**3 * 4 + b * b * 27).is_zero():
                continue
            E = SWCurve(Fp, a, b, order=order, cofactor=1, name="toy")
            P = None
            for _ in range(50):
                P = E.lift_x(Fp.rand(rng))
                if P is not None:
                    break
            if P is None:
                continue
            if (P * order).is_infinity():
                P2 = E.rand_point(rng)
                if (P2 * order).is_infinity():
                    g = E.rand_point(rng)
                    return a.n, b.n, g.x.n, g.y.n, tries

    a4t, b4t, g4tx, g4ty, tr = find_curve_with_order(FqT, rT, rngT)
    log(f"  toy mnt4 curve after {tr} tries")
    print(f"TOY_MNT4_A = {a4t}")
    print(f"TOY_MNT4_B = {b4t}")
    print(f"TOY_MNT4_G1 = ({g4tx}, {g4ty})")

    a6t, b6t, g6tx, g6ty, tr = find_curve_with_order(FrT, qT, rngT)
    log(f"  toy mnt6 curve after {tr} tries")
    print(f"TOY_MNT6_A = {a6t}")
    print(f"TOY_MNT6_B = {b6t}")
    print(f"TOY_MNT6_G1 = ({g6tx}, {g6ty})")

    def find_qnr(Fp):
        n = 2
        while True:
            if pow(n, (Fp.MODULUS - 1) // 2, Fp.MODULUS) == Fp.MODULUS - 1:
                return n
            n += 1

    def find_cnr(Fp):
        p = Fp.MODULUS
        n = 2
        while True:
            if pow(n, (p - 1) // 3, p) != 1:
                return n
            n += 1

    # need u=sqrt(nr2) nonsquare in Fq2 for the Fq4 tower step
    qnr4t = None
    n = 2
    while qnr4t is None:
        if pow(n, (qT - 1) // 2, qT) == qT - 1:
            F2 = make_ext_field(FqT, 2, n, f"FqT2_{n}")
            if F2.gen_v().legendre() == -1:
                qnr4t = n
        n += 1
    print(f"TOY_MNT4_NR2 = {qnr4t}")

    cnr6t = None
    n = 2
    while cnr6t is None:
        if pow(n, (rT - 1) // 3, rT) != 1:
            F3 = make_ext_field(FrT, 3, n, f"FrT3_{n}")
            if F3.gen_v().legendre() == -1:
                cnr6t = n
        n += 1
    print(f"TOY_MNT6_NR3 = {cnr6t}")

    Fq2T = make_ext_field(FqT, 2, qnr4t, f"FqT2_{qnr4t}")
    Fq3T = make_ext_field(FrT, 3, cnr6t, f"FrT3_{cnr6t}")

    t4T = qT + 1 - rT
    ntw4T = qT * qT + 1 + (t4T * t4T - 2 * qT)
    assert ntw4T % rT == 0
    cof4T = ntw4T // rT
    A4T_TW = Fq2T.from_int(a4t * qnr4t % qT)
    B4T_TW = Fq2T([FqT.zero(), FqT.from_int(b4t * qnr4t % qT)])
    G2_4T = SWCurve(Fq2T, A4T_TW, B4T_TW, order=rT, cofactor=cof4T, name="toy4g2")
    g2g4T = G2_4T.hash_to_curve(b"pcd-tpu/toy4/g2/v1")
    assert (g2g4T * rT).is_infinity() and not g2g4T.is_infinity()
    print(f"TOY_MNT4_G2_COFACTOR = {cof4T}")
    print(f"TOY_MNT4_G2_GX = {tuple(c.n for c in g2g4T.x.c)}")
    print(f"TOY_MNT4_G2_GY = {tuple(c.n for c in g2g4T.y.c)}")

    t6T = rT + 1 - qT
    ntw6T = rT**3 + 1 + (t6T**3 - 3 * rT * t6T)
    assert ntw6T % qT == 0
    cof6T = ntw6T // qT
    A6T_TW = Fq3T([FrT.zero(), FrT.zero(), FrT.from_int(a6t)])
    B6T_TW = Fq3T.from_int(cnr6t * b6t % rT)
    G2_6T = SWCurve(Fq3T, A6T_TW, B6T_TW, order=qT, cofactor=cof6T, name="toy6g2")
    g2g6T = G2_6T.hash_to_curve(b"pcd-tpu/toy6/g2/v1")
    assert (g2g6T * qT).is_infinity() and not g2g6T.is_infinity()
    print(f"TOY_MNT6_G2_COFACTOR = {cof6T}")
    print(f"TOY_MNT6_G2_GX = {tuple(c.n for c in g2g6T.x.c)}")
    print(f"TOY_MNT6_G2_GY = {tuple(c.n for c in g2g6T.y.c)}")
    log("  toy g2 ok")

    # toy TE over FrT via the same CM machinery
    log("  toy TE curve search")
    candsT = find_4l_order(rT)
    assert candsT, "no toy TE CM candidate"
    DT, NT, cofT, ellT = candsT[0]
    ET = curve_from_cm(FrT, DT, NT, rngT)
    resT = None
    while resT is None:
        resT = sw_to_complete_te(ET, NT, cofT, rngT)
        if resT is None:
            ET = curve_from_cm(FrT, DT, NT, rngT)
    aT, dT, ellT, cofT, gxT, gyT = resT
    print(f"# toy TE (CM D={DT})")
    print(f"TOY_TE_A = {aT}")
    print(f"TOY_TE_D = {dT}")
    print(f"TOY_TE_ORDER = {ellT}")
    print(f"TOY_TE_COFACTOR = {cofT}")
    print(f"TOY_TE_G = ({gxT}, {gyT})")
    log("done")
