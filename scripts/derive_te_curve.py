"""Find a complete twisted Edwards curve over a given prime field via the CM
method with arbitrary class-number discriminants (Hilbert class polynomials
computed with mpmath).  Order-verified end to end; used to fill the role of
`ark-ed-on-mnt4-298` (reference Cargo.toml:31) whose constants are not
recoverable here.

Usage: python scripts/derive_te_curve.py [p]   (default: MNT4-298 Fr)
"""

import math
import random
import sys

sys.path.insert(0, "/root/repo")

import mpmath as mp

from pcd_tpu.fields.prime import make_prime_field
from pcd_tpu.curves.short_weierstrass import SWCurve
from pcd_tpu.curves.twisted_edwards import TECurve, TEPoint


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
    Fp = make_prime_field(p, f"F_{p % 99991}")
    rt = Fp.from_int(-D % p).sqrt()
    if rt is None:
        return None
    for x0 in (rt.n, p - rt.n):
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


def reduced_forms(D):
    """Reduced primitive binary quadratic forms of discriminant -D."""
    forms = []
    b = D % 2
    while b * b <= D // 3 + 1:
        ac4 = b * b + D
        if ac4 % 4 == 0:
            ac = ac4 // 4
            a = max(b, 1)
            while a * a <= ac:
                if a != 0 and ac % a == 0:
                    c = ac // a
                    if a <= c and math.gcd(math.gcd(a, abs(b)), c) == 1:
                        if b >= 0 or (a != b and a != c):
                            forms.append((a, b, c))
                            if 0 < b < a < c:
                                forms.append((a, -b, c))
                a += 1
        b += 2 if b else 2
        if b == 0:
            b = 2
    # standard enumeration: |b| <= a <= c, b>=0 if |b|==a or a==c
    out = []
    for (a, b, c) in forms:
        if abs(b) <= a <= c and (b >= 0 or (abs(b) != a and a != c)):
            out.append((a, b, c))
    return sorted(set(out))


def hilbert_poly_mod(D, p):
    """Coefficients (int mod p, little-endian, monic) of H_{-D}(X)."""
    forms = reduced_forms(D)
    h = len(forms)
    prec = int(15 + 3.5 * math.sqrt(D) * h)  # generous decimal digits
    mp.mp.dps = prec
    js = []
    for (a, b, c) in forms:
        tau = (mp.mpf(-b) + mp.sqrt(mp.mpf(-D))) / (2 * a)
        js.append(1728 * mp.kleinj(tau))
    # multiply out the polynomial
    poly = [mp.mpc(1)]
    for j in js:
        new = [mp.mpc(0)] * (len(poly) + 1)
        for i, ci in enumerate(poly):
            new[i + 1] += ci
            new[i] -= ci * j
        poly = new
    coeffs = []
    max_err = 0.0
    for cc in poly:
        ci = mp.nint(cc.real)
        err = abs(cc.real - ci) + abs(cc.imag)
        max_err = max(max_err, float(err))
        coeffs.append(int(ci) % p)
    if max_err > 0.01:
        return None, h, max_err
    return coeffs, h, max_err


# ---- polynomial utilities mod p (little-endian int lists) -----------------
def pdeg(u):
    d = len(u) - 1
    while d >= 0 and u[d] == 0:
        d -= 1
    return d


def ptrim(u):
    return u[: pdeg(u) + 1] if pdeg(u) >= 0 else [0]


def pmulmod(u, v, f, p):
    res = [0] * (len(u) + len(v) - 1)
    for i, ui in enumerate(u):
        if ui:
            for j, vj in enumerate(v):
                res[i + j] = (res[i + j] + ui * vj) % p
    # reduce by monic f
    df = pdeg(f)
    while pdeg(res) >= df:
        dr = pdeg(res)
        c = res[dr]
        res = res[:dr]  # drop top (monic f)
        for i in range(df):
            res[dr - df + i] = (res[dr - df + i] - c * f[i]) % p
    return ptrim(res)


def ppowmod(base, e, f, p):
    result = [1]
    b = ptrim(base)
    while e:
        if e & 1:
            result = pmulmod(result, b, f, p)
        b = pmulmod(b, b, f, p)
        e >>= 1
    return result


def pgcd(u, v, p):
    u, v = ptrim(u), ptrim(v)
    while pdeg(v) >= 0 and any(v):
        du, dv = pdeg(u), pdeg(v)
        if du < dv:
            u, v = v, u
            continue
        # u mod v
        u = list(u)
        inv = pow(v[dv], -1, p)
        while pdeg(u) >= dv:
            du = pdeg(u)
            c = u[du] * inv % p
            for i in range(dv + 1):
                u[du - dv + i] = (u[du - dv + i] - c * v[i]) % p
            u = ptrim(u)
            if pdeg(u) < 0:
                break
        u, v = v, ptrim(u)
        if v == [0]:
            break
    # normalize monic
    d = pdeg(u)
    if d >= 0:
        inv = pow(u[d], -1, p)
        u = [(c * inv) % p for c in u]
    return u


def poly_roots(f, p, rng):
    """All roots in Fp of polynomial f (little-endian ints), via equal-degree
    splitting. f need not be squarefree (we gcd with x^p - x first)."""
    f = ptrim(f)
    # make monic
    d = pdeg(f)
    inv = pow(f[d], -1, p)
    f = [(c * inv) % p for c in f]
    # g = gcd(f, x^p - x)
    xp = ppowmod([0, 1], p, f, p)
    xp_minus_x = list(xp) + [0] * (2 - len(xp)) if len(xp) < 2 else list(xp)
    while len(xp_minus_x) < 2:
        xp_minus_x.append(0)
    xp_minus_x[1] = (xp_minus_x[1] - 1) % p
    g = pgcd(f, xp_minus_x, p)
    roots = []

    def split(g):
        dg = pdeg(g)
        if dg <= 0:
            return
        if dg == 1:
            roots.append((-g[0] * pow(g[1], -1, p)) % p)
            return
        if dg == 2:
            a2, a1, a0 = g[2], g[1], g[0]
            disc = (a1 * a1 - 4 * a2 * a0) % p
            Fp = make_prime_field(p, f"F_{p % 99991}")
            sq = Fp.from_int(disc).sqrt()
            if sq is None:
                return
            inv2a = pow(2 * a2, -1, p)
            roots.append(((-a1 + sq.n) * inv2a) % p)
            roots.append(((-a1 - sq.n) * inv2a) % p)
            return
        while True:
            delta = rng.randrange(p)
            h = ppowmod([delta, 1], (p - 1) // 2, g, p)
            h = list(h)
            if not h:
                h = [0]
            h[0] = (h[0] - 1) % p
            w = pgcd(g, h, p)
            dw = pdeg(w)
            if 0 < dw < dg:
                split(w)
                # g / w
                q = pdiv(g, w, p)
                split(q)
                return

    def pdiv(u, v, p):
        u = list(ptrim(u))
        dv = pdeg(v)
        inv = pow(v[dv], -1, p)
        q = [0] * (pdeg(u) - dv + 1)
        while pdeg(u) >= dv:
            du = pdeg(u)
            c = u[du] * inv % p
            q[du - dv] = c
            for i in range(dv + 1):
                u[du - dv + i] = (u[du - dv + i] - c * v[i]) % p
            u = ptrim(u)
        return q

    split(g)
    return sorted(set(roots))


def sw_to_complete_te(E, N, cof, ell, rng):
    """SW curve (order N = cof*ell, 4|N) -> complete TE; tries all 2-torsion
    roots and both sqrt signs. Returns dict or None."""
    Fp = E.F
    p = Fp.MODULUS
    froots = poly_roots([E.b.n, E.a.n, 0, 1], p, rng)
    for x0i in froots:
        x0 = Fp.from_int(x0i)
        c2 = x0 * Fp.from_int(3)
        c4 = x0 * x0 * Fp.from_int(3) + E.a
        if c4.is_zero() or not c4.is_square():
            continue
        for sgn in (1, -1):
            s = c4.sqrt() * sgn
            A = c2 / s
            B = s
            a_te = (A + Fp.from_int(2)) / B
            d_te = (A - Fp.from_int(2)) / B
            if a_te.is_zero() or d_te.is_zero():
                continue
            if not a_te.is_square() or d_te.is_square():
                continue
            te = TECurve(Fp, a_te, d_te, order=ell, cofactor=cof, name="te")
            for _ in range(80):
                P = E.rand_point(rng)
                X = (P.x - x0) / s
                Y = P.y / (s * s)
                if Y.is_zero() or (X + Fp.one()).is_zero():
                    continue
                xe = X / Y
                ye = (X - Fp.one()) / (X + Fp.one())
                pt = TEPoint(te, xe, ye)
                if not pt.is_on_curve():
                    continue
                g = pt * cof
                if g.is_identity():
                    continue
                assert (g * ell).is_identity(), "order check failed"
                return dict(a=a_te.n, d=d_te.n, order=ell, cofactor=cof,
                            gx=g.x.n, gy=g.y.n)
    return None


def find_te(p, max_D=3000, max_cof_bits=48, seed=20240817):
    rng = random.Random(seed)
    Fp = make_prime_field(p, "Fp_te")
    for D in range(3, max_D):
        if D % 4 not in (0, 3):
            continue
        ts = cornacchia_4p(p, D)
        if ts is None:
            continue
        t, s = ts
        traces = {t, -t}
        if D == 3:
            for tt in (t + 3 * s, t - 3 * s, -(t + 3 * s), -(t - 3 * s)):
                if tt % 2 == 0:
                    traces.add(tt // 2)
        if D == 4:
            traces.update({2 * s, -2 * s})
        usable = []
        for tr in sorted(traces):
            N = p + 1 - tr
            if N % 4:
                continue
            m, c = N, 1
            d = 2
            while d < 200000 and d * d <= m:
                while m % d == 0:
                    m //= d
                    c *= d
                d += 1 if d == 2 else 2
            if m > 1 and is_prime(m) and c % 4 == 0 and c.bit_length() <= max_cof_bits:
                usable.append((N, c, m))
        if not usable:
            continue
        nforms = len(reduced_forms(D))
        if nforms > 24:
            continue
        log(f"D={D} h={nforms}: {len(usable)} usable order(s); computing H_D...")
        coeffs, h, err = hilbert_poly_mod(D, p)
        if coeffs is None:
            log(f"  H_D precision fail (err={err}); skipping")
            continue
        jroots = poly_roots(coeffs, p, rng)
        log(f"  {len(jroots)} j-roots mod p")
        for j0 in jroots:
            if j0 in (0, 1728 % p):
                continue
            jf = Fp.from_int(j0)
            k = jf / (Fp.from_int(1728) - jf)
            a0 = Fp.from_int(3) * k
            b0 = Fp.from_int(2) * k
            # iterate quadratic twists: (a c^2, b c^3)
            for _ in range(40):
                c = Fp.rand(rng)
                if c.is_zero():
                    continue
                a = a0 * c * c
                b = b0 * c * c * c
                E = SWCurve(Fp, a, b, order=0, cofactor=1, name="cm")
                P = None
                for _ in range(60):
                    P = E.lift_x(Fp.rand(rng))
                    if P is not None:
                        break
                if P is None:
                    continue
                for (N, cof, ell) in usable:
                    if (P * N).is_infinity():
                        E.order, E.cofactor = ell, cof
                        res = sw_to_complete_te(E, N, cof, ell, rng)
                        if res is not None:
                            res["D"] = D
                            return res
                        log("  curve hit but TE conversion failed; next twist")
                        break
    return None


if __name__ == "__main__":
    p = int(sys.argv[1]) if len(sys.argv) > 1 else \
        475922286169261325753349249653048451545124878552823515553267735739164647307408490559963137
    res = find_te(p)
    assert res is not None, "no complete TE curve found; raise max_D"
    print(f"# derived complete TE curve over field p={p}")
    print(f"# CM discriminant D={res['D']}; a is a square, d a non-square (complete)")
    print(f"TE_A = {res['a']}")
    print(f"TE_D = {res['d']}")
    print(f"TE_ORDER = {res['order']}")
    print(f"TE_COFACTOR = {res['cofactor']}")
    print(f"TE_G = ({res['gx']}, {res['gy']})")
