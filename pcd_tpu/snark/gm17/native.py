"""GM17-family SNARK: square-arithmetic-program (SAP) based,
simulation-extractable-shaped, with the characteristic two-equation verifier
(replaces ark-gm17, reference Cargo.toml:40; used at tests/mnt4_gm17.rs:27-30
and the mixed configs).

Construction (GM17-shaped; design re-derived in the Groth16 tradition —
the reference's exact CRS cannot be byte-verified here, and interchange-
ability with Groth16 inside the PCD is what the mixed configs test):

  R1CS -> SAP: each constraint a*b = c becomes two squarings
      (a+b)^2 = 4c + w,   (a-b)^2 = w        (fresh wire w)
  plus one squaring row (z_i)^2 = sq_i per instance wire for A-poly
  independence.  SAP relation: (sum z_i a_i(s))^2 = sum z_i c_i(s) + h Z.

  Secrets (s, alpha, gamma, delta).  With a := sum z_i a_i(s):
    A = G^{alpha + a + r delta}
    B = H^{alpha + a + r delta}          (same exponent, enforced by eq. 2)
    C = G^{[sum_wit z_i (2 alpha a_i + c_i) + h Z
            + r delta (2 alpha + 2a + r delta)] / delta}
  Verify:
    (1) e(A, B) == e(G^alpha, H^alpha)
                   * e(prod_pub G^{(2 alpha a_i + c_i)/gamma * x_i}, H^gamma)
                   * e(C, H^delta)
    (2) e(A, H^gamma) == e(G^gamma, B)
"""

from __future__ import annotations

from dataclasses import dataclass

from ...msm.host import FixedBaseTable, msm as host_msm
from ...poly.domain import EvaluationDomain
from ...r1cs.system import ConstraintSystem
from ..api import SNARKError


@dataclass
class GM17Proof:
    a: object  # G1
    b: object  # G2
    c: object  # G1

    def clone(self):
        return GM17Proof(self.a, self.b, self.c)


@dataclass
class GM17VK:
    alpha_g1: object
    alpha_g2: object
    gamma_g1: object
    gamma_g2: object
    delta_g2: object
    query: list  # G1: (2 alpha a_i + c_i)/gamma for instance wires


@dataclass
class GM17PVK:
    vk: GM17VK
    alpha_alpha: object  # e(alpha_g1, alpha_g2)


@dataclass
class GM17PK:
    vk: GM17VK
    delta_g1: object
    delta_g2: object
    a_query: list      # G1 a_i(s) per wire
    b_query: list      # G2 a_i(s) per wire
    c_query: list      # G1 (2 alpha a_i + c_i)/delta for witness wires
    h_query: list      # G1 s^j Z(s)/delta
    num_instance: int
    num_vars: int      # R1CS vars (before SAP extension)
    domain_size: int


class GM17:
    # SAP rows (~2x R1CS rows) above this use the device (TPU-only;
    # lowered from 60000: the real HelpCircuit is ~31k rows and host
    # MSMs cost ~380 s/prove — span profile, round-2 smoke)
    DEVICE_THRESHOLD = 16384

    def __init__(self, curve_cfg, backend: str = "auto"):
        self.cfg = curve_cfg
        self.Fr = curve_cfg.Fr
        self.backend = backend
        from ...pairing.ate import pairing_for

        self.pairing = pairing_for(curve_cfg)
        self.msm = host_msm

    def _use_device(self, n_rows: int) -> bool:
        if self.backend == "host":
            return False
        if self.backend == "device":
            # explicit opt-in: honored on any platform (toy-scale graphs
            # compile fine on XLA-CPU and the device tests rely on it)
            return True
        # auto: size dispatch, TPU only — XLA-CPU aborts compiling the
        # production-size MSM/FFT scan graphs (msm_dispatch._device_ok).
        # The native host tier wins outright when it can take the curves
        # (see Groth16._use_device), so auto requires its absence.
        from ..msm_dispatch import _device_ok, native_prove_ok

        return (n_rows >= self.DEVICE_THRESHOLD and _device_ok()
                and not native_prove_ok(self.cfg))

    def _use_device_keygen(self, n_rows: int) -> bool:
        """Key generation tier: in auto mode prefer the host C++ windowed
        fixed-base (measured faster than the device gather path at every
        size — see Groth16._use_device_keygen); device only on explicit
        request or when the native tier can't take the curves."""
        if not self._use_device(n_rows):
            return False
        if self.backend == "device":
            return True
        from ...msm.host import _native, _native_curve_ok

        if (_native() is not None and _native_curve_ok(self.cfg.g1)
                and _native_curve_ok(self.cfg.g2)):
            return False
        return True

    # -- R1CS -> SAP ----------------------------------------------------
    def _sap_rows(self, cs: ConstraintSystem):
        """Returns (rows, num_sap_vars): rows are (a_lc, c_lc) dicts over
        column indices [instance..., r1cs witness..., sap extra wires...];
        values of extra wires are computed and appended to the assignment
        by _sap_assignment."""
        p = cs.p
        n_inst = cs.num_instance
        n_vars = n_inst + cs.num_witness
        rows = []
        extra = 0

        def remap(lc):
            return {(n_inst + (-v - 1) if v < 0 else v): co % p
                    for v, co in lc.items()}

        for (a, b, c) in cs.constraints:
            ra, rb, rc = remap(a), remap(b), remap(c)
            w_col = n_vars + extra
            extra += 1
            # (a+b)^2 = 4c + w
            apb = dict(ra)
            for col, co in rb.items():
                apb[col] = (apb.get(col, 0) + co) % p
            c4 = {col: 4 * co % p for col, co in rc.items()}
            c4[w_col] = 1
            rows.append((apb, c4))
            # (a-b)^2 = w
            amb = dict(ra)
            for col, co in rb.items():
                amb[col] = (amb.get(col, 0) - co) % p
            rows.append((amb, {w_col: 1}))
        # instance independence rows: z_i^2 = sq_i
        for i in range(n_inst):
            sq_col = n_vars + extra
            extra += 1
            rows.append(({i: 1}, {sq_col: 1}))
        return rows, n_vars + extra

    def _sap_assignment(self, cs: ConstraintSystem):
        p = cs.p
        z = cs.full_assignment()
        ext = []
        for (a, b, c) in cs.constraints:
            av = cs.eval_lc(a)
            bv = cs.eval_lc(b)
            ext.append((av - bv) * (av - bv) % p)
        for i in range(cs.num_instance):
            ext.append(z[i] * z[i] % p)
        return z + ext

    def _synthesize(self, circuit) -> ConstraintSystem:
        cs = ConstraintSystem(self.Fr)
        circuit.generate_constraints(cs)
        return cs

    # -- setup ----------------------------------------------------------
    def circuit_specific_setup(self, circuit, rng):
        from ...utils.profiling import span

        with span("gm17_setup/synthesize"):
            cs = self._synthesize(circuit)
        p = self.Fr.MODULUS
        with span("gm17_setup/sap_rows"):
            rows, num_sap_vars = self._sap_rows(cs)
        n_inst = cs.num_instance
        domain = EvaluationDomain.new(self.Fr, len(rows))

        s = rng.randrange(1, p)
        alpha = rng.randrange(1, p)
        gamma = rng.randrange(1, p)
        delta = rng.randrange(1, p)

        with span("gm17_setup/lagrange"):
            lag = domain.lagrange_coeffs_at(s)
        with span("gm17_setup/columns"):
            a_of = [0] * num_sap_vars
            c_of = [0] * num_sap_vars
            for j, (ra, rc) in enumerate(rows):
                lj = lag[j]
                if lj == 0:
                    continue
                for col, co in ra.items():
                    a_of[col] = (a_of[col] + co * lj) % p
                for col, co in rc.items():
                    c_of[col] = (c_of[col] + co * lj) % p

        zt = domain.vanishing_poly_at(s)
        gamma_inv = pow(gamma, -1, p)
        delta_inv = pow(delta, -1, p)

        from ..msm_dispatch import fb_mul

        force_host = not self._use_device_keygen(len(rows))
        h_scalars = []
        cur = zt * delta_inv % p
        for _ in range(domain.n - 1):
            h_scalars.append(cur)
            cur = cur * s % p

        with span("gm17_setup/fb_g1"):
            query = fb_mul(self.cfg, "g1",
                           [(2 * alpha * a_of[i] + c_of[i]) % p
                            * gamma_inv % p
                            for i in range(n_inst)], self.Fr.BITS,
                           as_host=True, force_host=True)
            c_query = fb_mul(self.cfg, "g1",
                             [(2 * alpha * a_of[i] + c_of[i]) % p
                              * delta_inv % p
                              for i in range(n_inst, num_sap_vars)],
                             self.Fr.BITS, force_host=force_host)
            a_query = fb_mul(self.cfg, "g1", a_of, self.Fr.BITS,
                             force_host=force_host)
        with span("gm17_setup/fb_g2"):
            b_query = fb_mul(self.cfg, "g2", a_of, self.Fr.BITS,
                             force_host=force_host)
        with span("gm17_setup/fb_h"):
            h_query = fb_mul(self.cfg, "g1", h_scalars, self.Fr.BITS,
                             force_host=force_host)
        small1 = fb_mul(self.cfg, "g1", [alpha, gamma, delta], self.Fr.BITS,
                        as_host=True, force_host=True)
        small2 = fb_mul(self.cfg, "g2", [alpha, gamma, delta], self.Fr.BITS,
                        as_host=True, force_host=True)

        vk = GM17VK(
            alpha_g1=small1[0],
            alpha_g2=small2[0],
            gamma_g1=small1[1],
            gamma_g2=small2[1],
            delta_g2=small2[2],
            query=query,
        )
        pk = GM17PK(
            vk=vk,
            delta_g1=small1[2],
            delta_g2=small2[2],
            a_query=a_query,
            b_query=b_query,
            c_query=c_query,
            h_query=h_query,
            num_instance=n_inst,
            num_vars=n_inst + cs.num_witness,
            domain_size=domain.n,
        )
        return pk, vk

    # -- prove ----------------------------------------------------------
    def prove(self, pk: GM17PK, circuit, rng):
        """Works from the R1CS row evaluations Az/Bz/Cz only — the SAP
        extension (reference ark-gm17's A/C polynomials) is assembled
        elementwise:  a_ev[2j] = Az+Bz, a_ev[2j+1] = Az-Bz,
        c_ev[2j] = 4Cz + w, c_ev[2j+1] = w  with w = (Az-Bz)^2,
        plus the per-instance squaring rows.  No SAP matrices are ever
        materialized at prove time, and the row evals run on device."""
        from ..plan import plan_for
        from ...utils.profiling import span

        with span("gm17/witness"):
            z, cs, plan = plan_for(pk, lambda: ConstraintSystem(self.Fr),
                                   circuit)
        p = self.Fr.MODULUS
        if len(z) != pk.num_vars:
            raise SNARKError("circuit shape mismatch vs proving key")
        if cs is not None:
            rows3 = []
            n_inst = cs.num_instance

            def remap(lc):
                return {(n_inst + (-v - 1) if v < 0 else v): co % p
                        for v, co in lc.items()}

            for (a, b, c) in cs.constraints:
                rows3.append((remap(a), remap(b), remap(c)))
            n_cons = cs.num_constraints
            if plan is not None:
                plan.rows = rows3
        else:
            rows3 = plan.rows
            n_inst = plan.n_inst
            n_cons = plan.n_constraints
        replayed = cs is None
        domain = EvaluationDomain(self.Fr, pk.domain_size)
        device = self._use_device(2 * n_cons + n_inst)
        stream_futs: dict = {}
        launch_f = None

        with span("gm17/h_poly"):
            if device:
                import jax.numpy as jnp
                import numpy as np

                from ...ops.fft_tensor import fft_ctx
                from ...ops.matvec_tensor import matrices_to_device

                fctx = fft_ctx(self.Fr, domain.n)
                fp = fctx.fp
                mats = getattr(pk, "_dev_mats", None)
                if mats is None:
                    mats = matrices_to_device(self.Fr, rows3, n_cons, len(z))
                    pk._dev_mats = mats
                z_mont = jnp.asarray(fp.encode(z))
                az, bz, cz = (m.apply(z_mont) for m in mats)
                viol = fp.sub(fp.mont_mul(az, bz), cz)
                if bool(jnp.any(viol)):
                    raise SNARKError(
                        "unsatisfied constraint (device row check)")
                apb = fp.add(az, bz)
                amb = fp.sub(az, bz)
                w = fp.mont_mul(amb, amb)
                cz4 = fp.add(fp.add(cz, cz), fp.add(cz, cz))
                zi = z_mont[:n_inst]
                zi_sq = fp.mont_mul(zi, zi)
                a_dev = jnp.zeros((domain.n, fp.k), dtype=jnp.uint32)
                a_dev = a_dev.at[0 : 2 * n_cons : 2].set(apb)
                a_dev = a_dev.at[1 : 2 * n_cons : 2].set(amb)
                a_dev = a_dev.at[2 * n_cons : 2 * n_cons + n_inst].set(zi)
                c_dev = jnp.zeros((domain.n, fp.k), dtype=jnp.uint32)
                c_dev = c_dev.at[0 : 2 * n_cons : 2].set(fp.add(cz4, w))
                c_dev = c_dev.at[1 : 2 * n_cons : 2].set(w)
                c_dev = c_dev.at[2 * n_cons : 2 * n_cons + n_inst].set(zi_sq)
                # SAP extension of the assignment (scalars for the MSMs)
                z = z + fp.decode(np.asarray(w)) + fp.decode(np.asarray(zi_sq))
                evs = jnp.stack([a_dev, c_dev])
                ap = fctx.coset_fft(fctx.ifft(evs))
                prod = fp.sub(fp.mont_mul(ap[0], ap[0]), ap[1])
                zh_inv = pow(domain.vanishing_poly_at(domain.coset_shift),
                             -1, p)
                zh = jnp.asarray(fp.to_mont_host(zh_inv))
                h_cos = fp.mont_mul(prod, jnp.broadcast_to(zh, prod.shape))
                h = fctx.decode(fctx.coset_ifft(h_cos))[: domain.n - 1]
            else:
                from ... import native as _nat

                if _nat.available() and p.bit_length() <= 320:
                    # limb fast path: CSR matvec, SAP eval construction
                    # (vec_op elementwise), the fused squaring quotient
                    # h = (A^2 - C)/Z_H (hpoly with b aliased to a) and
                    # the MSM scalars all stay in limb form
                    import numpy as np

                    mats = getattr(pk, "_host_mats", None)
                    if mats is None:
                        mats = _nat.SpMatrices(p, rows3, n_cons)
                        pk._host_mats = mats
                    z_limbs = _nat.scalars_to_limbs(z)
                    azl, bzl, czl = mats.apply_all_limbs(z_limbs)
                    d = _nat.vec_op(p, "sub", azl, bzl)
                    w = _nat.vec_op(p, "mul", d, d)
                    apb = _nat.vec_op(p, "add", azl, bzl)
                    cz2 = _nat.vec_op(p, "add", czl, czl)
                    c0 = _nat.vec_op(p, "add",
                                     _nat.vec_op(p, "add", cz2, cz2), w)
                    zi = np.ascontiguousarray(z_limbs[:n_inst])
                    zisq = _nat.vec_op(p, "mul", zi, zi) if n_inst else zi
                    # SAP-extended assignment (the MSM scalars) is ready
                    # BEFORE the quotient: dispatch the a/b/c query MSMs
                    # to the TPU stream tier now so the device overlaps
                    # the host hpoly below (h joins the queue after)
                    z_ext = np.concatenate([z_limbs, w, zisq])
                    from ..msm_dispatch import (STREAM_MIN, stream_enabled,
                                                stream_msm_async)

                    if (stream_enabled(self.backend)
                            and z_ext.shape[0] >= STREAM_MIN):
                        from concurrent.futures import ThreadPoolExecutor

                        from ..msm_dispatch import stream_table

                        names = (("a_query", z_ext, self.cfg.g1),
                                 ("b_query", z_ext, self.cfg.g2),
                                 ("c_query", z_ext[n_inst:],
                                  self.cfg.g1))

                        def _launch():
                            # build all tables synchronously first
                            # (their encode transients must not overlap
                            # MSM queues)
                            for nm, _, curve in names + (
                                    ("h_query", None, self.cfg.g1),):
                                stream_table(pk, nm, curve, self.Fr.BITS)
                            sched_cache = {}  # a/b share one schedule
                            with span("stream_dispatch"):
                                for nm, sl, curve in names:
                                    fut = stream_msm_async(
                                        pk, nm, curve, self.Fr.BITS,
                                        np.ascontiguousarray(sl),
                                        sched_cache=sched_cache)
                                    if fut is not None:
                                        stream_futs[nm] = fut

                        # background thread: the schedule uploads ride
                        # the tunnel while the host (pure C++) runs the
                        # squaring-quotient pipeline below
                        _ex = ThreadPoolExecutor(max_workers=1)
                        launch_f = _ex.submit(_launch)
                        _ex.shutdown(wait=False)
                    nl = z_limbs.shape[1]
                    a_ev = np.zeros((domain.n, nl), dtype="<u8")
                    c_ev = np.zeros((domain.n, nl), dtype="<u8")
                    a_ev[0 : 2 * n_cons : 2] = apb
                    a_ev[1 : 2 * n_cons : 2] = d
                    a_ev[2 * n_cons : 2 * n_cons + n_inst] = zi
                    c_ev[0 : 2 * n_cons : 2] = c0
                    c_ev[1 : 2 * n_cons : 2] = w
                    c_ev[2 * n_cons : 2 * n_cons + n_inst] = zisq
                    zh_inv = pow(
                        domain.vanishing_poly_at(domain.coset_shift), -1, p)
                    try:
                        # even SAP row check: A^2 - C = 4(Az.Bz - Cz)
                        h_limbs = _nat.hpoly(
                            p, domain.omega, domain.coset_shift, zh_inv,
                            a_ev, a_ev, c_ev,
                            check_rows=2 * n_cons if replayed else 0)
                    except ValueError:
                        raise SNARKError(
                            "unsatisfied constraint (replayed witness)")
                    h = h_limbs[: domain.n - 1]
                    if launch_f is not None:
                        launch_f.result()
                    if stream_futs:
                        from ..msm_dispatch import stream_msm_async as _sma

                        with span("stream_dispatch_h"):
                            fut = _sma(pk, "h_query", self.cfg.g1,
                                       self.Fr.BITS, h)
                        if fut is not None:
                            stream_futs["h_query"] = fut
                    z = z_ext
                else:
                    azs = [0] * n_cons
                    bzs = [0] * n_cons
                    czs = [0] * n_cons
                    for j, (ra, rb, rc) in enumerate(rows3):
                        azs[j] = sum(co * z[col]
                                     for col, co in ra.items()) % p
                        bzs[j] = sum(co * z[col]
                                     for col, co in rb.items()) % p
                        czs[j] = sum(co * z[col]
                                     for col, co in rc.items()) % p
                    if replayed:
                        for j in range(n_cons):
                            if (azs[j] * bzs[j] - czs[j]) % p:
                                raise SNARKError(
                                    f"unsatisfied constraint #{j} (replayed)")
                    a_ev = [0] * domain.n
                    c_ev = [0] * domain.n
                    for j in range(n_cons):
                        wj = (azs[j] - bzs[j]) ** 2 % p
                        a_ev[2 * j] = (azs[j] + bzs[j]) % p
                        a_ev[2 * j + 1] = (azs[j] - bzs[j]) % p
                        c_ev[2 * j] = (4 * czs[j] + wj) % p
                        c_ev[2 * j + 1] = wj
                    for i in range(n_inst):
                        a_ev[2 * n_cons + i] = z[i]
                        c_ev[2 * n_cons + i] = z[i] * z[i] % p
                    # SAP extension of the assignment
                    z = z + [(azs[j] - bzs[j]) ** 2 % p
                             for j in range(n_cons)] \
                        + [z[i] * z[i] % p for i in range(n_inst)]
                    a_poly = domain.ifft(a_ev)
                    c_poly = domain.ifft(c_ev)
                    a_cos = domain.coset_fft(a_poly)
                    c_cos = domain.coset_fft(c_poly)
                    zh_inv = pow(domain.vanishing_poly_at(domain.coset_shift),
                                 -1, p)
                    h_cos = [(a_cos[i] * a_cos[i] - c_cos[i]) % p
                             * zh_inv % p for i in range(domain.n)]
                    h = domain.coset_ifft(h_cos)[: domain.n - 1]

        r = rng.randrange(p)

        from ..msm_dispatch import host_query, msm_any, stream_collect

        def msm_q(nm, scalars):
            if nm in stream_futs:
                with span("msm_" + nm + "_tpu"):
                    return stream_collect(stream_futs[nm])
            with span("msm_" + nm):
                return msm_any(host_query(pk, nm), scalars, self.Fr.BITS)

        a_part = msm_q("a_query", z)  # G^{a(s)}
        g_a = pk.vk.alpha_g1 + a_part + pk.delta_g1 * r
        g_b = pk.vk.alpha_g2 + msm_q("b_query", z) + pk.delta_g2 * r

        # C = sum_wit z_i (2 alpha a_i + c_i)/delta + h Z/delta
        #     + r * (2 alpha + 2 a(s)) + r^2 delta
        c_acc = msm_q("c_query", z[n_inst:])
        c_acc = c_acc + msm_q("h_query", h)
        c_acc = c_acc + (pk.vk.alpha_g1 * (2 * r % p)) \
            + (a_part * (2 * r % p)) + (pk.delta_g1 * (r * r % p))
        return GM17Proof(a=g_a, b=g_b, c=c_acc)

    # -- verify ----------------------------------------------------------
    def process_vk(self, vk: GM17VK) -> GM17PVK:
        return GM17PVK(vk=vk,
                       alpha_alpha=self.pairing.pairing(vk.alpha_g1, vk.alpha_g2))

    def verify_with_processed_vk(self, pvk: GM17PVK, public_input, proof) -> bool:
        vk = pvk.vk
        xs = [1] + [int(x.n if hasattr(x, "n") else x) for x in public_input]
        if len(xs) != len(vk.query):
            raise SNARKError("input length mismatch")
        psi = self.msm(vk.query, xs)
        eq1 = self.pairing.multi_pairing([
            (proof.a, proof.b),
            (-psi, vk.gamma_g2),
            (-proof.c, vk.delta_g2),
        ]) == pvk.alpha_alpha
        eq2 = self.pairing.multi_pairing([
            (proof.a, vk.gamma_g2),
            (-vk.gamma_g1, proof.b),
        ]).is_one()
        return eq1 and eq2

    def verify(self, vk: GM17VK, public_input, proof) -> bool:
        return self.verify_with_processed_vk(self.process_vk(vk), public_input,
                                             proof)
