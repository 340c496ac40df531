"""Groth16 native prover/verifier (replaces ark-groth16, reference
Cargo.toml:39; used as MainSNARK/HelpSNARK in tests/mnt4_groth16.rs:26-29).

Standard Groth16 over the QAP of the R1CS:
  - domain H of size >= num_constraints + num_instance; the instance
    variables get "input consistency" rows (A[nc+i][i]=1) so their
    A-polynomials are independent (libsnark/arkworks convention)
  - setup evaluates u_i/v_i/w_i at tau via Lagrange coefficients (no FFT)
  - prove computes h = (A B - C)/Z_H on a coset and commits via MSMs
  - proofs are randomized (r, s)

The MSM/FFT calls go through backend hooks (`self.msm`, domain FFTs) so the
device path (JAX Pippenger / batched FFT) can be swapped in for production
sizes without touching protocol logic.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...msm.host import msm as host_msm
from ...poly.domain import EvaluationDomain
from ...r1cs.system import ConstraintSystem
from ...utils.profiling import span
from ..api import SNARKError


@dataclass
class Groth16Proof:
    a: object  # G1
    b: object  # G2
    c: object  # G1

    def clone(self):
        return Groth16Proof(self.a, self.b, self.c)


@dataclass
class Groth16VK:
    alpha_g1: object
    beta_g2: object
    gamma_g2: object
    delta_g2: object
    gamma_abc: list  # G1, length num_instance


@dataclass
class Groth16PVK:
    vk: Groth16VK
    alpha_beta: object  # e(alpha, beta) in Fq^k


@dataclass
class Groth16PK:
    vk: Groth16VK
    beta_g1: object
    delta_g1: object
    a_query: list     # u_i(tau) G1 per variable
    b_g1_query: list  # v_i(tau) G1
    b_g2_query: list  # v_i(tau) G2
    h_query: list     # tau^i Z(tau)/delta G1,  i < n-1
    l_query: list     # (beta u_i + alpha v_i + w_i)/delta G1, witness vars
    num_instance: int
    domain_size: int


class Groth16:
    # circuits above this many R1CS rows use the device (JAX) data plane
    # for key generation, proving MSMs and FFTs
    # rows above this use the device data plane (TPU-only; lowered
    # from 60000 after the round-2 span profile showed the ~31k-row
    # HelpCircuit spending 380 s/prove in host MSMs)
    DEVICE_THRESHOLD = 16384

    def __init__(self, curve_cfg, backend: str = "auto"):
        """curve_cfg: MNTCurveConfig — G1/G2/Fr and the pairing.
        backend: 'host' | 'device' | 'auto' (size-dispatch).
        Assign a parallel.dist.DistContext to `.dist` to run the proving
        MSMs and the quotient-poly pipeline sharded over a device mesh."""
        self.cfg = curve_cfg
        self.Fr = curve_cfg.Fr
        self.backend = backend
        self.dist = None
        from ...pairing.ate import pairing_for

        self.pairing = pairing_for(curve_cfg)
        self.msm = host_msm

    def _use_device(self, n: int) -> bool:
        if self.backend == "host":
            return False
        if self.backend == "device":
            # explicit opt-in: honored on any platform (toy-scale graphs
            # compile fine on XLA-CPU and the device tests rely on it)
            return True
        # auto: size dispatch, TPU only — XLA-CPU aborts compiling the
        # production-size MSM/FFT scan graphs (msm_dispatch._device_ok).
        # When the native host tier can take the curves it wins outright
        # (warm IVC step 16.8 s host vs compile-dominated minutes on the
        # device tier), so auto only routes to the device without it.
        from ..msm_dispatch import _device_ok, native_prove_ok

        return (n >= self.DEVICE_THRESHOLD and _device_ok()
                and not native_prove_ok(self.cfg))

    def _use_device_keygen(self, n: int) -> bool:
        """Key generation tier.  In auto mode the host C++ windowed
        fixed-base wins at every measured size (full MNT-298 setup:
        57.9 s host tier vs 135 s device gather path, round 3), so the
        device keygen only runs when explicitly requested or when the
        native tier can't take this cycle's curves."""
        if not self._use_device(n):
            return False
        if self.backend == "device":
            return True
        from ...msm.host import _native, _native_curve_ok

        if (_native() is not None and _native_curve_ok(self.cfg.g1)
                and _native_curve_ok(self.cfg.g2)):
            return False
        return True

    # -- device helpers --------------------------------------------------
    def _fb_mul(self, which: str, scalars, as_host: bool = False):
        """Fixed-base scalar batch on device; `which` in {'g1','g2'}."""
        import jax.numpy as jnp

        from ...ops.fixed_base import DevicePointVec, fixed_base_device

        curve = self.cfg.g1 if which == "g1" else self.cfg.g2
        base = self.cfg.g1_gen if which == "g1" else self.cfg.g2_gen
        fb = fixed_base_device(curve, base, self.Fr.BITS)
        digits = jnp.asarray(fb.digits_from_ints(scalars))
        arrays = fb.mul_digits_padded(digits)
        vec = DevicePointVec(curve, arrays)
        return vec.to_host() if as_host else vec

    def _msm_any(self, query, scalars, digits=None):
        """MSM dispatch: host point list or DevicePointVec.  `digits` may
        carry precomputed window digits (shared across the A/B1/B2 MSMs,
        which use the same scalar vector z)."""
        import numpy as np

        from ...ops.fixed_base import DevicePointVec

        if isinstance(query, DevicePointVec):
            import jax.numpy as jnp

            from ...ops.msm_tensor import msm_ctx_for

            if self.dist is not None:
                from ...ops.msm_stream import stream_ok

                if stream_ok(query.curve):
                    # the mesh shards the production STREAM architecture
                    # (parallel/stream_dist.py); the legacy scan shard
                    # below only covers curves the stream tier can't take
                    pts = getattr(query, "_host_pts", None)
                    if pts is None:
                        pts = query.to_host()
                        query._host_pts = pts
                    return self.dist.stream_msm(query.curve, self.Fr.BITS,
                                                pts, scalars)
            mctx = msm_ctx_for(query.curve, self.Fr.BITS, len(query))
            if digits is None or digits.shape[0] != mctx.nwin:
                # shared digits only help when the window size matches
                # (G1 runs c=16/f32, G2 runs c=8/u32)
                digits = jnp.asarray(mctx.digits_from_ints(scalars))
            arrays = (query.as_f32() if mctx.backend == "f32"
                      else query.arrays)
            if self.dist is not None:
                return self.dist.msm(mctx, arrays, digits)
            return mctx.msm_to_host(arrays, digits)
        from ...native import EncodedPoints

        if isinstance(query, EncodedPoints):
            # pre-marshalled fixed table: no host-side zero filter (the
            # C++ bucket loop skips zero digits); zip-truncate like the
            # list path below
            n = min(len(query), len(scalars))
            return self.msm(query.slice(0, n) if len(query) != n else query,
                            scalars[:n] if len(scalars) != n else scalars)
        if isinstance(scalars, np.ndarray):
            # limb fast-path scalars meeting a small plain-list query
            # (tables under the native encode threshold stay lists)
            from ...native import limbs_to_ints

            scalars = limbs_to_ints(scalars)
        nz = [(pt, s) for pt, s in zip(query, scalars) if s]
        if not nz:
            return query[0].curve.infinity()
        return self.msm([a for a, _ in nz], [b for _, b in nz])

    def _h_poly(self, domain, a_ev, b_ev, c_ev, device: bool):
        """h = (A B - C)/Z_H on a coset; host or device FFT pipeline."""
        p = self.Fr.MODULUS
        if not device:
            a_cos = domain.coset_fft(domain.ifft(a_ev))
            b_cos = domain.coset_fft(domain.ifft(b_ev))
            c_cos = domain.coset_fft(domain.ifft(c_ev))
            zh_inv = pow(domain.vanishing_poly_at(domain.coset_shift), -1, p)
            h_cos = [(a_cos[i] * b_cos[i] - c_cos[i]) % p * zh_inv % p
                     for i in range(domain.n)]
            return domain.coset_ifft(h_cos)
        import jax.numpy as jnp
        import numpy as np

        from ...ops.fft_tensor import fft_ctx

        fctx = fft_ctx(self.Fr, domain.n)
        evs = jnp.asarray(np.stack([fctx.encode(v)
                                    for v in (a_ev, b_ev, c_ev)]))
        ap = fctx.coset_fft(fctx.ifft(evs))
        prod = fctx.fp.sub(fctx.fp.mont_mul(ap[0], ap[1]), ap[2])
        zh_inv = pow(domain.vanishing_poly_at(domain.coset_shift), -1, p)
        zh = jnp.asarray(fctx.fp.to_mont_host(zh_inv))
        h_cos = fctx.fp.mont_mul(prod, jnp.broadcast_to(zh, prod.shape))
        return fctx.decode(fctx.coset_ifft(h_cos))

    # -- stream-MSM TPU offload -------------------------------------------
    # The host tier and the TPU are independent execution units; the
    # prove's five commitment MSMs are independent given (z, h).  The G1
    # query MSMs (a, b1, l — and h once the quotient lands) are
    # dispatched to the TPU stream tier (ops/msm_stream.py) while the
    # host C++ tier runs the matvec, the quotient pipeline and the G2
    # MSM; the tiny window sums are fetched and Horner-combined after.
    # Default-ON whenever a TPU is attached (PCD_TPU_STREAM=0 opts out).
    # 24k: low enough that the 31k-row HelpCircuit's MSMs stream too
    # (see msm_dispatch.STREAM_MIN).
    STREAM_MIN = 24_000

    def _stream_launch(self, pk, z_limbs, n_inst):
        """Dispatch the a/b1/b2/l MSMs to the TPU (G1 via the prime
        kernels, the G2 b-commit via the Fp2/Fp3 ext kernels); returns
        {name: (ctx, window-sum device arrays)} or None."""
        from ..msm_dispatch import stream_enabled, stream_msm_async

        if z_limbs is None or len(pk.a_query) < self.STREAM_MIN:
            return None
        if not stream_enabled(self.backend):
            return None
        from ..msm_dispatch import stream_table

        # l_query is the z vector offset by the instance columns; padding
        # its table with n_inst flagged-infinity rows realigns it to the
        # FULL z vector, so all four z-driven MSMs (a/b1/b2/l) share one
        # schedule and one schedule upload (the step's wire floor)
        l_nm = "l_query"
        fp = None
        try:
            from ...ops.msm_stream import stream_ctx

            fp = stream_ctx(self.cfg.g1, self.Fr.BITS).ec.fp
        except Exception:
            pass
        if n_inst and fp is not None and fp.kp > fp.k:
            if not hasattr(pk, "l_query_zpad"):
                pk.l_query_zpad = ([self.cfg.g1.infinity()] * n_inst
                                   + list(pk.l_query))
            l_nm = "l_query_zpad"
            n_inst = 0
        names = (("a_query", 0, self.cfg.g1),
                 ("b_g1_query", 0, self.cfg.g1),
                 ("b_g2_query", 0, self.cfg.g2),
                 (l_nm, n_inst, self.cfg.g1))
        # build every table FIRST (synchronously): the table encode's
        # transients must not overlap the dispatch queues
        for nm, _, curve in names + (("h_query", 0, self.cfg.g1),):
            stream_table(pk, nm, curve, self.Fr.BITS)
        futs = {}
        sched_cache = {}   # a/b1/b2 (+ padded l) share one schedule
        with span("stream_dispatch"):
            for nm, col0, curve in names:
                fut = stream_msm_async(pk, nm, curve, self.Fr.BITS,
                                       z_limbs[col0:],
                                       sched_cache=sched_cache)
                if fut is not None:
                    futs[nm] = fut
        if "l_query_zpad" in futs:
            futs["l_query"] = futs.pop("l_query_zpad")
        return futs or None

    def _stream_launch_h(self, pk, futs, h_limbs):
        """Dispatch the h-query MSM once the quotient limbs land."""
        from ..msm_dispatch import stream_enabled, stream_msm_async

        if futs is None or not stream_enabled(self.backend):
            return False
        with span("stream_dispatch_h"):
            fut = stream_msm_async(pk, "h_query", self.cfg.g1,
                                   self.Fr.BITS, h_limbs)
        if fut is None:
            return False
        futs["h_query"] = fut
        return True

    @staticmethod
    def _stream_collect(futs, nm):
        """Block on one dispatched MSM and Horner-combine on host."""
        from ..msm_dispatch import stream_collect

        return stream_collect(futs[nm])

    # ------------------------------------------------------------------
    def _synthesize(self, circuit) -> ConstraintSystem:
        cs = ConstraintSystem(self.Fr)
        circuit.generate_constraints(cs)
        return cs

    @staticmethod
    def _matrix_rows(cs: ConstraintSystem):
        """Constraint rows + input-consistency rows, as sparse lc dicts in
        *column* index space (0..num_vars)."""
        n_inst = cs.num_instance
        rows = []
        for (a, b, c) in cs.constraints:
            def remap(lc):
                return {(n_inst + (-v - 1) if v < 0 else v): co % cs.p
                        for v, co in lc.items()}
            rows.append((remap(a), remap(b), remap(c)))
        for i in range(n_inst):
            rows.append(({i: 1}, {}, {}))
        return rows

    # ------------------------------------------------------------------
    def circuit_specific_setup(self, circuit, rng):
        cs = self._synthesize(circuit)
        p = self.Fr.MODULUS
        rows = self._matrix_rows(cs)
        num_vars = cs.num_instance + cs.num_witness
        n_inst = cs.num_instance
        domain = EvaluationDomain.new(self.Fr, len(rows))

        tau = rng.randrange(1, p)
        alpha = rng.randrange(1, p)
        beta = rng.randrange(1, p)
        gamma = rng.randrange(1, p)
        delta = rng.randrange(1, p)

        lag = domain.lagrange_coeffs_at(tau)
        u = [0] * num_vars
        v = [0] * num_vars
        w = [0] * num_vars
        for j, (ra, rb, rc) in enumerate(rows):
            lj = lag[j]
            if lj == 0:
                continue
            for col, co in ra.items():
                u[col] = (u[col] + co * lj) % p
            for col, co in rb.items():
                v[col] = (v[col] + co * lj) % p
            for col, co in rc.items():
                w[col] = (w[col] + co * lj) % p

        zt = domain.vanishing_poly_at(tau)
        gamma_inv = pow(gamma, -1, p)
        delta_inv = pow(delta, -1, p)

        h_scalars = []
        cur = zt * delta_inv % p
        for _ in range(domain.n - 1):
            h_scalars.append(cur)
            cur = cur * tau % p

        if self._use_device_keygen(len(rows)):
            gamma_abc = self._fb_mul(
                "g1", [(beta * u[i] + alpha * v[i] + w[i]) % p * gamma_inv % p
                       for i in range(n_inst)], as_host=True)
            l_query = self._fb_mul(
                "g1", [(beta * u[i] + alpha * v[i] + w[i]) % p * delta_inv % p
                       for i in range(n_inst, num_vars)])
            a_query = self._fb_mul("g1", u)
            b_g1_query = self._fb_mul("g1", v)
            b_g2_query = self._fb_mul("g2", v)
            h_query = self._fb_mul("g1", h_scalars)
            small1 = self._fb_mul("g1", [alpha, beta, delta], as_host=True)
            small2 = self._fb_mul("g2", [beta, gamma, delta], as_host=True)
            alpha_g1, beta_g1, delta_g1 = small1
            beta_g2, gamma_g2, delta_g2 = small2
        else:
            from ...msm.host import fixed_base_many

            g1g, g2g, bits = self.cfg.g1_gen, self.cfg.g2_gen, self.Fr.BITS
            gamma_abc = fixed_base_many(
                g1g, [(beta * u[i] + alpha * v[i] + w[i]) % p
                      * gamma_inv % p for i in range(n_inst)], bits)
            l_query = fixed_base_many(
                g1g, [(beta * u[i] + alpha * v[i] + w[i]) % p
                      * delta_inv % p for i in range(n_inst, num_vars)],
                bits)
            a_query = fixed_base_many(g1g, u, bits)
            b_g1_query = fixed_base_many(g1g, v, bits)
            b_g2_query = fixed_base_many(g2g, v, bits)
            h_query = fixed_base_many(g1g, h_scalars, bits)
            alpha_g1, beta_g1, delta_g1 = fixed_base_many(
                g1g, [alpha, beta, delta], bits)
            beta_g2, gamma_g2, delta_g2 = fixed_base_many(
                g2g, [beta, gamma, delta], bits)

        vk = Groth16VK(
            alpha_g1=alpha_g1,
            beta_g2=beta_g2,
            gamma_g2=gamma_g2,
            delta_g2=delta_g2,
            gamma_abc=gamma_abc,
        )
        pk = Groth16PK(
            vk=vk,
            beta_g1=beta_g1,
            delta_g1=delta_g1,
            a_query=a_query,
            b_g1_query=b_g1_query,
            b_g2_query=b_g2_query,
            h_query=h_query,
            l_query=l_query,
            num_instance=n_inst,
            domain_size=domain.n,
        )
        return pk, vk

    # ------------------------------------------------------------------
    def prove(self, pk: Groth16PK, circuit, rng):
        from ..plan import plan_for

        with span("groth16/witness"):
            z, cs, plan = plan_for(pk, lambda: ConstraintSystem(self.Fr),
                                   circuit)
        p = self.Fr.MODULUS
        num_vars = len(z)
        if num_vars != len(pk.a_query):
            raise SNARKError(
                f"circuit shape mismatch: {num_vars} vars vs pk {len(pk.a_query)}")
        if cs is not None:
            bad = cs.first_unsatisfied()
            if bad is not None:
                raise SNARKError(
                    f"unsatisfied constraint {cs.which_is_unsatisfied()}")
            rows = self._matrix_rows(cs)
            n_inst = cs.num_instance
            n_cons = cs.num_constraints
            if plan is not None:
                plan.rows = rows
        else:
            rows = plan.rows
            n_inst = plan.n_inst
            n_cons = plan.n_constraints
        replayed = cs is None

        domain = EvaluationDomain(self.Fr, pk.domain_size)

        # h(x) = (A(x) B(x) - C(x)) / Z_H(x) via coset evaluation
        device = self._use_device(len(rows))
        z_limbs = None
        hybrid = None
        with span("groth16/h_poly"):
            if device:
                import jax.numpy as jnp
                import numpy as np

                from ...ops.fft_tensor import fft_ctx

                fctx = fft_ctx(self.Fr, domain.n)
                z_mont = jnp.asarray(fctx.fp.encode(z))
                if self.dist is not None:
                    # SP: constraint rows sharded over the mesh, z
                    # replicated; nothing gathered until the FFT boundary
                    dmv = getattr(pk, "_dist_mats", None)
                    if dmv is None:
                        dmv = self.dist.matvec(self.Fr, rows, domain.n,
                                               num_vars)
                        pk._dist_mats = dmv
                    evs = jnp.stack([e[: domain.n]
                                     for e in dmv.apply_all(z_mont)])
                else:
                    # device sparse matvec feeding the device FFT
                    # directly (chunked scan: arbitrary nnz)
                    from ...ops.matvec_tensor import matrices_to_device

                    mats = getattr(pk, "_dev_mats", None)
                    if mats is None:
                        mats = matrices_to_device(self.Fr, rows, domain.n,
                                                  num_vars)
                        pk._dev_mats = mats
                    evs = jnp.stack([m.apply(z_mont) for m in mats])
                if replayed:
                    # satisfiability check on device (the host-side
                    # first_unsatisfied() ran only on the synthesis pass)
                    viol = fctx.fp.sub(fctx.fp.mont_mul(evs[0], evs[1]),
                                       evs[2])[:n_cons]
                    if bool(jnp.any(viol)):
                        raise SNARKError(
                            "unsatisfied constraint (replayed witness)")
                dh = (self.dist.h_poly(self.Fr, domain.n)
                      if self.dist is not None else None)
                if dh is not None:
                    # sharded h-poly pipeline over the mesh
                    import numpy as np

                    a_ev, b_ev, c_ev = (
                        fctx.fp.decode(np.asarray(evs[i]))
                        for i in range(3))
                    h = dh.h_poly(a_ev, b_ev, c_ev)
                else:
                    ap = fctx.coset_fft(fctx.ifft(evs))
                    prod = fctx.fp.sub(fctx.fp.mont_mul(ap[0], ap[1]),
                                       ap[2])
                    zh_inv = pow(
                        domain.vanishing_poly_at(domain.coset_shift),
                        -1, p)
                    zh = jnp.asarray(fctx.fp.to_mont_host(zh_inv))
                    h_cos = fctx.fp.mont_mul(
                        prod, jnp.broadcast_to(zh, prod.shape))
                    h = fctx.decode(fctx.coset_ifft(h_cos))
            else:
                from ... import native as _nat

                if _nat.available() and p.bit_length() <= 320:
                    # limb fast path: z is marshalled ONCE; the CSR
                    # matvec, the fused quotient pipeline (7 NTTs +
                    # pointwise in one native call) and the MSM scalars
                    # all consume limbs — no Python-int round-trips
                    mats = getattr(pk, "_host_mats", None)
                    if mats is None:
                        with span("csr_build"):
                            mats = _nat.SpMatrices(p, rows, domain.n)
                        pk._host_mats = mats
                    with span("z_marshal"):
                        z_limbs = _nat.scalars_to_limbs(z)
                    # dispatch the query MSMs to the TPU NOW — they only
                    # need z — from a background thread: the ~100 MB of
                    # schedule uploads ride the tunnel while the host
                    # (pure C++, GIL released) runs matvec + the
                    # quotient pipeline below
                    from concurrent.futures import ThreadPoolExecutor

                    _ex = ThreadPoolExecutor(max_workers=1)
                    hybrid = _ex.submit(self._stream_launch, pk,
                                        z_limbs, n_inst)
                    _ex.shutdown(wait=False)
                    with span("matvec"):
                        a_l, b_l, c_l = mats.apply_all_limbs(z_limbs)
                    zh_inv = pow(
                        domain.vanishing_poly_at(domain.coset_shift),
                        -1, p)
                    try:
                        with span("hpoly"):
                            h_limbs = _nat.hpoly(
                                p, domain.omega, domain.coset_shift, zh_inv,
                                a_l, b_l, c_l,
                                check_rows=n_cons if replayed else 0)
                    except ValueError:
                        raise SNARKError(
                            "unsatisfied constraint (replayed witness)")
                    h = h_limbs[: domain.n - 1]
                else:
                    a_ev = [0] * domain.n
                    b_ev = [0] * domain.n
                    c_ev = [0] * domain.n
                    for j, (ra, rb, rc) in enumerate(rows):
                        a_ev[j] = sum(co * z[col]
                                      for col, co in ra.items()) % p
                        b_ev[j] = sum(co * z[col]
                                      for col, co in rb.items()) % p
                        c_ev[j] = sum(co * z[col]
                                      for col, co in rc.items()) % p
                    if replayed:
                        for j in range(n_cons):
                            if (a_ev[j] * b_ev[j] - c_ev[j]) % p:
                                raise SNARKError(
                                    f"unsatisfied constraint #{j} (replayed)")
                    h = self._h_poly(domain, a_ev, b_ev, c_ev, False)
                    h = h[: domain.n - 1]
        if device:
            # degree of h is n-2; drop the top coefficient (must be ~0)
            h = h[: domain.n - 1]

        r = rng.randrange(p)
        s = rng.randrange(p)

        with span("groth16/msm"):
            return self._prove_commit(pk, n_inst, z, h, r, s,
                                      z_limbs=z_limbs, hybrid=hybrid)

    def _prove_commit(self, pk, n_inst, z, h, r, s, z_limbs=None,
                      hybrid=None):
        from ..msm_dispatch import host_query
        from ...ops.fixed_base import DevicePointVec

        p = self.Fr.MODULUS
        z_digits = None
        zq = z
        if isinstance(pk.a_query, DevicePointVec):
            import jax.numpy as jnp

            from ...ops.msm_tensor import msm_ctx_for

            mctx = msm_ctx_for(pk.a_query.curve, self.Fr.BITS,
                               len(pk.a_query))
            z_digits = jnp.asarray(mctx.digits_from_ints(z))
        elif z_limbs is not None:
            # pre-marshalled limbs shared by the a/b1/b2/l MSMs
            zq = z_limbs

        def msm_q(name, scalars, spn, digits=None):
            if hybrid is not None and name in hybrid:
                with span(spn + "_tpu"):
                    return self._stream_collect(hybrid, name)
            with span(spn):
                return self._msm_any(host_query(pk, name), scalars, digits)

        import numpy as np

        if hybrid is not None and not isinstance(hybrid, dict):
            # background-thread launch (see prove): resolve it here —
            # matvec + hpoly have run under it
            hybrid = hybrid.result()

        # The h-query MSM joins the TPU stream queue as soon as the
        # quotient limbs land; the host G2 MSM below then overlaps all
        # four device-side G1 MSMs.
        h_streamed = (isinstance(h, np.ndarray)
                      and self._stream_launch_h(pk, hybrid, h))

        # Host-side MSMs run FIRST: the TPU is still draining its
        # a/b1/l/h queue while the host tier runs the G2 MSM; the
        # collects below then block only on whatever the device hasn't
        # finished.
        # z_digits only pairs with the FULL z vector (a/b1/b2); l_query's
        # scalars are z[n_inst:], whose digits do not align
        mb2 = msm_q("b_g2_query", zq, "msm_b2", z_digits)
        from ...native import EncodedPoints

        mh = None
        if h_streamed:
            with span("msm_h_tpu"):
                mh = self._stream_collect(hybrid, "h_query")
        else:
            hq = host_query(pk, "h_query")
            if isinstance(hq, (DevicePointVec, EncodedPoints)):
                with span("msm_h"):
                    mh = self._msm_any(hq, h)
            else:
                if isinstance(h, np.ndarray):
                    from ...native import limbs_to_ints

                    h = limbs_to_ints(h)
                nz = [(pt, co) for pt, co in zip(hq, h) if co]
                if nz:
                    with span("msm_h"):
                        mh = self.msm([a for a, _ in nz],
                                      [b for _, b in nz])
        ma = msm_q("a_query", zq, "msm_a", z_digits)
        mb1 = msm_q("b_g1_query", zq, "msm_b1", z_digits)
        ml = msm_q("l_query", zq[n_inst:], "msm_l")

        g_a = pk.vk.alpha_g1 + ma + pk.delta_g1 * r
        g_b2 = pk.vk.beta_g2 + mb2 + pk.vk.delta_g2 * s
        g_b1 = pk.beta_g1 + mb1 + pk.delta_g1 * s
        c_acc = ml if mh is None else ml + mh
        g_c = c_acc + g_a * s + g_b1 * r - pk.delta_g1 * (r * s % p)

        return Groth16Proof(a=g_a, b=g_b2, c=g_c)

    # ------------------------------------------------------------------
    def process_vk(self, vk: Groth16VK) -> Groth16PVK:
        return Groth16PVK(vk=vk, alpha_beta=self.pairing.pairing(vk.alpha_g1, vk.beta_g2))

    def verify_with_processed_vk(self, pvk: Groth16PVK, public_input, proof) -> bool:
        vk = pvk.vk
        xs = [1] + [int(x.n if hasattr(x, "n") else x) for x in public_input]
        if len(xs) != len(vk.gamma_abc):
            raise SNARKError(
                f"input length mismatch: {len(xs)} vs {len(vk.gamma_abc)}")
        acc = self.msm(vk.gamma_abc, xs)
        lhs = self.pairing.multi_pairing(
            [(proof.a, proof.b), (-acc, vk.gamma_g2), (-proof.c, vk.delta_g2)])
        return lhs == pvk.alpha_beta

    def verify(self, vk: Groth16VK, public_input, proof) -> bool:
        return self.verify_with_processed_vk(self.process_vk(vk), public_input, proof)
