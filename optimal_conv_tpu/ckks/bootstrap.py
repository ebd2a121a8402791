"""Split CKKS bootstrapping: ModUp → SubSum → CtoS → EvalMod ∥ … ∥ StoC.

Replaces the fork's modified bootstrapper (SURVEY.md C14–C17):
``NewBootstrapper_mod`` with the split halves ``BootstrappConv_CtoS`` /
``BootstrappConv_StoC`` (/root/reference/eval.go:450,543) that expose the
slots-domain midpoint so ReLU + repacking run between the halves, and
the sparse-slot family (one bootstrapper per log_sparse, selected by the
conv pipeline — /root/reference/main.go:480-505).

Layout contract (matches the fork, verified against its debug oracles
``debugCtoS``/``debugStoC``, /root/reference/eval.go:610-722):
  * full pack (log_sparse=0): CtoS returns TWO ciphertexts; slots of
    ct_up[i] = coeffs[brv(i)], ct_low[i] = coeffs[brv(i)+N/2].
  * sparse (log_sparse≥1): the ciphertext's coefficients live at stride
    2^ls (subring); CtoS returns ONE ciphertext whose slot view holds
    [c'_lo[brv], c'_hi[brv]] tiled with period 2·n_sub.
EvalMod (cosine Chebyshev + double-angle, payload/q0 folded into the
CtoS diagonals and the output scale reinterpretation) runs inside the
CtoS half, so both halves' outputs are plain message slots.

Level walk (boot_params chain): mod_raise→L; CtoS groups consume 3
levels (+1 fold for sparse); EvalMod 9; ReLU region 14 (30-bit primes);
repack 1 (45b); StoC 3 (45b) → level 1 = conv's ECD level.
"""

from __future__ import annotations

import functools

import numpy as np

from ..core import ntt as nttmod
from ..core import modmath as mm
from . import dft
from .context import CkksContext
from .types import Ciphertext, Plaintext
from .polyeval import evaluate_chebyshev, _depth_of as _depth_of_deg

import jax.numpy as jnp


# Sub-phase timing inside ctos/stoc, gated by the same env as the
# pipeline's stage marks (OPTCONV_SYNC_STAGES=1).  Each mark drains the
# device on the given arrays, so the printed seconds are real — this is
# how the 21.9 s steady-state ctos (66% of a flagship layer) and the
# ~1000 s first-ctos-per-process get attributed (round-5; VERDICT #5).
def _phase_t0():
    import os
    import time
    if os.environ.get("OPTCONV_SYNC_STAGES", "0") != "1":
        return None
    return time.perf_counter()


def _phase_mark(name, t0, *arrs):
    if t0 is None:
        return None
    import time
    from ..utils.timing import sync
    sync(*arrs)
    t1 = time.perf_counter()
    print(f"      [{name}: {t1 - t0:.1f}s]", flush=True)
    return t1


# ---------------------------------------------------------------------------
# ModRaise
# ---------------------------------------------------------------------------

def mod_raise(ctx: CkksContext, ct: Ciphertext) -> Ciphertext:
    """Level 0 → max level: centered lift of each residue poly mod q0."""
    p = ctx.params
    assert ct.level == 0
    lmax = p.max_level
    idx = p.q_idx(lmax)
    q0 = p.q_moduli[0]
    ext = p.extender((0,), idx)
    q, _, _, _, _, _, _ = p.ntt.tabs(idx)
    q0_mod = jnp.asarray(np.array([q0 % m for m in p.q_moduli[: lmax + 1]],
                                  dtype=np.uint64)[:, None])
    half = jnp.uint64(q0 // 2)

    def lift(c):
        cc = p.ntt.intt(c, (0,))                       # [1, N] mod q0
        e = ext.extend(cc)                             # [lmax+1, N]
        e = jnp.where(cc > half, mm.sub_mod(e, q0_mod, q), e)
        return p.ntt.ntt(e, idx)

    return Ciphertext(lift(ct.c0), lift(ct.c1), level=lmax, scale=ct.scale)


# ---------------------------------------------------------------------------
# BSGS linear transform
# ---------------------------------------------------------------------------

def _bsgs_bs(keys) -> int:
    """Baby-step modulus for a BSGS split of the diagonal index set.

    The split is g,r = divmod(k, bs) — balanced (√#keys babies) ONLY if
    bs divides the lattice the keys live on.  Grouped DFT stages have
    indices that are all multiples of a large stride (the stage's
    butterfly half-length), so a naive power-of-two bs makes r ≡ 0 for
    every key: 1 baby, #keys giants, and each giant pays a full
    non-hoisted keyswitch plus its own switching key (measured: 8.1 s
    warm / 25.2 s under key churn for ONE CtoS stage at logN=16 — the
    flagship's dominant cost).  Scaling bs by gcd(keys) restores the
    √-balanced split on the stride lattice; for dense key sets
    (gcd = 1) this is the classic split unchanged."""
    ks = sorted(set(keys))
    nz = [k for k in ks if k]
    if not nz:
        return 1
    stride = int(np.gcd.reduce(nz))
    n_eff = len(nz)
    return stride * (1 << max((int(np.ceil(np.sqrt(n_eff))) - 1)
                              .bit_length(), 0))


# per-phase wall seconds accumulated by LinearTransform.__call__ when
# OPTCONV_LT_PROFILE is set (each phase device-synced — REAL time, for
# perf work only; the syncs cost ~30 ms tunnel round-trips each)
LT_PROF: dict[str, float] = {}


class LinearTransform:
    """One-level BSGS diagonal transform, plaintexts precomputed.

    diags: {k: complex vector over the full slot view}; applied at
    `level` with plaintext scale `pt_scale` (default: the level's prime,
    so the ciphertext scale is preserved after the rescale).
    """

    def __init__(self, ctx: CkksContext, diags: dict[int, np.ndarray],
                 level: int, pt_scale: float | None = None,
                 rescale: bool = True, double_hoist: bool | None = None):
        """rescale=False: leave the product at `level` with scale
        ct.scale·pt_scale — the fork's StC packs TWO DFT matrices onto
        one 60-bit level, each at scale 2^30
        (ref_bootstrap_params.json[6].stc_scaling = [[Δ],[Δ,Δ]]): the
        first applies un-rescaled, the second's rescale clears both."""
        self.ctx = ctx
        self.level = level
        self.rescale = rescale
        self.dh = dh_default() if double_hoist is None else double_hoist
        p = ctx.params
        n = p.slots
        if not diags:
            raise ValueError("LinearTransform needs at least one diagonal")
        self.pt_scale = float(p.q_moduli[level]) if pt_scale is None else pt_scale
        keys = sorted(k % n for k in diags)
        self.bs = _bsgs_bs(keys)
        norm = {}
        for k, v in diags.items():
            kk = k % n
            norm[kk] = norm.get(kk, 0) + v
        plan: dict[int, dict[int, Plaintext]] = {}
        for kk, v in norm.items():
            g, r = divmod(kk, self.bs)
            # double-hoist: plaintexts carry the P-limb residues too (the
            # inner products run in the QP basis; +num_p/nq pt memory)
            pt = ctx.encoder.encode_slots(np.roll(v, g * self.bs),
                                          self.pt_scale, level, qp=self.dh)
            plan.setdefault(g * self.bs, {})[r] = pt
        self.babies = sorted({r for d in plan.values() for r in d})
        # pre-stack plaintexts per giant for the fused inner sum; the
        # per-pt objects are NOT retained — at logN=16 a bootstrapper
        # family holds ~8.6 GiB of DFT plaintexts, so a second resident
        # copy would blow the 16 GB HBM by itself.  `sel` indexes each
        # giant's baby subset into the ONE stacked rotation tensor built
        # per apply (stacking per giant cost a ~200 MB concat each).
        bidx = {r: i for i, r in enumerate(self.babies)}
        self.stacked = [
            (g, np.array([bidx[r] for r in sorted(terms)], dtype=np.int32),
             jnp.stack([terms[r].poly for r in sorted(terms)]))
            for g, terms in sorted(plan.items())]

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        """BSGS apply: hoisted baby rotations, then per giant one fused
        (Σ_r rot_r(ct)·pt_{g,r}) kernel, giant rotation, accumulate.

        double_hoist: the babies skip their mod-downs (ctx.
        rotate_hoisted_lazy) — the giant's fused inner kernel multiplies
        the QP-basis keyswitch accumulators by QP-encoded plaintexts and
        divides by P once per GIANT (Bossuat et al. 2021)."""
        ctx = self.ctx
        assert ct.level == self.level, (ct.level, self.level)
        import os
        prof = LT_PROF if os.environ.get("OPTCONV_LT_PROFILE") else None
        if prof is not None:
            from ..utils.timing import sync as _sync
            import time as _time

            def _mark(phase, t0, *arrs):
                if arrs:
                    _sync(*arrs)
                prof[phase] = prof.get(phase, 0.0) + _time.perf_counter() - t0
                return _time.perf_counter()
            # split key-cache work (fetch + regen-on-miss) from compute.
            # INVARIANT (keep in sync by hand): babies use the
            # pre-permuted HOISTED key flavor — exactly what
            # ctx.rotate_hoisted{,_lazy} fetches below — and giants use
            # the plain galois_key flavor fetched by the fused giant
            # kernel; if either compute path changes its key flavor this
            # prefetch warms/measures the wrong keys and key time leaks
            # into the babies/giant_acc phases.
            t = _time.perf_counter()
            karrs = []
            for r in self.babies:
                if r % ctx.params.slots:
                    g = nttmod.rot_to_galois(r, ctx.params.log_n)
                    swk = ctx.galois_key_hoisted(g, self.level)
                    karrs.append(ctx.swk_d1(swk))
            for g, _, _ in self.stacked:
                if g:
                    gg = nttmod.rot_to_galois(g, ctx.params.log_n)
                    karrs.append(ctx.swk_d1(ctx.galois_key(gg, self.level)))
            # drain ONCE on the last handle: regen kernels serialize
            # server-side (FIFO), and each extra host sync is a ~30 ms
            # tunnel round-trip that would inflate the 'keys' phase by
            # ~0.3 s per 11-key stage of pure measurement overhead.
            t = _mark("keys", t, *karrs[-1:])
        if self.dh:
            lazy = ctx.rotate_hoisted_lazy(ct, self.babies)
            c0all = jnp.stack([lazy[r][0] for r in self.babies])
            c1all = jnp.stack([lazy[r][1] for r in self.babies])
            c2all = jnp.stack([lazy[r][2] for r in self.babies])
            if prof is not None:
                t = _mark("babies", t, c0all, c1all, c2all)
        else:
            rots = ctx.rotate_hoisted(ct, self.babies)
            c0all = jnp.stack([rots[r].c0 for r in self.babies])
            c1all = jnp.stack([rots[r].c1 for r in self.babies])
            if prof is not None:
                t = _mark("babies", t, c0all, c1all)
        p = ctx.params
        scale = ct.scale * self.pt_scale
        nq, nqp = self.level + 1, self.level + 1 + p.num_p
        # giant steps with LAZY mod-down: each giant's rotation keyswitch
        # folds into QP-basis running sums; divide by P once at the end
        g0 = None
        aq0 = ap0 = ap1 = None
        n_babies = len(self.babies)
        for g, sel, pts in self.stacked:
            # identity selection (dense BSGS: every giant uses all
            # babies) skips the gather of the stacked rotation tensor
            ident = len(sel) == n_babies and np.array_equal(
                sel, np.arange(n_babies))
            if self.dh:
                inner_f = ctx._jitted(
                    ("lt_inner_dh", self.level, ident),
                    lambda: _build_inner_dh(ctx, self.level, ident))
                i0, i1 = inner_f(c0all, c1all, c2all, jnp.asarray(sel), pts)
            else:
                inner_f = ctx._jitted(
                    ("lt_inner", self.level, ident),
                    lambda: _build_inner(ctx, self.level, ident))
                i0, i1 = inner_f(c0all, c1all, jnp.asarray(sel), pts)
            if prof is not None:
                t = _mark("inner", t, i0, i1)
            if g == 0:
                g0 = (i0, i1)
                continue
            if aq0 is None:
                aq0 = jnp.zeros((nq, p.n), jnp.uint64)
                ap0 = jnp.zeros((nqp, p.n), jnp.uint64)
                ap1 = jnp.zeros((nqp, p.n), jnp.uint64)
            gg = nttmod.rot_to_galois(g, p.log_n)
            aq0, ap0, ap1 = ctx.galois_acc(i0, i1, gg, self.level,
                                           aq0, ap0, ap1)
            if prof is not None:
                t = _mark("giant_acc", t, aq0, ap0, ap1)
        if aq0 is None:                      # single giant at shift 0
            o0, o1 = g0
        else:
            z = jnp.zeros((nq, p.n), jnp.uint64)
            g0c0, g0c1 = g0 if g0 is not None else (z, z)
            o0, o1 = ctx.ks_finish(g0c0, g0c1, aq0, ap0, ap1, self.level)
        out = Ciphertext(o0, o1, level=self.level, scale=scale)
        out = ctx.rescale(out) if self.rescale else out
        if prof is not None:
            _mark("finish", t, out.c0, out.c1)
        return out


def _build_inner(ctx: CkksContext, level: int, identity: bool = False):
    q, qinv, _, _, _, _, _ = ctx.params.ntt.tabs(ctx.params.q_idx(level))

    def f(c0all, c1all, sel, pts):
        if identity:
            c0s, c1s = c0all, c1all
        else:
            c0s = jnp.take(c0all, sel, axis=0)
            c1s = jnp.take(c1all, sel, axis=0)
        t0 = mm.mont_mul(c0s, pts, q, qinv)
        t1 = mm.mont_mul(c1s, pts, q, qinv)
        a0, a1 = t0[0], t1[0]
        for i in range(1, c0s.shape[0]):
            a0 = mm.add_mod(a0, t0[i], q)
            a1 = mm.add_mod(a1, t1[i], q)
        return a0, a1

    return f


def dh_default() -> bool:
    """Double-hoisted BSGS default (env OPTCONV_DOUBLE_HOIST, on unless
    set to 0): baby rotations stay in the QP basis, mod-down runs once
    per giant instead of once per baby (Bossuat et al. 2021 §3.2 —
    the Lattigo-lineage optimization the fork's RotateHoisted call sites
    imply, /root/reference/conv.go:133).  Cost: +num_p/nq plaintext
    memory (the P-limb rows) and the inner products run over nqp limbs."""
    import os
    return os.environ.get("OPTCONV_DOUBLE_HOIST", "1") != "0"


def _build_inner_dh(ctx: CkksContext, level: int, identity: bool = False):
    """Fused double-hoisted giant inner sum + per-giant mod-down:

        (Σ_r φ_r(c0)·pt_r  +  (Σ_r acc0_r·pt_r)/P,   (Σ_r acc1_r·pt_r)/P)

    c0qall is Q-basis [nb, nq, N]; a0all/a1all are the QP-basis lazy
    keyswitch accumulators [nb, nqp, N]; pts is QP-encoded (its first nq
    rows are exactly the Q encoding, params.qp_idx = q_idx + p_idx).
    Rounding: mod-down after the pt-mul differs from pt·mod-down by
    < |pt| per coefficient — far below the keyswitch noise."""
    p = ctx.params
    q, qinv, _, _, _, _, _ = p.ntt.tabs(p.q_idx(level))
    qq, qqinv, _, _, _, _, _ = p.ntt.tabs(p.qp_idx(level))
    md = ctx._mod_down_builder(level)
    nq = level + 1

    def f(c0qall, a0all, a1all, sel, pts):
        if identity:
            c0s, a0s, a1s = c0qall, a0all, a1all
        else:
            c0s = jnp.take(c0qall, sel, axis=0)
            a0s = jnp.take(a0all, sel, axis=0)
            a1s = jnp.take(a1all, sel, axis=0)
        tq = mm.mont_mul(c0s, pts[:, :nq], q, qinv)
        t0 = mm.mont_mul(a0s, pts, qq, qqinv)
        t1 = mm.mont_mul(a1s, pts, qq, qqinv)
        sq, s0, s1 = tq[0], t0[0], t1[0]
        for i in range(1, pts.shape[0]):
            sq = mm.add_mod(sq, tq[i], q)
            s0 = mm.add_mod(s0, t0[i], qq)
            s1 = mm.add_mod(s1, t1[i], qq)
        return mm.add_mod(sq, md(s0), q), md(s1)

    return f


def plan_lt_shapes(params, log_sparse: int = 0,
                   stoc_level: int | None = None) -> list:
    """Every (level, n_babies, sel_len, identity) lt_inner shape a
    ``SplitBootstrapper(log_sparse)`` will jit — host math only (no ctx,
    keys, plaintexts, or device work), for aot_warm cache prewarming.

    Mirrors the CtoS/StoC group walk of SplitBootstrapper.__init__ and
    the baby/giant split of LinearTransform.__init__ exactly (the jitted
    kernel's shape is determined purely by the diagonal key structure)."""
    lay = params.boot_layout
    assert lay is not None
    n = params.slots
    log_nsub = params.log_slots - log_sparse
    n_sub = 1 << log_nsub
    reps = params.slots // n_sub

    def shapes_of(diags_keys, level):
        keys = sorted({k % n for k in diags_keys})
        bs = _bsgs_bs(keys)
        plan: dict[int, list[int]] = {}
        for kk in keys:
            g, r = divmod(kk, bs)
            plan.setdefault(g * bs, []).append(r)
        babies = sorted({r for rs in plan.values() for r in rs})
        bidx = {r: i for i, r in enumerate(babies)}
        out = set()
        for g, rs in sorted(plan.items()):
            sel = [bidx[r] for r in sorted(rs)]
            ident = sel == list(range(len(babies)))
            out.add((level, len(babies), len(sel), ident))
        return out

    shapes: set = set()
    enc_st = [dft.tile(s, reps) for s in dft.encode_stages(log_nsub)]
    n_ctos_levels = lay["ctos"][1] - lay["ctos"][0]
    ctos_groups = n_ctos_levels - (1 if log_sparse > 0 else 0)
    lvl = params.max_level
    for gdiags in dft.group_stages(enc_st, ctos_groups, n):
        shapes |= shapes_of(gdiags.keys(), lvl)
        lvl -= 1

    dec_st = [dft.tile(s, reps) for s in dft.decode_stages(log_nsub)]
    if log_sparse > 0:
        ones = np.ones(n)
        dec_st = [{0: ones, n_sub: ones}] + dec_st
    n_stoc_levels = lay["stoc"][1] - lay["stoc"][0]
    stoc_groups = lay.get("stoc_groups", n_stoc_levels)
    st_lvl = (lay["stoc"][1] - 1) if stoc_level is None else stoc_level
    double_top = stoc_groups - n_stoc_levels if stoc_level is None else 0
    for gi, gdiags in enumerate(dft.group_stages(dec_st, stoc_groups, n)):
        shapes |= shapes_of(gdiags.keys(), st_lvl)
        if gi >= double_top:
            st_lvl -= 1
    return sorted(shapes)


# ---------------------------------------------------------------------------
# EvalMod cosine approximation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def fit_cos_poly(sin_deg: int, k_range: float, double_angle: int,
                 method: str = "cheby", msg_ratio_bits: int = 8,
                 payload_bits: int = 1) -> np.ndarray:
    """Chebyshev-basis coefficients approximating
    cos(2πK/2^r · y − π/2^{r+1}) on y ∈ [-1, 1], the double-angle seed
    of EvalMod (fork: ckks/bettersine, ReLUEvalModuli).

    method='cheby' (production default): plain Chebyshev interpolation
    over the full domain.  Error budget MEASURED at the production
    config (deg 63, K=25, r=2, msg_ratio 2^-8): the composite error
    after the double angles is 2^-25.4 over the valid input set — 12
    bits BELOW the 2^-13.3 sine floor (θ−sinθ distortion) that both
    this and the fork's bettersine (ArcSineDeg 0) sit at, so the
    simpler fit loses nothing (tests/test_evalmod_budget.py pins it).

    method='minimax': Lawson-iterated least squares restricted to the
    valid input set ∪_i [i/K ± ε], ε = 2^{payload_bits-msg_ratio_bits}/K
    — the Han–Ki-style interval fit.  Composite error 2^-33.6 at the
    same degree: +8 bits of headroom that only matter in arcsine mode
    (arcsine_deg > 0 removes the sine floor).  Degree cannot drop:
    deg 47 reaches only 2^-8.7 and deg 31 diverges after the double
    angles, so the fork's deg-63 choice is tight either way.
    """
    r = double_angle
    freq = 2 * np.pi * k_range / (1 << r)
    phi = np.pi / 2 / (1 << r)

    def g(y):
        return np.cos(freq * y - phi)

    if method == "cheby":
        return np.polynomial.chebyshev.Chebyshev.interpolate(
            g, sin_deg, domain=[-1.0, 1.0]).coef
    if method != "minimax":
        raise ValueError(f"sin_method={method!r}: use cheby|minimax")
    kk = int(k_range)
    eps = 2.0 ** (payload_bits - msg_ratio_bits) / k_range
    grid = [np.linspace(i / k_range - eps, i / k_range + eps, 501)
            for i in range(-kk + 1, kk)]
    u = np.concatenate(grid)
    v = np.polynomial.chebyshev.chebvander(u, sin_deg)
    t = g(u)
    w = np.ones(len(u))
    for _ in range(40):                       # Lawson → near-minimax on U
        sol, *_ = np.linalg.lstsq(v * w[:, None], t * w, rcond=None)
        e = np.abs(v @ sol - t)
        w *= np.sqrt(e + 1e-300)
        w /= w.max()
    return sol


# ---------------------------------------------------------------------------
# Split bootstrapper
# ---------------------------------------------------------------------------

class SplitBootstrapper:
    """One instance per log_sparse (the reference's btp..btp5 family)."""

    def __init__(self, ctx: CkksContext, log_sparse: int = 0,
                 k_range: float = 25.0,
                 sin_deg: int = 63, double_angle: int = 2,
                 msg_ratio_bits: int = 8, stoc_level: int | None = None,
                 arcsine_deg: int = 0, sin_method: str = "cheby"):
        """stoc_level: top level of the StoC transforms.  Default (None)
        uses the chain layout's dedicated low StoC levels — the split
        pipeline order (…ReLU → repack → StoC → conv).  The baseline
        ("BL") path instead bootstraps FULLY and applies ReLU after, so
        it sets stoc_level just below EvalMod, leaving the ReLU budget
        under the refreshed ciphertext (reference Bootstrapp,
        /root/reference/test_BL.go:133)."""
        self.ctx = ctx
        self.ls = log_sparse
        p = ctx.params
        self.q0 = p.q_moduli[0]
        # incoming scale: conv sets out_scale = 2^(round(log2 q0)-pow-8),
        # then the pipeline boosts by 2^pow → Δ0 = 2^(round(log2 q0)-8)
        self.delta0 = float(2 ** (round(np.log2(self.q0)) - msg_ratio_bits))
        self.k_range = k_range
        self.double_angle = double_angle
        lay = p.boot_layout
        assert lay is not None, "params not bootstrappable"
        self.log_nsub = p.log_slots - log_sparse
        n_sub = 1 << self.log_nsub
        reps = p.slots // n_sub
        lmax = p.max_level

        # delta_m: EvalMod working scale ≈ the evalmod-region primes
        self.delta_m = float(p.q_moduli[lay["evalmod"][1] - 1])

        # group counts come from the chain layout: CtoS levels (minus one
        # for the sparse fold), StoC levels
        n_ctos_levels = lay["ctos"][1] - lay["ctos"][0]
        n_stoc_levels = lay["stoc"][1] - lay["stoc"][0]
        # stoc_groups > levels ⟹ the top StoC level carries two DFT
        # matrices (fork chain: 3 matrices over 2 sixty-bit levels)
        self.stoc_groups = lay.get("stoc_groups", n_stoc_levels)
        ctos_groups = n_ctos_levels - (1 if log_sparse > 0 else 0)
        # EvalMod runs tight (depth(deg)+r levels, no slack rescale) iff
        # the chain's evalmod region is sized for it — the ref chain's 8
        # levels = depth(63)+2
        n_mod = lay["evalmod"][1] - lay["evalmod"][0]
        # arcsine_deg > 0: apply an odd arcsin(t) series after the
        # double-angle sine, undoing the sin distortion so the payload
        # may sit closer to q0 (smaller msg_ratio_bits) than the fork's
        # 2^-8 sine floor (Lattigo ArcSineDeg; the fork pins it to 0 —
        # this is the headroom option the fork lacks).  Costs
        # depth(arcsine_deg)+1 extra evalmod levels.
        self.arcsine_deg = arcsine_deg
        extra = _depth_of_deg(arcsine_deg) + 1 if arcsine_deg else 0
        need = _depth_of_deg(sin_deg) + double_angle + extra
        self.em_tight = (n_mod == _depth_of_deg(sin_deg) + double_angle)
        assert n_mod >= need, (n_mod, sin_deg, double_angle, arcsine_deg)
        if arcsine_deg:
            # asin(t) = Σ_k (2k)! / (4^k (k!)² (2k+1)) · t^{2k+1}
            from math import comb
            ac = np.zeros(arcsine_deg + 1)
            for k in range(0, (arcsine_deg - 1) // 2 + 1):
                ac[2 * k + 1] = comb(2 * k, k) / (4.0 ** k * (2 * k + 1))
            self._asin_coeffs = ac

        # ---- CtoS groups (inverse DFT stages, bit-rev output) ----------
        enc_st = [dft.tile(s, reps)
                  for s in dft.encode_stages(self.log_nsub)]
        groups = dft.group_stages(enc_st, ctos_groups, p.slots)
        self.ctos_lt: list[LinearTransform] = []
        lvl = lmax
        for gi, gdiags in enumerate(groups):
            last = gi == len(groups) - 1
            if last and log_sparse == 0:
                # fold λ = Δ0/(2·K·q0) (the 1/2 is the conj-split) and the
                # Δm scale switch into the last group
                lam = self.delta0 / (2.0 * k_range * self.q0)
                gdiags = {k: v * lam for k, v in gdiags.items()}
                sc = p.q_moduli[lvl] * self.delta_m / self.delta0
                self.ctos_lt.append(LinearTransform(ctx, gdiags, lvl, sc))
            else:
                self.ctos_lt.append(LinearTransform(ctx, gdiags, lvl))
            lvl -= 1

        if log_sparse > 0:
            # fold level: y = A⊙x + B⊙conj(x), with λ folded in
            lam = self.delta0 / (k_range * self.q0 * (1 << log_sparse))
            m_lo = np.zeros(p.slots)
            per = np.zeros(2 * n_sub)
            per[:n_sub] = 1.0
            m_lo = np.tile(per, p.slots // (2 * n_sub))
            m_hi = 1.0 - m_lo
            self.fold_a = (m_lo - 1j * m_hi) / 2.0 * lam
            self.fold_b = (m_lo + 1j * m_hi) / 2.0 * lam
            self.fold_level = lvl
            sc = p.q_moduli[lvl] * self.delta_m / self.delta0
            self.fold_a_pt = ctx.encoder.encode_slots(self.fold_a, sc, lvl)
            self.fold_b_pt = ctx.encoder.encode_slots(self.fold_b, sc, lvl)
            lvl -= 1
        self.post_ctos_level = lvl

        # ---- EvalMod: cosine chebyshev + double angle ------------------
        self.sin_cheb = fit_cos_poly(sin_deg, k_range, double_angle,
                                     method=sin_method,
                                     msg_ratio_bits=msg_ratio_bits)

        # ---- StoC groups (forward DFT stages, bit-rev input) -----------
        dec_st = [dft.tile(s, reps) for s in dft.decode_stages(self.log_nsub)]
        if log_sparse > 0:
            # prepend unfold F: x = d0⊙y + d1⊙rot(y, n_sub)
            d0 = np.tile(np.concatenate([np.ones(n_sub), 1j * np.ones(n_sub)]),
                         reps // 2)
            d1 = np.tile(np.concatenate([1j * np.ones(n_sub), np.ones(n_sub)]),
                         reps // 2)
            dec_st = [{0: d0, n_sub: d1}] + dec_st
        s_groups = dft.group_stages(dec_st, self.stoc_groups, p.slots)
        st_lvl = (lay["stoc"][1] - 1) if stoc_level is None else stoc_level
        self.stoc_lt: list[LinearTransform] = []
        double_top = self.stoc_groups - (lay["stoc"][1] - lay["stoc"][0]) \
            if stoc_level is None else 0
        for gi, gdiags in enumerate(s_groups):
            if gi < double_top:
                # two matrices share the top level: first at √q without
                # rescale, partner's rescale clears the product scale
                sq = float(np.sqrt(p.q_moduli[st_lvl]))
                self.stoc_lt.append(LinearTransform(ctx, gdiags, st_lvl,
                                                    pt_scale=sq,
                                                    rescale=False))
                continue
            if gi == double_top and double_top > 0:
                sq = float(p.q_moduli[st_lvl]) / float(
                    np.sqrt(p.q_moduli[st_lvl]))
                self.stoc_lt.append(LinearTransform(ctx, gdiags, st_lvl,
                                                    pt_scale=sq))
            else:
                self.stoc_lt.append(LinearTransform(ctx, gdiags, st_lvl))
            st_lvl -= 1
        self.post_stoc_level = st_lvl

    # ------------------------------------------------------------------

    def ctos(self, ct: Ciphertext):
        """(ct level 0, scale Δ0·2^-?) → slot-domain message ciphertext(s).

        Returns (ct_up, ct_low) for full pack, (ct, None) for sparse.
        Output values are the plaintext coefficients (÷2^pow still
        applied by caller convention), at the ReLU region's scale.
        """
        ctx = self.ctx
        p = ctx.params
        t0 = _phase_t0()
        ct = mod_raise(ctx, ct)
        # SubSum: project onto the stride-2^ls subring (kills inter-stride
        # garbage; scales kept coeffs by 2^ls — folded into the diagonals)
        for j in range(self.ls):
            g = (2 * p.n) // (1 << (j + 1)) + 1
            ct = ctx.add(ct, ctx.apply_galois(ct, g))
        t0 = _phase_mark("ctos.raise+subsum", t0, ct.c0)
        for i, lt in enumerate(self.ctos_lt):
            ct = lt(ct)
            t0 = _phase_mark(f"ctos.lt{i}", t0, ct.c0)
        if self.ls == 0:
            cj = ctx.conjugate(ct)
            up = ctx.add(ct, cj)
            low = ctx.div_by_i(ctx.sub(ct, cj))
            up = self._eval_mod(up)
            low = self._eval_mod(low)
            _phase_mark("ctos.evalmod2x", t0, up.c0, low.c0)
            return up, low
        cj = ctx.conjugate(ct)
        a = ctx.mul_plain(ct, self.fold_a_pt)
        b = ctx.mul_plain(cj, self.fold_b_pt)
        folded = ctx.rescale(ctx.add(a, b))
        t0 = _phase_mark("ctos.fold", t0, folded.c0)
        out = self._eval_mod(folded)
        _phase_mark("ctos.evalmod", t0, out.c0)
        return out, None

    def _eval_mod(self, ct: Ciphertext) -> Ciphertext:
        """values y = payload/(K·q0) → values payload/Δ0, scale ≈ Δ."""
        ctx = self.ctx
        p = ctx.params
        ct = ct.with_scale(self.delta_m)  # absorb float drift of λ folding
        # back out per-double-angle scales so the final scale lands at
        # Δ·(q0/(2π·Δ0)) before the exact reinterpretation below
        r = self.double_angle
        depth = _cheb_depth(len(self.sin_cheb) - 1) - (1 if self.em_tight
                                                       else 0)
        lc = ct.level - depth
        s_final = p.scale * self.q0 / (2 * np.pi * self.delta0)
        # with an arcsine pass below, the double-angle chain lands
        # sin(θ) at the working scale and the asin evaluation targets
        # s_final itself
        scales = [p.scale if self.arcsine_deg else s_final]
        for i in range(r):
            prev = np.sqrt(scales[-1] * p.q_moduli[lc - r + 1 + i])
            scales.append(prev)
        s_t = scales[-1]
        t0 = _phase_t0()
        c = evaluate_chebyshev(ctx, ct, self.sin_cheb, -1.0, 1.0, s_t,
                               tight=self.em_tight)
        t0 = _phase_mark("evalmod.cheb", t0, c.c0)
        for i in range(r):
            sq = ctx.rescale(ctx.mul_ct(c, c))
            c = ctx.add_const(ctx.mul_scalar_int(sq, 2), -1.0)
        t0 = _phase_mark("evalmod.dblang", t0, c.c0)
        if self.arcsine_deg:
            # θ = asin(sin θ) exactly (|θ| = 2π·|payload|/q0 < π/2):
            # removes the sin distortion instead of the ≈x linearization
            from .polyeval import evaluate_poly
            c = evaluate_poly(ctx, c, self._asin_coeffs,
                              target_scale=s_final)
        # c ≈ sin(2πK y) = sin(2π payload/q0) ≈ 2π·payload/q0 at scale s
        # reinterpretation: payload/Δ0 at scale s·2πΔ0/q0  (exact, free)
        return c.with_scale(c.scale * 2 * np.pi * self.delta0 / self.q0)

    # ------------------------------------------------------------------

    def stoc(self, ct0: Ciphertext, ct1: Ciphertext | None) -> Ciphertext:
        """Slot-domain message ct(s) → coefficient-packed ct at level 1."""
        ctx = self.ctx
        if self.ls == 0:
            assert ct1 is not None
            ct = ctx.add(ct0, ctx.mul_by_i(ct1))
        else:
            ct = ct0
        lvl0 = self.stoc_lt[0].level
        if ct.level > lvl0:
            ct = ctx.drop_level(ct, ct.level - lvl0)
        t0 = _phase_t0()
        for i, lt in enumerate(self.stoc_lt):
            ct = lt(ct)
            t0 = _phase_mark(f"stoc.lt{i}", t0, ct.c0)
        return ct


def _cheb_depth(deg: int) -> int:
    d = 0
    while (1 << d) < deg + 1:
        d += 1
    return d + 1


class BootstrapperFamily:
    """Lazy {log_sparse: SplitBootstrapper} with bounded device residency.

    The reference keeps all 5 bootstrappers resident for the whole run
    (btp..btp5, /root/reference/main.go:480-505) — part of its ~100 GB
    footprint.  On a 16 GB HBM chip the family's DFT plaintexts alone
    (~8.6 GiB at logN=16) don't fit next to the switching keys, so
    bootstrappers are built on first use and at most `max_live` stay
    resident (block-structured models touch one log_sparse for many
    consecutive layers, so eviction is rare: ~5 rebuilds per ResNet).
    """

    def __init__(self, ctx: CkksContext, boot_kwargs: dict | None = None,
                 max_live: int | None = None):
        import os
        from collections import OrderedDict
        self.ctx = ctx
        self.kwargs = dict(boot_kwargs or {})
        if max_live is None:
            max_live = int(os.environ.get(
                "OPTCONV_BTP_LIVE", "2" if ctx.params.log_n >= 15 else "8"))
        self.max_live = max_live
        self._live: "OrderedDict[int, SplitBootstrapper]" = OrderedDict()

    def __getitem__(self, ls: int) -> SplitBootstrapper:
        btp = self._live.get(ls)
        if btp is not None:
            self._live.move_to_end(ls)
            return btp
        while len(self._live) >= self.max_live:
            self._live.popitem(last=False)
            # actually release the evicted family's device tables before
            # building the next one — dropping the python refs alone
            # leaves the HBM buffers to a later GC, and the new family's
            # allocations race it to RESOURCE_EXHAUSTED (round-3 flagship
            # OOM at the first ls switch)
            import gc
            gc.collect()
        import time
        t0 = time.perf_counter()
        btp = SplitBootstrapper(self.ctx, log_sparse=ls, **self.kwargs)
        # host-side wall time: diagonal encode + (async) table upload —
        # the uploads drain into the first ctos apply
        print(f"    btp family ls={ls} built in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        self._live[ls] = btp
        return btp
