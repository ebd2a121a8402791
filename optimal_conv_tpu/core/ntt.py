"""Negacyclic NTT/iNTT over RNS limb arrays, plus Galois automorphisms.

Replaces ``ring/ring_ntt.go`` + ``ring/ring_automorphism.go`` of the Go
Lattigo fork consumed by dwkim606/optimal_conv (SURVEY.md C2/C3), but
designed for TPU: polynomials are ``[L, N]`` uint64 arrays (limb-major);
each butterfly stage is one fused elementwise pass over the whole array
(VPU-bound), expressed with static reshapes so XLA sees ``2·logN``
fixed-shape elementwise kernels per transform.  The twist by the 2N-th
root ψ is merged into the twiddle tables (Longa–Naehrig), so negacyclic
wrap-around needs no separate pre/post pass.

Layout conventions:
* Forward NTT: natural-order coefficients → **bit-reversed** evaluation
  order.  NTT-domain data stays bit-reversed everywhere (pointwise ops
  don't care; the automorphism permutation accounts for it).
* Position ``j`` of the NTT output holds ``p(ψ^{e(j)})`` with
  ``e(j) = 2·brv(j) + 1`` (verified at table-build time).  A Galois
  automorphism ``X → X^g`` is then the NTT-domain permutation
  ``out[j] = in[pos(e(j)·g mod 2N)]``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import modmath as mm

# 'auto' backend: widest limb stack the four-step MXU transform may
# take per call (see NttContext._resolved_backend); wider calls use the
# compile-light looped backend.
_MXU_MAX_LIMBS = int(os.environ.get("OPTCONV_MXU_MAX_LIMBS", "12"))
# scan-over-limb-groups MXU path for stacks wider than _MXU_MAX_LIMBS
# (replaces the xla_loop fallback when enabled): the compiled body
# covers OPTCONV_MXU_SCAN_GROUP limbs, so remote compile time stays
# bounded while the MXU still gets the matmul formulation.
# MEASURED (round 3, v5e, [32, 2^16]): compile 37 s (vs >50 min
# unrolled) but runtime 17.5 ms/transform vs xla_loop's 5.2 ms — the
# byte-plane matmuls do ~8× redundant MXU work per limb and the scan
# serializes groups, so the loop backend KEEPS the wide-stack default
# and this stays opt-in.
_MXU_SCAN = os.environ.get("OPTCONV_MXU_SCAN", "0") == "1"
_MXU_SCAN_GROUP = int(os.environ.get("OPTCONV_MXU_SCAN_GROUP", "7"))
# wide-stack looped-transform schedule:
#   'roll'    — the round-2 uniform-stage body (dynamic-shift rolls).
#               DEFAULT: measured fastest (fwd 6.2 / inv 5.8 ms at
#               [32, 2^16] on v5e, of which ~3.4 ms is the fixed
#               per-dispatch floor — the marginal per-stage cost
#               ~0.19 ms is already near the HBM roofline).
#   'pease'   — constant-geometry (Pease) stages: every stage reads the
#               two N/2 halves (fwd) or even/odd pairs (inv) and writes
#               with ONE static interleave/concat — no dynamic-shift
#               rolls at all.  Per-stage twiddles are contiguous
#               slice+tile of the same psi_br/ipsi_br tables (the
#               Pease→in-place position map at stage s is a bit
#               rotation, under which the in-place block index reduces
#               to k mod 2^s fwd / j mod h inv); bit-identical to the
#               in-place network, natural→bit-rev order preserved.
#               MEASURED DEAD END on this backend (round 4): the
#               lane-axis interleave is a cross-lane relayout Mosaic
#               executes very slowly (one static interleave stage:
#               44 ms!); fwd 7.0 / inv 13.9 ms under fori_loop.  Kept
#               opt-in for future backends where relayout is cheap.
_WIDE_NTT = os.environ.get("OPTCONV_WIDE_NTT", "roll")


def bit_reverse_perm(n: int) -> np.ndarray:
    """Permutation p with p[i] = bit-reversal of i at width log2(n)."""
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(logn):
        out |= ((idx >> b) & 1) << (logn - 1 - b)
    return out.astype(np.int64)


def _pow_table(base: int, q: int, n: int) -> np.ndarray:
    """[base^0, base^1, …, base^{n-1}] mod q as uint64 (host-side)."""
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * base % q
    return out


@functools.lru_cache(maxsize=None)
def _tables_for_prime(q: int, log_n: int) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(psi_br_mont[N], ipsi_br_mont[N], n_inv_mont, psi) for one prime."""
    n = 1 << log_n
    psi = mm.root_of_unity(q, 2 * n)
    r = (1 << 64) % q
    br = bit_reverse_perm(n)
    pows = _pow_table(psi, q, n)            # psi^j
    inv_psi = pow(psi, -1, q)
    ipows = _pow_table(inv_psi, q, n)       # psi^-j
    psi_br = pows[br]
    ipsi_br = ipows[br]
    # to Montgomery form (host-side, python ints are fine here)
    psi_br_m = (psi_br.astype(object) * r % q).astype(np.uint64)
    ipsi_br_m = (ipsi_br.astype(object) * r % q).astype(np.uint64)
    n_inv_m = pow(n, -1, q) * r % q
    return psi_br_m, ipsi_br_m, n_inv_m, psi


class NttContext:
    """Precomputed NTT tables for a list of RNS moduli at ring degree 2^log_n.

    All tables are stacked limb-major so a transform over ``[L, N]`` data
    is a single vectorized pass per stage across every limb at once.
    """

    def __init__(self, moduli: list[int], log_n: int):
        self.log_n = log_n
        self.n = 1 << log_n
        self.moduli = [int(q) for q in moduli]
        L = len(self.moduli)

        psi_tab = np.empty((L, self.n), dtype=np.uint64)
        ipsi_tab = np.empty((L, self.n), dtype=np.uint64)
        ninv = np.empty((L, 1), dtype=np.uint64)
        self.psi = []
        for i, q in enumerate(self.moduli):
            p, ip, nim, psi = _tables_for_prime(q, log_n)
            psi_tab[i] = p
            ipsi_tab[i] = ip
            ninv[i, 0] = nim
            self.psi.append(psi)

        # host-side master tables; sliced per static limb subset on demand
        self._np_q = np.array(self.moduli, dtype=np.uint64)[:, None]
        self._np_qinv = np.array([mm.mont_qinv(q) for q in self.moduli],
                                 dtype=np.uint64)[:, None]
        self._np_r2 = np.array([mm.mont_r2(q) for q in self.moduli],
                               dtype=np.uint64)[:, None]
        self._np_r1 = np.array([(1 << 64) % q for q in self.moduli],
                               dtype=np.uint64)[:, None]
        self._np_psi = psi_tab
        self._np_ipsi = ipsi_tab
        self._np_ninv = ninv
        self._cache: dict = {}

        all_idx = tuple(range(L))
        (self.q, self.qinv, self.r2, self.r1, self.psi_br_mont,
         self.ipsi_br_mont, self.n_inv_mont) = self.tabs(all_idx)

        # transform backend:
        #   'xla'      — unrolled reshape stages: fastest runtime, but the
        #                remote XLA-TPU helper needs minutes per enclosing
        #                executable at logN≥14 (measured 6 min for a bare
        #                [34, 2^16] forward transform).
        #   'xla_loop' — fori_loop uniform stages (see _ntt_fwd_loop):
        #                compile-light, ~1.5-2× runtime; 'auto' picks it
        #                per call for wide limb stacks at logN ≥ 14
        #                (_resolved_backend).
        #   'pallas'   — fused Mosaic kernels (core/pallas_ntt.py):
        #                bit-exact but measured slower on this backend and
        #                recompiled per enclosing executable; opt-in only.
        # Override with OPTCONV_NTT_BACKEND=xla|xla_loop|pallas|auto.
        import os
        self.backend = os.environ.get("OPTCONV_NTT_BACKEND", "auto")
        if self.backend not in ("auto", "xla", "xla_loop", "mxu", "pallas"):
            raise ValueError(
                f"OPTCONV_NTT_BACKEND={self.backend!r}: "
                "use auto|xla|xla_loop|mxu|pallas")
        # mxu byte-plane policy: 'uniform' = 8 planes for every limb;
        # 'auto' = bucket limbs by width and run 30/45/55-bit limbs with
        # 4/6/7 planes (less int32 intermediate traffic, bit-identical).
        self._mxu_nb = os.environ.get("OPTCONV_MXU_NB", "uniform")
        if self._mxu_nb not in ("uniform", "auto"):
            raise ValueError(f"OPTCONV_MXU_NB={self._mxu_nb!r}: "
                             "use uniform|auto")
        self._pallas_tabs = None
        self._loop_np = None
        self._loop_cache: dict = {}
        self._mxu_tabs = None

    def _resolved_backend(self, idx: tuple[int, ...] | None = None) -> str:
        """Backend for one transform call over `idx` limbs.

        'auto' resolves PER CALL at logN≥14: the four-step MXU transform
        compiles fast and runs fastest on narrow limb sets, but its
        byte-plane HLO grows superlinearly with limb count on the remote
        XLA-TPU helper (measured: level-27 [34,2^16] decompose-NTT never
        finished in 50 min as MXU vs 24 s as the looped backend) — so
        wide stacks (bootstrap CtoS/EvalMod regions) take the
        compile-light uniform-stage loop and narrow ones (conv/pack/StoC
        levels, the latency-critical hot path) keep the MXU form.  All
        backends are bit-identical (tests/test_mxu_ntt.py,
        test_ntt_loop.py), so mixing per call is safe."""
        if self.backend != "auto":
            return self.backend
        if self.log_n < 14:
            return "xla"
        if idx is not None and len(idx) <= _MXU_MAX_LIMBS:
            return "mxu"
        # wide stacks: scan-over-limb-groups MXU (bounded compile) when
        # enabled, else the uniform-stage loop
        return "mxu_scan" if _MXU_SCAN else "xla_loop"

    def _mxu(self):
        if self._mxu_tabs is None:
            from . import mxu_ntt
            self._mxu_tabs = mxu_ntt.MxuNttTables(self.moduli, self.log_n,
                                                  self.psi)
        return self._mxu_tabs

    def _pallas_active(self, idx: tuple[int, ...] | None = None) -> bool:
        return self._resolved_backend(idx) == "pallas" and self.log_n >= 8

    def _loop_active(self, idx: tuple[int, ...] | None = None) -> bool:
        return (self._resolved_backend(idx) == "xla_loop"
                and self.log_n > _LOG_B)

    def _loop_tabs(self, idx: tuple[int, ...]):
        """Sliced looped-transform twiddle planes for a static limb subset."""
        got = self._loop_cache.get(idx)
        if got is None:
            if self._loop_np is None:
                self._loop_np = _build_loop_tables(
                    self.moduli, self.psi, self.log_n)
            sel = list(idx)
            t = self._loop_np
            with jax.ensure_compile_time_eval():
                got = tuple(jnp.asarray(t[k][:, sel] if t[k].ndim == 3
                                        else t[k][sel])
                            for k in ("twA", "f2", "f1", "itwB2", "itwB1",
                                      "itwA", "ninv"))
            self._loop_cache[idx] = got
        return got

    def _ptabs(self):
        if self._pallas_tabs is None:
            from . import pallas_ntt
            self._pallas_tabs = pallas_ntt.PallasNttTables(
                self.moduli, self.log_n, self.psi)
        return self._pallas_tabs

    def tabs(self, idx: tuple[int, ...]):
        """(q, qinv, r2, r1, psi, ipsi, ninv) jnp tables for a static limb subset."""
        got = self._cache.get(idx)
        if got is None:
            sel = list(idx)
            # ensure_compile_time_eval: this cache may first be populated
            # inside a jit trace; the tables must be concrete constants,
            # never tracers (they are reused across compilations).
            with jax.ensure_compile_time_eval():
                got = tuple(jnp.asarray(t[sel]) for t in (
                    self._np_q, self._np_qinv, self._np_r2, self._np_r1,
                    self._np_psi, self._np_ipsi, self._np_ninv))
            self._cache[idx] = got
        return got

    # -- transforms -------------------------------------------------------

    def ntt(self, a: jnp.ndarray, idx: tuple[int, ...] | None = None) -> jnp.ndarray:
        """Forward negacyclic NTT.  a: [..., l, N] natural order → bit-rev.

        idx: which context limbs the l rows of `a` correspond to
        (static); defaults to the first l limbs.
        """
        idx = tuple(range(a.shape[-2])) if idx is None else idx
        if self._pallas_active(idx):
            import jax as _jax
            from . import pallas_ntt
            interp = _jax.devices()[0].platform != "tpu"
            return pallas_ntt.transform(a, idx, self._ptabs(), False, interp)
        if self._loop_active(idx):
            if _WIDE_NTT == "pease":
                q, qinv, _, _, psi, _, _ = self.tabs(idx)
                return _ntt_fwd_pease(a, psi, q, qinv, self.log_n)
            twA, f2, f1, _, _, _, _ = self._loop_tabs(idx)
            q, qinv, _, _, _, _, _ = self.tabs(idx)
            return _ntt_fwd_loop(a, twA, f2, f1, q, qinv, self.log_n)
        bk = self._resolved_backend(idx)
        if bk in ("mxu", "mxu_scan"):
            return self._mxu_transform(a, idx, inverse=False,
                                       scan=bk == "mxu_scan")
        q, qinv, _, _, psi, _, _ = self.tabs(idx)
        return _ntt_fwd(a, psi, q, qinv, self.log_n)

    def intt(self, a: jnp.ndarray, idx: tuple[int, ...] | None = None) -> jnp.ndarray:
        """Inverse negacyclic NTT.  a: [..., l, N] bit-rev → natural order."""
        idx = tuple(range(a.shape[-2])) if idx is None else idx
        if self._pallas_active(idx):
            import jax as _jax
            from . import pallas_ntt
            interp = _jax.devices()[0].platform != "tpu"
            return pallas_ntt.transform(a, idx, self._ptabs(), True, interp)
        if self._loop_active(idx):
            if _WIDE_NTT == "pease":
                q, qinv, _, _, _, ipsi, ninv = self.tabs(idx)
                return _ntt_inv_pease(a, ipsi, ninv, q, qinv, self.log_n)
            _, _, _, itwB2, itwB1, itwA, ninv = self._loop_tabs(idx)
            q, qinv, _, _, _, _, _ = self.tabs(idx)
            return _ntt_inv_loop(a, itwB2, itwB1, itwA, ninv, q, qinv,
                                 self.log_n)
        bk = self._resolved_backend(idx)
        if bk in ("mxu", "mxu_scan"):
            return self._mxu_transform(a, idx, inverse=True,
                                       scan=bk == "mxu_scan")
        q, qinv, _, _, _, ipsi, ninv = self.tabs(idx)
        return _ntt_inv(a, ipsi, ninv, q, qinv, self.log_n)

    def _mxu_transform(self, a: jnp.ndarray, idx: tuple[int, ...],
                       inverse: bool, scan: bool = False) -> jnp.ndarray:
        """Four-step MXU transform, optionally partitioned into byte-width
        buckets (OPTCONV_MXU_NB=auto) so narrow limbs use fewer int8
        planes.  Bit-identical across policies."""
        from . import mxu_ntt
        tabs = self._mxu()
        if self._mxu_nb == "auto":
            parts = tabs.buckets(idx)
        else:
            parts = [(tuple(range(len(idx))), 8)]

        def one(sub, sub_idx, nb):
            if scan:
                # wide stack: scan over limb groups (bounded compile)
                g = tabs.group_scan(sub_idx, nb, _MXU_SCAN_GROUP,
                                    self._np_q, self._np_qinv)
                if inverse:
                    return mxu_ntt._mxu_inv_scan(
                        sub, g[5], g[6], g[7], g[8], g[9], g[10], g[11],
                        g[12], g[13], g[14], self.log_n, self.log_n - 8)
                return mxu_ntt._mxu_fwd_scan(
                    sub, g[0], g[1], g[2], g[3], g[4], g[10], g[11], g[12],
                    g[13], g[14], self.log_n, self.log_n - 8)
            g = tabs.group(sub_idx, nb)
            q, qinv, _, _, _, _, _ = self.tabs(sub_idx)
            if inverse:
                return mxu_ntt._mxu_inv(sub, g[5], g[6], g[7], g[8], g[9],
                                        g[10], g[11], g[12], q, qinv,
                                        self.log_n, self.log_n - 8)
            return mxu_ntt._mxu_fwd(sub, g[0], g[1], g[2], g[3], g[4],
                                    g[10], g[11], g[12], q, qinv,
                                    self.log_n, self.log_n - 8)

        if len(parts) == 1:
            return one(a, idx, parts[0][1])
        outs = []
        order: list[int] = []
        for pos, nb in parts:
            sub = jnp.take(a, jnp.asarray(np.array(pos)), axis=-2)
            outs.append(one(sub, tuple(idx[p] for p in pos), nb))
            order += list(pos)
        inv = np.argsort(np.asarray(order))
        return jnp.take(jnp.concatenate(outs, axis=-2),
                        jnp.asarray(inv), axis=-2)


# ---------------------------------------------------------------------------
# looped uniform-stage transforms (compile-light path for large N)
# ---------------------------------------------------------------------------
#
# The unrolled reshape-stage transforms below generate ~2·logN large
# fused stages per transform; the remote XLA-TPU helper needs minutes
# per enclosing executable at logN=16 (measured: a bare [34, 2^16]
# forward NTT ≈ 6 min — the dominant cold-compile cost of the whole
# evaluator).  The looped path views coefficients as [A, B] (B = 128
# lanes), runs ONE traced stage body per phase under lax.fori_loop
# (roll + mask butterflies, dynamic shifts), and reads per-stage
# twiddles from small precomputed planes:
#   phase A (spans ≥ B): twiddle depends only on i1 → [SA, L, A]
#   phase B (spans < B): psi_br[m+b] factorizes (exponent algebra of
#     ψ^brv) into F2[i1]·F1[i2] → [SB, L, A] and [SB, L, B]
# Bit-identical to the unrolled path (same butterfly network, same
# Montgomery arithmetic) — only the schedule differs.

_LOG_B = 7           # B = 128 = one TPU lane tile


def _build_loop_tables(moduli, psi_list, log_n):
    """Per-limb host-side twiddle planes for the looped transforms.

    Returns dict of numpy arrays:
      twA  [SA, L, A]   fwd phase-A planes      (psi_br[2^s + (i1>>(la-s))])
      f2   [SB, L, A]   fwd phase-B row factor
      f1   [SB, L, B]   fwd phase-B lane factor
      itwB2/itwB1/itwA  inverse counterparts
      ninv [L, 1]       n^-1 (Montgomery)
    """
    n = 1 << log_n
    B = 1 << _LOG_B
    A = n // B
    la = log_n - _LOG_B
    L = len(moduli)
    brv = bit_reverse_perm(n)

    def brv_w(x, bits):
        out = np.zeros_like(x)
        xx = x.copy()
        for _ in range(bits):
            out = (out << 1) | (xx & 1)
            xx >>= 1
        return out

    i1 = np.arange(A, dtype=np.int64)
    i2 = np.arange(B, dtype=np.int64)
    brv_i1 = brv_w(i1, la)

    twA = np.empty((la, L, A), dtype=np.uint64)
    f2 = np.empty((_LOG_B, L, A), dtype=np.uint64)
    f1 = np.empty((_LOG_B, L, B), dtype=np.uint64)
    itwB2 = np.empty((_LOG_B, L, A), dtype=np.uint64)
    itwB1 = np.empty((_LOG_B, L, B), dtype=np.uint64)
    itwA = np.empty((la, L, A), dtype=np.uint64)
    ninv = np.empty((L, 1), dtype=np.uint64)

    for li, (q, ps) in enumerate(zip(moduli, psi_list)):
        q = int(q)
        r1 = (1 << 64) % q
        ips = pow(ps, -1, q)
        ninv[li, 0] = pow(n, -1, q) * r1 % q

        def pw(base, e):
            return pow(base, int(e) % (2 * n), q) * r1 % q

        # fwd phase A, stage s (m = 2^s blocks): psi_br[m + (i1 >> (la-s))]
        for s in range(la):
            idx = (1 << s) + (i1 >> (la - s))
            twA[s, li] = np.array([pw(ps, brv[j]) for j in idx], dtype=np.uint64)
        # fwd phase B, stage s (global k = la+s):
        #   F2[i1] = ψ^{brv_la(i1) << (logn-k)}
        #   F1[i2] = ψ^{(1 + 2(brv_s(i2>>(log_b-s)) << la)) << (logn-1-k)}
        for s in range(_LOG_B):
            k = la + s
            f2[s, li] = np.array(
                [pw(ps, int(b) << (log_n - k)) for b in brv_i1], dtype=np.uint64)
            blk2 = i2 >> (_LOG_B - s)
            bb = brv_w(blk2, s)
            f1[s, li] = np.array(
                [pw(ps, (1 + 2 * (int(b) << la)) << (log_n - 1 - k))
                 for b in bb], dtype=np.uint64)
        # inverse phase B', stage j (t = 2^j; h = n >> (j+1); k = logn-1-j):
        for j in range(_LOG_B):
            k = log_n - 1 - j
            s_low = _LOG_B - 1 - j          # bits of the i2-block index
            itwB2[j, li] = np.array(
                [pw(ips, int(b) << (log_n - k)) for b in brv_i1], dtype=np.uint64)
            blk2 = i2 >> (j + 1)
            bb = brv_w(blk2, s_low)
            itwB1[j, li] = np.array(
                [pw(ips, (1 + 2 * (int(b) << la)) << (log_n - 1 - k))
                 for b in bb], dtype=np.uint64)
        # inverse phase A', stage j2 (h = A >> (j2+1)): ipsi_br[h + (i1>>(j2+1))]
        for j2 in range(la):
            idx = (A >> (j2 + 1)) + (i1 >> (j2 + 1))
            itwA[j2, li] = np.array([pw(ips, brv[j]) for j in idx],
                                    dtype=np.uint64)
    return dict(twA=twA, f2=f2, f1=f1, itwB2=itwB2, itwB1=itwB1, itwA=itwA,
                ninv=ninv)


@functools.partial(jax.jit, static_argnames="log_n")
def _ntt_fwd_loop(a, twA, f2, f1, q, qinv, log_n):
    n = 1 << log_n
    B = 1 << _LOG_B
    A = n // B
    la = log_n - _LOG_B
    shape = a.shape
    x = a.reshape(shape[:-1] + (A, B))
    q3 = q[..., None]
    qi3 = qinv[..., None]
    iA = jax.lax.broadcasted_iota(jnp.uint32, (A, 1), 0)
    iB = jax.lax.broadcasted_iota(jnp.uint32, (1, B), 1)

    def bodyA(s, x):
        tw = jax.lax.dynamic_index_in_dim(twA, s, 0, keepdims=False)[..., None]
        sv = mm.mont_mul(x, tw, q3, qi3)
        shift = jnp.int32(A) >> (s + 1)
        down = jnp.roll(sv, -shift, axis=-2)
        up = jnp.roll(x, shift, axis=-2)
        bit = (iA >> (jnp.uint32(la - 1) - s.astype(jnp.uint32))) & 1
        return jnp.where(bit == 0, mm.add_mod(x, down, q3),
                         mm.sub_mod(up, sv, q3))

    x = jax.lax.fori_loop(0, la, bodyA, x)

    def bodyB(s, x):
        g2 = jax.lax.dynamic_index_in_dim(f2, s, 0, keepdims=False)[..., None]
        g1 = jax.lax.dynamic_index_in_dim(f1, s, 0, keepdims=False)[..., None, :]
        tw = mm.mont_mul(g2, g1, q3, qi3)        # [L, A, B] (Montgomery)
        sv = mm.mont_mul(x, tw, q3, qi3)
        shift = jnp.int32(B) >> (s + 1)
        down = jnp.roll(sv, -shift, axis=-1)
        up = jnp.roll(x, shift, axis=-1)
        bit = (iB >> (jnp.uint32(_LOG_B - 1) - s.astype(jnp.uint32))) & 1
        return jnp.where(bit == 0, mm.add_mod(x, down, q3),
                         mm.sub_mod(up, sv, q3))

    x = jax.lax.fori_loop(0, _LOG_B, bodyB, x)
    return x.reshape(shape)


@functools.partial(jax.jit, static_argnames="log_n")
def _ntt_inv_loop(a, itwB2, itwB1, itwA, ninv, q, qinv, log_n):
    n = 1 << log_n
    B = 1 << _LOG_B
    A = n // B
    la = log_n - _LOG_B
    shape = a.shape
    x = a.reshape(shape[:-1] + (A, B))
    q3 = q[..., None]
    qi3 = qinv[..., None]
    iA = jax.lax.broadcasted_iota(jnp.uint32, (A, 1), 0)
    iB = jax.lax.broadcasted_iota(jnp.uint32, (1, B), 1)

    def bodyB(j, x):
        g2 = jax.lax.dynamic_index_in_dim(itwB2, j, 0, keepdims=False)[..., None]
        g1 = jax.lax.dynamic_index_in_dim(itwB1, j, 0, keepdims=False)[..., None, :]
        tw = mm.mont_mul(g2, g1, q3, qi3)
        shift = jnp.int32(1) << j
        down = jnp.roll(x, -shift, axis=-1)
        up = jnp.roll(x, shift, axis=-1)
        diff = mm.sub_mod(up, x, q3)
        bit = (iB >> j.astype(jnp.uint32)) & 1
        return jnp.where(bit == 0, mm.add_mod(x, down, q3),
                         mm.mont_mul(diff, tw, q3, qi3))

    x = jax.lax.fori_loop(0, _LOG_B, bodyB, x)

    def bodyA(j2, x):
        tw = jax.lax.dynamic_index_in_dim(itwA, j2, 0, keepdims=False)[..., None]
        shift = jnp.int32(1) << j2
        down = jnp.roll(x, -shift, axis=-2)
        up = jnp.roll(x, shift, axis=-2)
        diff = mm.sub_mod(up, x, q3)
        bit = (iA >> j2.astype(jnp.uint32)) & 1
        return jnp.where(bit == 0, mm.add_mod(x, down, q3),
                         mm.mont_mul(diff, tw, q3, qi3))

    x = jax.lax.fori_loop(0, la, bodyA, x)
    x = mm.mont_mul(x, ninv[..., None], q3, qi3)
    return x.reshape(shape)


# ---------------------------------------------------------------------------
# constant-geometry (Pease) looped transforms
# ---------------------------------------------------------------------------
#
# Same butterfly network and Montgomery arithmetic as the in-place
# forms — bit-identical outputs — but EVERY stage has the same static
# data flow: fwd reads the two N/2 halves and writes one interleave
# (out[2j], out[2j+1]); inv reads even/odd pairs and writes the two
# halves.  With the stage index s the only dynamic value, the fori_loop
# body lowers to one fused elementwise pass per stage (the roll-based
# body's dynamic shifts forced XLA to materialize shifted copies —
# measured 5.2 ms for [32, 2^16] on v5e vs ~0.8 ms of mandatory HBM
# traffic).
#
# Position-map proof sketch (verified bit-exact in tests/test_ntt_loop):
# let π_s = rotate-right-by-s of the logN position bits.  Inductively
# the Pease vector at stage s holds the in-place vector permuted by
# π_s; a Pease pair (k, k+N/2) is then the in-place butterfly
# (p, p+N/2^{s+1}) with p = π_s(k), whose block index is
# p >> (logN-s) = k mod 2^s.  Hence the stage-s twiddle vector is the
# CONTIGUOUS slice psi_br[2^s : 2^{s+1}] tiled N/2^{s+1} times — no
# gather.  After logN stages π_logN = identity: the output lands in the
# same bit-reversed order as the in-place network.  The inverse runs
# the mirror schedule (σ_s = rotate-left) with twiddle slice
# ipsi_br[h : 2h], h = N/2^{s+1}, tiled.

def _pease_planes(tab, log_n, inverse):
    """[logN, l, N/2] per-stage twiddle planes, assembled on device from
    the resident [l, N] table by static slice+tile (built once per call
    inside the enclosing jit; ~2·l·N·8 bytes transient)."""
    n = 1 << log_n
    half = n // 2
    planes = []
    for s in range(log_n):
        m = half >> s if inverse else 1 << s     # slice [m : 2m], tiled
        sl = tab[..., m:2 * m]
        planes.append(jnp.tile(sl, (1, half // m)))
    return jnp.stack(planes)


@functools.partial(jax.jit, static_argnames="log_n")
def _ntt_fwd_pease(a, psi_br, q, qinv, log_n):
    n = 1 << log_n
    half = n // 2
    shape = a.shape
    planes = _pease_planes(psi_br, log_n, inverse=False)

    def body(s, x):
        u = x[..., :half]
        v = x[..., half:]
        tw = jax.lax.dynamic_index_in_dim(planes, s, 0, keepdims=False)
        t = mm.mont_mul(v, tw, q, qinv)
        ab = jnp.stack([mm.add_mod(u, t, q), mm.sub_mod(u, t, q)], axis=-1)
        return ab.reshape(shape)

    return jax.lax.fori_loop(0, log_n, body, a)


@functools.partial(jax.jit, static_argnames="log_n")
def _ntt_inv_pease(a, ipsi_br, n_inv, q, qinv, log_n):
    n = 1 << log_n
    half = n // 2
    shape = a.shape
    planes = _pease_planes(ipsi_br, log_n, inverse=True)

    def body(s, x):
        x2 = x.reshape(shape[:-1] + (half, 2))
        u = x2[..., 0]
        v = x2[..., 1]
        tw = jax.lax.dynamic_index_in_dim(planes, s, 0, keepdims=False)
        d = mm.mont_mul(mm.sub_mod(u, v, q), tw, q, qinv)
        return jnp.concatenate([mm.add_mod(u, v, q), d], axis=-1)

    a = jax.lax.fori_loop(0, log_n, body, a)
    return mm.mont_mul(a, n_inv, q, qinv)


@functools.partial(jax.jit, static_argnames="log_n")
def _ntt_fwd(a, psi_br, q, qinv, log_n):
    n = 1 << log_n
    shape = a.shape
    lead = shape[:-1]
    m = 1
    t = n
    while m < n:
        t //= 2
        s = psi_br[..., m:2 * m]                       # [L, m]
        blk = a.reshape(lead + (m, 2, t))
        u = blk[..., 0, :]
        v = mm.mont_mul(blk[..., 1, :], s[..., :, None], q[..., None], qinv[..., None])
        a = jnp.stack([mm.add_mod(u, v, q[..., None]),
                       mm.sub_mod(u, v, q[..., None])], axis=-2).reshape(shape)
        m *= 2
    return a


@functools.partial(jax.jit, static_argnames="log_n")
def _ntt_inv(a, ipsi_br, n_inv, q, qinv, log_n):
    n = 1 << log_n
    shape = a.shape
    lead = shape[:-1]
    t = 1
    m = n
    while m > 1:
        h = m // 2
        s = ipsi_br[..., h:2 * h]                      # [L, h]
        blk = a.reshape(lead + (h, 2, t))
        u = blk[..., 0, :]
        v = blk[..., 1, :]
        a = jnp.stack([mm.add_mod(u, v, q[..., None]),
                       mm.mont_mul(mm.sub_mod(u, v, q[..., None]), s[..., :, None],
                                   q[..., None], qinv[..., None])],
                      axis=-2).reshape(shape)
        t *= 2
        m = h
    return mm.mont_mul(a, n_inv, q, qinv)


# ---------------------------------------------------------------------------
# Galois automorphisms  X → X^g  (g odd, mod 2N)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ntt_exponent_map(log_n: int) -> np.ndarray:
    """e(j): NTT output position j evaluates p at ψ^{e(j)}.

    For the merged-twist CT network above this is 2·brv(j)+1; we compute
    it from first principles (cheap) so a future change of butterfly
    network can't silently break automorphisms — the identity is
    asserted against a tiny reference transform in tests.
    """
    n = 1 << log_n
    br = bit_reverse_perm(n)
    return (2 * br + 1).astype(np.int64)


@functools.lru_cache(maxsize=None)
def galois_perm_ntt(log_n: int, g: int) -> np.ndarray:
    """Permutation π with (φ_g a)^[j] = a^[π(j)] for NTT-domain (bit-rev) data."""
    n = 1 << log_n
    e = _ntt_exponent_map(log_n)             # position → exponent
    pos_of = np.empty(2 * n, dtype=np.int64)  # exponent → position (odd only)
    pos_of[e] = np.arange(n)
    src_exp = (e * (g % (2 * n))) % (2 * n)
    return pos_of[src_exp]


@functools.lru_cache(maxsize=None)
def galois_perm_coeff(log_n: int, g: int) -> tuple[np.ndarray, np.ndarray]:
    """(src, flip) with (φ_g a)[k] = ±a[src[k]] for coefficient-domain data.

    φ_g maps X^i → X^{i·g mod 2N} with X^N = -1; flip[k]=1 where a sign
    flip applies.
    """
    n = 1 << log_n
    i = np.arange(n, dtype=np.int64)
    dest = (i * (g % (2 * n))) % (2 * n)
    sign_flip = dest >= n
    dest = np.where(sign_flip, dest - n, dest)
    src = np.empty(n, dtype=np.int64)
    flip = np.empty(n, dtype=bool)
    src[dest] = i
    flip[dest] = sign_flip
    return src, flip


def apply_galois_ntt(a: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Automorphism on NTT-domain [..., L, N] data: pure gather."""
    return jnp.take(a, perm, axis=-1)


def apply_galois_coeff(a: jnp.ndarray, src: jnp.ndarray, flip: jnp.ndarray,
                       q: jnp.ndarray) -> jnp.ndarray:
    g = jnp.take(a, src, axis=-1)
    return jnp.where(flip, mm.neg_mod(g, q), g)


def rot_to_galois(k: int, log_n: int) -> int:
    """Slot rotation by k ↔ Galois element 5^k mod 2N (Lattigo convention)."""
    return pow(5, k, 1 << (log_n + 1))


CONJ_GALOIS = -1  # X → X^{2N-1}: use g = 2*n - 1
