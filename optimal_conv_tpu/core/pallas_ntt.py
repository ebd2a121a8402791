"""Pallas negacyclic NTT/iNTT: whole-transform fused TPU kernels.

Replaces the XLA reshape-stage NTT (core/ntt.py `_ntt_fwd`/`_ntt_inv`)
on TPU with ONE grid-free Mosaic kernel per limb-group: the polynomial
stays VMEM-resident across all 2·log_n butterfly stages instead of
round-tripping HBM per stage, and the XLA graph of every key-switch /
rescale collapses from ~2·logN·beta fused reshape stages to a handful
of custom calls (the round-1 compile-time wall: ~4 min XLA-TPU compile
per key-switch level, hours for a full bootstrap pipeline).

Design (see also PLAN_R2.md §1/§2):

* Residues are (lo32, hi32) uint32 pairs — Mosaic has no uint64 — using
  the comparison-free Montgomery helpers from core/pallas_mod.py
  (vector compares fail Mosaic legalization on this backend).
* Data layout [G, R, 128] with R = N/128 (row-major flat index
  i = r·128 + c).  Butterfly stages split in two phases:
  - phase 1: spans t ≥ 128 → butterflies pair rows; pure sublane
    reshapes (G, m, 2, t/128, 128).  Stage-m twiddles are psi_br[m:2m],
    sliced from a sublane-packed table tw1[g, j, 0] = psi_br[g][j]
    (shape [G, R, 8], lane 0) — the slice [m:2m) lands on sublanes, so
    broadcasting against the v-half needs no lane relayout.
  - one transpose (G, R, 128) → (G, 128, R), then
  - phase 2: spans t = 64..1 pair rows of the TRANSPOSED array.  The
    stage twiddle psi_br[m + b] with b = r·m2 + c_blk factorizes
    exactly (exponent algebra of ψ^{brv}) as F1[c_blk]·F2[r]:
        F1[c_blk] = ψ^{(1 + 2·(brv_s(c_blk) << rbits)) << (logn-1-k)}
        F2[r]     = ψ^{brv_rbits(r) << (logn-k)}
    with k = log2(m), m2 = 64/t, rbits = log2(R), s = log2(m2) — an
    outer product of two small vectors, so no full twiddle plane is
    ever materialized or DMA'd.
* Inverse transform mirrors this (GS butterflies, fine spans first:
  transpose → 7 stages → transpose back → coarse stages → ×n_inv).
* Grid-free with all inputs as whole VMEM blocks (round-1 bisection:
  pallas_call with grid>1 and >1 input hangs the remote Mosaic
  compile; grid-free multi-input kernels work).  Limbs are processed
  in groups of G per call; per-limb constants (q, qinv) and twiddle
  tables are runtime inputs, so ONE compiled kernel per (log_n, G,
  direction) serves every level and every modulus chain.

Reference parity: same transform/network as core/ntt.py, bit-identical
output (natural order in → bit-reversed out, merged Longa–Naehrig
twist), replacing ring/ring_ntt.go of the Go Lattigo fork
(SURVEY.md C2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

from . import modmath as mm
from .pallas_mod import (_mul32_wide, _carry, _borrow, _nonzero,
                         _mul64_lo_hi)


# ---------------------------------------------------------------------------
# u32-pair modular helpers (comparison-free; see pallas_mod.py docstring)
# ---------------------------------------------------------------------------

def _mont_mul_pair(alo, ahi, blo, bhi, qlo, qhi, qilo, qihi):
    """a·b·2^-64 mod q, b in Montgomery form (canonical result)."""
    (tll, tlh), (thl, thh) = _mul64_lo_hi(alo, ahi, blo, bhi)
    (mlo, mhi), _ = _mul64_lo_hi(tll, tlh, qilo, qihi)
    _, (mql, mqh) = _mul64_lo_hi(mlo, mhi, qlo, qhi)
    carry = _nonzero(tll | tlh)
    rlo = thl + mql
    rhi = thh + mqh + _carry(thl, mql, rlo)
    rlo2 = rlo + carry
    rhi = rhi + _carry(rlo, carry, rlo2)
    rlo = rlo2
    dlo = rlo - qlo
    bl = _borrow(rlo, qlo, dlo)
    dhi = rhi - qhi - bl
    bh = _borrow(rhi, qhi + bl, dhi)
    mask = jnp.uint32(0) - bh
    return (dlo & ~mask) | (rlo & mask), (dhi & ~mask) | (rhi & mask)


def _add_mod_pair(alo, ahi, blo, bhi, qlo, qhi):
    slo = alo + blo
    shi = ahi + bhi + _carry(alo, blo, slo)
    dlo = slo - qlo
    bl = _borrow(slo, qlo, dlo)
    dhi = shi - qhi - bl
    bh = _borrow(shi, qhi + bl, dhi)
    mask = jnp.uint32(0) - bh            # all-ones when s < q (keep s)
    return (dlo & ~mask) | (slo & mask), (dhi & ~mask) | (shi & mask)


def _sub_mod_pair(alo, ahi, blo, bhi, qlo, qhi):
    dlo = alo - blo
    bl = _borrow(alo, blo, dlo)
    dhi = ahi - bhi - bl
    bh = _borrow(ahi, bhi + bl, dhi)     # 0/1: a < b → wrap, add q
    mask = jnp.uint32(0) - bh
    alo2 = dlo + (qlo & mask)
    ahi2 = dhi + (qhi & mask) + _carry(dlo, qlo & mask, alo2)
    return alo2, ahi2


# ---------------------------------------------------------------------------
# kernel builders (cached per (log_n, G, direction))
# ---------------------------------------------------------------------------

def _bitrev(x: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


def _qconsts(qc, G, lanes):
    """Per-limb (q, qinv) u32 pairs pre-broadcast to full lane width.

    Mosaic cannot broadcast a value in sublanes AND lanes in one op
    ("Not implemented: Broadcast in both sublanes and lanes"), so every
    scalar-ish operand is expanded to (G, 1, lanes) here (lane-only
    broadcast); elementwise ops then broadcast sublanes only.
    """
    return tuple(jnp.broadcast_to(qc[:, 0:1, j:j + 1], (G, 1, lanes))
                 for j in range(4))


def _fwd_kernel(log_n: int, G: int):
    n = 1 << log_n
    R = n // 128
    S1 = log_n - 7                       # stages with span ≥ 128

    def kernel(alo, ahi, qc, t1l, t1h, f1l, f1h, f2l, f2h, olo, ohi):
        qlo, qhi, qil, qih = _qconsts(qc, G, 128)          # (G, 1, 128)
        xl = alo[...]
        xh = ahi[...]
        # ---- phase 1: spans t = n/2 .. 128 (row butterflies) ----------
        m = 1
        t128 = R // 2
        for _ in range(S1):
            sl = jnp.broadcast_to(t1l[:, m:2 * m, 0:1].reshape(G, m, 1, 1),
                                  (G, m, 1, 128))
            sh = jnp.broadcast_to(t1h[:, m:2 * m, 0:1].reshape(G, m, 1, 1),
                                  (G, m, 1, 128))
            q4 = tuple(c[:, :, None, :] for c in (qlo, qhi, qil, qih))
            bl_l = xl.reshape(G, m, 2, t128, 128)
            bl_h = xh.reshape(G, m, 2, t128, 128)
            ul, uh = bl_l[:, :, 0], bl_h[:, :, 0]
            vl, vh = _mont_mul_pair(bl_l[:, :, 1], bl_h[:, :, 1], sl, sh, *q4)
            pl_, ph_ = _add_mod_pair(ul, uh, vl, vh, q4[0], q4[1])
            ml_, mh_ = _sub_mod_pair(ul, uh, vl, vh, q4[0], q4[1])
            xl = jnp.stack([pl_, ml_], axis=2).reshape(G, R, 128)
            xh = jnp.stack([ph_, mh_], axis=2).reshape(G, R, 128)
            m *= 2
            t128 //= 2
        # ---- transpose: (G, R, 128) → (G, 128, R) ---------------------
        yl = jnp.swapaxes(xl, -1, -2)
        yh = jnp.swapaxes(xh, -1, -2)
        # ---- phase 2: spans t = 64 .. 1 (rows of transposed array) ----
        qloR, qhiR, qilR, qihR = _qconsts(qc, G, R)        # (G, 1, R)
        q5 = tuple(c[:, :, None, None, :]
                   for c in (qloR, qhiR, qilR, qihR))      # (G,1,1,1,R)
        t = 64
        m2 = 1
        for s in range(7):
            g1l = jnp.broadcast_to(
                f1l[:, m2:2 * m2, 0:1].reshape(G, m2, 1, 1, 1),
                (G, m2, 1, 1, R))
            g1h = jnp.broadcast_to(
                f1h[:, m2:2 * m2, 0:1].reshape(G, m2, 1, 1, 1),
                (G, m2, 1, 1, R))
            g2l = f2l[:, s, :].reshape(G, 1, 1, 1, R)
            g2h = f2h[:, s, :].reshape(G, 1, 1, 1, R)
            twl, twh = _mont_mul_pair(g1l, g1h, g2l, g2h, *q5)
            bl_l = yl.reshape(G, m2, 2, t, R)
            bl_h = yh.reshape(G, m2, 2, t, R)
            ul, uh = bl_l[:, :, 0], bl_h[:, :, 0]
            vl, vh = _mont_mul_pair(bl_l[:, :, 1], bl_h[:, :, 1],
                                    twl[:, :, 0], twh[:, :, 0],
                                    q5[0][:, :, 0], q5[1][:, :, 0],
                                    q5[2][:, :, 0], q5[3][:, :, 0])
            pl_, ph_ = _add_mod_pair(ul, uh, vl, vh,
                                     q5[0][:, :, 0], q5[1][:, :, 0])
            ml_, mh_ = _sub_mod_pair(ul, uh, vl, vh,
                                     q5[0][:, :, 0], q5[1][:, :, 0])
            yl = jnp.stack([pl_, ml_], axis=2).reshape(G, 128, R)
            yh = jnp.stack([ph_, mh_], axis=2).reshape(G, 128, R)
            t //= 2
            m2 *= 2
        olo[...] = jnp.swapaxes(yl, -1, -2)
        ohi[...] = jnp.swapaxes(yh, -1, -2)

    return kernel


def _inv_kernel(log_n: int, G: int):
    n = 1 << log_n
    R = n // 128
    S1 = log_n - 7

    def kernel(alo, ahi, qc, t1l, t1h, f1l, f1h, f2l, f2h, olo, ohi):
        qlo, qhi, qil, qih = _qconsts(qc, G, 128)          # (G, 1, 128)
        # ---- phase A: fine spans t = 1 .. 64 on the transposed array --
        yl = jnp.swapaxes(alo[...], -1, -2)    # (G, 128, R)
        yh = jnp.swapaxes(ahi[...], -1, -2)
        qloR, qhiR, qilR, qihR = _qconsts(qc, G, R)
        q5 = tuple(c[:, :, None, None, :]
                   for c in (qloR, qhiR, qilR, qihR))      # (G,1,1,1,R)
        t = 1
        m2 = 64
        for s in range(7):
            g1l = jnp.broadcast_to(
                f1l[:, m2:2 * m2, 0:1].reshape(G, m2, 1, 1, 1),
                (G, m2, 1, 1, R))
            g1h = jnp.broadcast_to(
                f1h[:, m2:2 * m2, 0:1].reshape(G, m2, 1, 1, 1),
                (G, m2, 1, 1, R))
            g2l = f2l[:, 6 - s, :].reshape(G, 1, 1, 1, R)
            g2h = f2h[:, 6 - s, :].reshape(G, 1, 1, 1, R)
            twl, twh = _mont_mul_pair(g1l, g1h, g2l, g2h, *q5)
            bl_l = yl.reshape(G, m2, 2, t, R)
            bl_h = yh.reshape(G, m2, 2, t, R)
            ul, uh = bl_l[:, :, 0], bl_h[:, :, 0]
            vl, vh = bl_l[:, :, 1], bl_h[:, :, 1]
            pl_, ph_ = _add_mod_pair(ul, uh, vl, vh,
                                     q5[0][:, :, 0], q5[1][:, :, 0])
            dl, dh = _sub_mod_pair(ul, uh, vl, vh,
                                   q5[0][:, :, 0], q5[1][:, :, 0])
            ml_, mh_ = _mont_mul_pair(dl, dh, twl[:, :, 0], twh[:, :, 0],
                                      q5[0][:, :, 0], q5[1][:, :, 0],
                                      q5[2][:, :, 0], q5[3][:, :, 0])
            yl = jnp.stack([pl_, ml_], axis=2).reshape(G, 128, R)
            yh = jnp.stack([ph_, mh_], axis=2).reshape(G, 128, R)
            t *= 2
            m2 //= 2
        # ---- transpose back, phase B: spans t = 128 .. n/2 ------------
        xl = jnp.swapaxes(yl, -1, -2)
        xh = jnp.swapaxes(yh, -1, -2)
        t128 = 1
        h = R // 2
        for _ in range(S1):
            sl = jnp.broadcast_to(t1l[:, h:2 * h, 0:1].reshape(G, h, 1, 1),
                                  (G, h, 1, 128))
            sh = jnp.broadcast_to(t1h[:, h:2 * h, 0:1].reshape(G, h, 1, 1),
                                  (G, h, 1, 128))
            q4 = tuple(c[:, :, None, :] for c in (qlo, qhi, qil, qih))
            bl_l = xl.reshape(G, h, 2, t128, 128)
            bl_h = xh.reshape(G, h, 2, t128, 128)
            ul, uh = bl_l[:, :, 0], bl_h[:, :, 0]
            vl, vh = bl_l[:, :, 1], bl_h[:, :, 1]
            pl_, ph_ = _add_mod_pair(ul, uh, vl, vh, q4[0], q4[1])
            dl, dh = _sub_mod_pair(ul, uh, vl, vh, q4[0], q4[1])
            ml_, mh_ = _mont_mul_pair(dl, dh, sl, sh, *q4)
            xl = jnp.stack([pl_, ml_], axis=2).reshape(G, R, 128)
            xh = jnp.stack([ph_, mh_], axis=2).reshape(G, R, 128)
            t128 *= 2
            h //= 2
        # ---- final ×n_inv (Montgomery scalar from f1 row 0) -----------
        nil = jnp.broadcast_to(f1l[:, 0:1, 0:1], (G, 1, 128))
        nih = jnp.broadcast_to(f1h[:, 0:1, 0:1], (G, 1, 128))
        rl, rh = _mont_mul_pair(xl, xh, nil, nih, qlo, qhi, qil, qih)
        olo[...] = rl
        ohi[...] = rh

    return kernel


@functools.lru_cache(maxsize=None)
def _pallas_transform(log_n: int, G: int, inverse: bool, interpret: bool):
    n = 1 << log_n
    R = n // 128
    kern = (_inv_kernel if inverse else _fwd_kernel)(log_n, G)
    f = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((G, R, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((G, R, 128), jnp.uint32)),
        interpret=interpret,
    )
    return f


# ---------------------------------------------------------------------------
# host-side twiddle-table factory (per (moduli tuple, log_n))
# ---------------------------------------------------------------------------

class PallasNttTables:
    """Per-limb packed twiddle tables for the two-phase Pallas NTT.

    Built once per (log_n, moduli); rows are indexed by GLOBAL limb
    index so arbitrary limb subsets can be gathered per call.
    """

    def __init__(self, moduli: list[int], log_n: int, psi: list[int]):
        self.log_n = log_n
        n = 1 << log_n
        R = n // 128
        rbits = log_n - 7
        L = len(moduli)

        qc = np.zeros((L, 1, 128), dtype=np.uint32)
        t1 = np.zeros((L, 2, R, 8), dtype=np.uint32)       # fwd:  [lo/hi]
        it1 = np.zeros((L, 2, R, 8), dtype=np.uint32)      # inv:  [lo/hi]
        f1 = np.zeros((L, 2, 2, 128, 8), dtype=np.uint32)  # [fwd/inv][lo/hi]
        f2 = np.zeros((L, 2, 2, 8, R), dtype=np.uint32)

        def brv_vec(x, bits):
            out = np.zeros_like(x)
            xx = x.copy()
            for _ in range(bits):
                out = (out << 1) | (xx & 1)
                xx >>= 1
            return out

        def pack(dst, vals):
            dst[0] = (vals & 0xFFFFFFFF).astype(np.uint32)
            dst[1] = (vals >> np.uint64(32)).astype(np.uint32)

        brv_R = brv_vec(np.arange(R, dtype=np.int64), log_n)
        brv_r = brv_vec(np.arange(R, dtype=np.int64), rbits)

        for li, (q, ps) in enumerate(zip(moduli, psi)):
            q = int(q)
            qinv = mm.mont_qinv(q)
            r1 = (1 << 64) % q
            qc[li, 0, 0] = q & 0xFFFFFFFF
            qc[li, 0, 1] = q >> 32
            qc[li, 0, 2] = qinv & 0xFFFFFFFF
            qc[li, 0, 3] = qinv >> 32
            ips = pow(ps, -1, q)

            for inv_i, base in enumerate((int(ps), int(ips))):
                # phase-1/B twiddles: base^{brv_logn(j)} (Montgomery), j<R
                vals = np.array([pow(base, int(e), q) * r1 % q
                                 for e in brv_R], dtype=np.uint64)
                pack((t1 if inv_i == 0 else it1)[li, :, :, 0], vals)
                # phase-2/A factor tables
                for s in range(7):           # stage: m2 = 2^s, span t = 64>>s
                    m2 = 1 << s
                    k = rbits + s            # log2(block count) of full stage
                    shift = log_n - 1 - k
                    b0 = np.arange(m2, dtype=np.int64)
                    e1 = (1 + 2 * (brv_vec(b0, s) << rbits)) << shift
                    v1 = np.array([pow(base, int(e) % (2 * n), q) * r1 % q
                                   for e in e1], dtype=np.uint64)
                    pack(f1[li, inv_i, :, m2:2 * m2, 0], v1)
                    e2 = (brv_r << (log_n - k)) % (2 * n)
                    v2 = np.array([pow(base, int(e), q) * r1 % q for e in e2],
                                  dtype=np.uint64)
                    pack(f2[li, inv_i, :, s, :], v2)
            # n_inv (Montgomery) at inverse f1 row 0 (fwd row 0 unused)
            n_inv_m = pow(n, -1, q) * r1 % q
            f1[li, 1, 0, 0, 0] = n_inv_m & 0xFFFFFFFF
            f1[li, 1, 1, 0, 0] = n_inv_m >> 32

        self._qc = qc
        self._t1 = t1
        self._it1 = it1
        self._f1 = f1
        self._f2 = f2
        self._cache: dict = {}

    def group_tabs(self, idx: tuple[int, ...], inverse: bool):
        """jnp constant inputs (qc, t1l, t1h, f1l, f1h, f2l, f2h) for limb
        subset idx."""
        key = (idx, inverse)
        got = self._cache.get(key)
        if got is None:
            sel = list(idx)
            ii = 1 if inverse else 0
            t1 = self._it1 if inverse else self._t1
            with jax.ensure_compile_time_eval():
                got = (jnp.asarray(self._qc[sel]),
                       jnp.asarray(t1[sel, 0]), jnp.asarray(t1[sel, 1]),
                       jnp.asarray(self._f1[sel, ii, 0]),
                       jnp.asarray(self._f1[sel, ii, 1]),
                       jnp.asarray(self._f2[sel, ii, 0]),
                       jnp.asarray(self._f2[sel, ii, 1]))
            self._cache[key] = got
        return got


# ---------------------------------------------------------------------------
# public entry: drop-in transform over [.., l, N] uint64
# ---------------------------------------------------------------------------

def _group(log_n: int) -> int:
    """Limbs per kernel call, set by the Mosaic scoped-VMEM budget.

    Measured on v5e (16 MB scoped limit): a logN=16 limb costs
    ≈8.75 MB (data + mont_mul intermediates ≈ 34 u32 planes of
    R×128).  For small N the phase-2 buffers are (128, R) with the
    LANE dim R < 128 padded to 128, so the physical footprint floors
    at max(R, 128) lanes — logN=10 still costs ≈2.2 MB/limb.
    """
    R = (1 << log_n) // 128
    per_limb = 34 * 128 * 4 * max(R, 128)        # bytes
    return max(1, min(8, int(14.5e6 / per_limb)))


def transform(a: jnp.ndarray, idx: tuple[int, ...], tables: PallasNttTables,
              inverse: bool, interpret: bool) -> jnp.ndarray:
    """NTT/iNTT of [..., l, N] uint64 rows (limbs idx) via the kernels.

    Splits to u32 pairs, flattens leading batch dims into the limb axis
    (each row transforms independently; the limb-index pattern just
    repeats per batch), processes rows in groups of GROUP, rejoins.
    """
    log_n = tables.log_n
    n = 1 << log_n
    R = n // 128
    shape = a.shape
    L = shape[-2]
    assert shape[-1] == n, shape
    batch = 1
    for d in shape[:-2]:
        batch *= d
    rows = batch * L
    idx_flat = tuple(idx) * batch
    a = a.reshape(rows, n)
    alo = (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(rows, R, 128)
    ahi = (a >> jnp.uint64(32)).astype(jnp.uint32).reshape(rows, R, 128)

    out_lo = []
    out_hi = []
    group = _group(log_n)
    start = 0
    while start < rows:
        g = min(group, rows - start)
        gidx = idx_flat[start:start + g]
        qc, t1l, t1h, f1l, f1h, f2l, f2h = tables.group_tabs(gidx, inverse)
        f = _pallas_transform(log_n, g, inverse, interpret)
        ol, oh = f(alo[start:start + g], ahi[start:start + g],
                   qc, t1l, t1h, f1l, f1h, f2l, f2h)
        out_lo.append(ol)
        out_hi.append(oh)
        start += g
    lo = jnp.concatenate(out_lo, axis=0).reshape(rows, n)
    hi = jnp.concatenate(out_hi, axis=0).reshape(rows, n)
    return (lo.astype(jnp.uint64)
            | (hi.astype(jnp.uint64) << jnp.uint64(32))).reshape(shape)
