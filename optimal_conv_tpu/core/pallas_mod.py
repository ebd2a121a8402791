"""Pallas prototype: Montgomery modmul on a u32-pair representation.

Round-2 groundwork (not yet wired into the evaluator): Mosaic/Pallas-TPU
has no uint64, so device kernels must carry residues as (lo32, hi32)
uint32 pairs with 16-bit-split wide multiplies.  This module provides
the arithmetic helpers, a fused elementwise mont_mul pallas kernel, and
conversion utilities, validated against core.modmath in tests.

If the fused kernel beats the XLA-emulated u64 chain (measured round 1:
u64 mul+add ≈ 18 Gop/s, ~1.6× below native u32), the NTT stage loop and
key-switch inner product move onto this representation.

Status: arithmetic exact (tested vs modmath on CPU + interpret mode)
and comparison-free (carry/borrow/select via Hacker's-Delight bit
identities — Mosaic-on-axon fails to legalize vector compares under a
grid). Remaining backend limit (round-1 bisection): ANY pallas_call
with grid>1 and more than one input (or sub-block ref slicing) 500s in
the remote compile helper; grid-free whole-block kernels compile and
run. The production kernel therefore runs grid-free on VMEM-sized
blocks; the NTT/key-switch Pallas work in round 2 should use in-kernel
fori_loop + manual DMA instead of the grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl


U16 = 0xFFFF   # plain ints: jnp module-level constants would be captured
SH16 = 16      # as baked tracers inside pallas kernels


def split64(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 numpy → (lo32, hi32) uint32 numpy."""
    x = np.asarray(x, dtype=np.uint64)
    return (x & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
        (x >> np.uint64(32)).astype(np.uint32)


def join64(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))


def _mul32_wide(a, b):
    """(hi32, lo32) of a*b for uint32 operands, via 16-bit halves."""
    al, ah = a & U16, a >> SH16
    bl, bh = b & U16, b >> SH16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> SH16) + (lh & U16) + (hl & U16)
    lo = (ll & U16) | (mid << SH16)
    hi = hh + (lh >> SH16) + (hl >> SH16) + (mid >> SH16)
    return hi, lo


# Comparison ops fail Mosaic legalization under a grid on this backend,
# so every carry/borrow/compare is computed with bitwise identities
# (Hacker's Delight §2-13): top bit of the carry expression is the flag.

def _carry(a, b, s):
    """carry-out of a+b (s = a+b), as 0/1 uint32."""
    return ((a & b) | ((a | b) & ~s)) >> 31


def _borrow(a, b, d):
    """borrow-out of a-b (d = a-b), as 0/1 uint32."""
    return ((~a & b) | (~(a ^ b) & d)) >> 31


def _nonzero(x):
    """(x != 0) as 0/1 uint32."""
    return (x | (jnp.uint32(0) - x)) >> 31


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    return lo, ahi + bhi + _carry(alo, blo, lo)


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    return lo, ahi - bhi - _borrow(alo, blo, lo)


def _mul64_lo_hi(alo, ahi, blo, bhi):
    """((lo64), (hi64)) of the exact 128-bit product, each as u32 pairs.

    Column accumulation in 32-bit lanes with explicit carry counting —
    column 1 sums three u32 terms (≤ 2 carries), column 2 three terms
    plus the inbound carry (≤ 3)."""
    one = jnp.uint32(1)
    h0, l0 = _mul32_wide(alo, blo)
    h1, l1 = _mul32_wide(alo, bhi)
    h2, l2 = _mul32_wide(ahi, blo)
    h3, l3 = _mul32_wide(ahi, bhi)
    # column 1 (bits 32..63): h0 + l1 + l2
    s1 = h0 + l1
    c1 = _carry(h0, l1, s1)
    s1b = s1 + l2
    c1 = c1 + _carry(s1, l2, s1b)
    # column 2 (bits 64..95): h1 + h2 + l3 + c1
    s2 = h1 + h2
    c2 = _carry(h1, h2, s2)
    s2b = s2 + l3
    c2 = c2 + _carry(s2, l3, s2b)
    s2c = s2b + c1
    c2 = c2 + _carry(s2b, c1, s2c)
    # column 3 (bits 96..127): h3 + c2
    s3 = h3 + c2
    del one
    return (l0, s1b), (s2c, s3)


def _geq64_unused(alo, ahi, blo, bhi):
    # kept for reference; superseded by the borrow-select in mont_mul
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def mont_mul_u32pair(alo, ahi, blo, bhi, qlo, qhi, qinvlo, qinvhi):
    """a·b·2^-64 mod q on u32-pair lanes (b in Montgomery form)."""
    (tlo_lo, tlo_hi), (thi_lo, thi_hi) = _mul64_lo_hi(alo, ahi, blo, bhi)
    # m = lo64(t) * qinv mod 2^64
    (mlo, mhi), _ = _mul64_lo_hi(tlo_lo, tlo_hi, qinvlo, qinvhi)
    # mq_hi = hi64(m*q); carry = (lo64(t) != 0)
    _, (mqh_lo, mqh_hi) = _mul64_lo_hi(mlo, mhi, qlo, qhi)
    carry = _nonzero(tlo_lo | tlo_hi)
    rlo, rhi = _add64(thi_lo, thi_hi, mqh_lo, mqh_hi)
    rlo2 = rlo + carry
    rhi = rhi + _carry(rlo, carry, rlo2)
    rlo = rlo2
    # conditional subtract via the borrow of r − q: r ≥ q iff borrow == 0
    dlo = rlo - qlo
    bl = _borrow(rlo, qlo, dlo)
    dhi = rhi - qhi - bl
    bh = _borrow(rhi, qhi + bl, dhi)   # qhi + bl cannot wrap (qhi < 2^31)
    mask = jnp.uint32(0) - bh           # all-ones when r < q (keep r)
    return (dlo & ~mask) | (rlo & mask), (dhi & ~mask) | (rhi & mask)


def _make_mont_kernel(q: int, qinv: int):
    qlo, qhi = q & 0xFFFFFFFF, q >> 32
    qilo, qihi = qinv & 0xFFFFFFFF, qinv >> 32

    def kernel(alo_ref, ahi_ref, blo_ref, bhi_ref, out_lo, out_hi):
        lo, hi = mont_mul_u32pair(
            alo_ref[...], ahi_ref[...], blo_ref[...], bhi_ref[...],
            jnp.uint32(qlo), jnp.uint32(qhi), jnp.uint32(qilo),
            jnp.uint32(qihi))
        out_lo[...] = lo
        out_hi[...] = hi

    return kernel


def mont_mul_pallas(alo, ahi, blo, bhi, q: int, qinv: int,
                    interpret: bool | None = None):
    """Fused elementwise Montgomery multiply as a single Pallas kernel."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    shape = alo.shape
    flat = alo.size
    lanes = 1024
    rows = flat // lanes
    # grid-free: whole arrays as single VMEM blocks (see module docstring
    # for the backend grid limitation); ~24 B live per element — keep
    # inputs ≤ ~0.5 M elements per call
    assert flat <= (1 << 17), "block too large for grid-free VMEM kernel"
    view = lambda x: x.reshape(rows, lanes)
    out2 = pl.pallas_call(
        _make_mont_kernel(q, qinv),
        out_shape=(jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
                   jax.ShapeDtypeStruct((rows, lanes), jnp.uint32)),
        interpret=interpret,
    )(view(alo), view(ahi), view(blo), view(bhi))
    return out2[0].reshape(shape), out2[1].reshape(shape)
