"""Pallas prototype: Montgomery modmul on a u32-pair representation.

Round-2 groundwork (not yet wired into the evaluator): Mosaic/Pallas-TPU
has no uint64, so device kernels must carry residues as (lo32, hi32)
uint32 pairs with 16-bit-split wide multiplies.  This module provides
the arithmetic helpers, a fused elementwise mont_mul pallas kernel, and
conversion utilities, validated against core.modmath in tests.

If the fused kernel beats the XLA-emulated u64 chain (measured round 1:
u64 mul+add ≈ 18 Gop/s, ~1.6× below native u32), the NTT stage loop and
key-switch inner product move onto this representation.

Status: arithmetic exact (tested vs modmath on CPU + interpret mode);
the Mosaic TPU lowering currently fails legalization ("func.return") —
isolate in round 2 (suspects: bool-carry casts, multi-result return).
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


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return lo, ahi + bhi + carry


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    return lo, ahi - bhi - borrow


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
    c1 = (s1 < h0).astype(jnp.uint32)
    s1b = s1 + l2
    c1 = c1 + (s1b < s1).astype(jnp.uint32)
    # column 2 (bits 64..95): h1 + h2 + l3 + c1
    s2 = h1 + h2
    c2 = (s2 < h1).astype(jnp.uint32)
    s2b = s2 + l3
    c2 = c2 + (s2b < s2).astype(jnp.uint32)
    s2c = s2b + c1
    c2 = c2 + (s2c < s2b).astype(jnp.uint32)
    # column 3 (bits 96..127): h3 + c2
    s3 = h3 + c2
    del one
    return (l0, s1b), (s2c, s3)


def _geq64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def mont_mul_u32pair(alo, ahi, blo, bhi, qlo, qhi, qinvlo, qinvhi):
    """a·b·2^-64 mod q on u32-pair lanes (b in Montgomery form)."""
    (tlo_lo, tlo_hi), (thi_lo, thi_hi) = _mul64_lo_hi(alo, ahi, blo, bhi)
    # m = lo64(t) * qinv mod 2^64
    (mlo, mhi), _ = _mul64_lo_hi(tlo_lo, tlo_hi, qinvlo, qinvhi)
    # mq_hi = hi64(m*q); carry = (lo64(t) != 0)
    _, (mqh_lo, mqh_hi) = _mul64_lo_hi(mlo, mhi, qlo, qhi)
    carry = ((tlo_lo | tlo_hi) != 0).astype(jnp.uint32)
    rlo, rhi = _add64(thi_lo, thi_hi, mqh_lo, mqh_hi)
    rlo2 = rlo + carry
    rhi = rhi + (rlo2 < rlo).astype(jnp.uint32)
    rlo = rlo2
    big = _geq64(rlo, rhi, qlo, qhi)
    slo, shi = _sub64(rlo, rhi, qlo, qhi)
    return jnp.where(big, slo, rlo), jnp.where(big, shi, rhi)


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
    tile_rows = 8 if rows % 8 == 0 else rows
    view = lambda x: x.reshape(rows, lanes)
    spec = pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0))
    out2 = pl.pallas_call(
        _make_mont_kernel(q, qinv),
        grid=(rows // tile_rows,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, lanes), jnp.uint32),
                   jax.ShapeDtypeStruct((rows, lanes), jnp.uint32)),
        interpret=interpret,
    )(view(alo), view(ahi), view(blo), view(bhi))
    return out2[0].reshape(shape), out2[1].reshape(shape)
