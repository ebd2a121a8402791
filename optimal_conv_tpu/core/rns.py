"""RNS basis conversion, rescaling, and mod-down for CKKS on TPU.

Replaces ``ring/ring_basis_extension.go`` + ``ring/ring_scaling.go`` of
the Go Lattigo fork (SURVEY.md C13 and the key-switch core C4): fast
(approximate) basis extension between RNS bases, exact divide-and-round
by the top modulus (rescale), and division by the special primes P
(mod-down after key-switching).

Approximate mod-up note: the correction count ``v = ⌊Σ_j y_j/q_j⌋`` is
computed in float32 (TPU has no f64).  A ±1 error in ``v`` changes only
which representative ``x + u·Q_D`` is produced — every target limb uses
the *same* v, so the result is still a consistent integer; the offset is
absorbed by the P-division of hybrid key-switching exactly like the
standard approximate-mod-up error (factor ≤2 on one noise term).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import modmath as mm


class BasisExtender:
    """Fast basis extension from source primes {q_j} to target primes {r_i}.

    Precomputes, for the fixed source group:
      qhat_inv_mont[j]  = (Q/q_j)^{-1} mod q_j          (Montgomery form)
      qhat_mont[i, j]   = (Q/q_j) mod r_i               (Montgomery form)
      qmod_table[i, v]  = v·Q mod r_i  for v = 0..len(src)
    """

    def __init__(self, src: list[int], dst: list[int]):
        self.src = [int(q) for q in src]
        self.dst = [int(r) for r in dst]
        k = len(self.src)
        big_q = 1
        for q in self.src:
            big_q *= q

        self.sq = jnp.asarray(np.array(self.src, dtype=np.uint64)[:, None])
        self.sqinv = jnp.asarray(
            np.array([mm.mont_qinv(q) for q in self.src], dtype=np.uint64)[:, None])
        self.dq = jnp.asarray(np.array(self.dst, dtype=np.uint64)[:, None])
        self.dqinv = jnp.asarray(
            np.array([mm.mont_qinv(q) for q in self.dst], dtype=np.uint64)[:, None])

        r64 = 1 << 64
        qhat_inv = np.array(
            [pow((big_q // q) % q, -1, q) * r64 % q for q in self.src],
            dtype=np.uint64)
        self.qhat_inv_mont = jnp.asarray(qhat_inv[:, None])

        qhat = np.empty((len(self.dst), k), dtype=np.uint64)
        qmod = np.empty((len(self.dst), k + 1), dtype=np.uint64)
        for i, r in enumerate(self.dst):
            for j, q in enumerate(self.src):
                qhat[i, j] = (big_q // q) % r * r64 % r
            for v in range(k + 1):
                qmod[i, v] = v * big_q % r
        self.qhat_mont = jnp.asarray(qhat)          # [R, K]
        self.qmod_table = jnp.asarray(qmod)         # [R, K+1]
        self.inv_src_f32 = jnp.asarray(
            1.0 / np.array(self.src, dtype=np.float64), dtype=jnp.float32)[:, None]

    def extend(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [..., K, N] residues mod src (coeff domain, canonical) →
        [..., R, N] residues of (the same integer + u·Q_src) mod dst."""
        y = mm.mont_mul(x, self.qhat_inv_mont, self.sq, self.sqinv)  # [..., K, N]
        # v = floor(sum_j y_j / q_j), an integer in [0, K)
        v = jnp.floor(jnp.sum(y.astype(jnp.float32) * self.inv_src_f32, axis=-2)
                      ).astype(jnp.int32)                             # [..., N]
        v = jnp.clip(v, 0, len(self.src))
        # out_i = sum_j y_j * qhat_j  -  v*Q   (mod r_i)
        terms = mm.mont_mul(y[..., None, :, :], self.qhat_mont[:, :, None],
                            self.dq[:, None, :], self.dqinv[:, None, :])
        acc = terms[..., 0, :]
        for j in range(1, len(self.src)):
            acc = mm.add_mod(acc, terms[..., j, :], self.dq)
        # gather v·Q mod r_i: qmod_table is [R, K+1]; v is [..., N]
        vq = jnp.take(self.qmod_table, v, axis=1)     # [R, ..., N]
        vq = jnp.moveaxis(vq, 0, -2)                  # [..., R, N]
        return mm.sub_mod(acc, vq, self.dq)


def reduce_u64(t: jnp.ndarray, q: jnp.ndarray, qinv: jnp.ndarray,
               r1: jnp.ndarray) -> jnp.ndarray:
    """Arbitrary uint64 t (< 2^62) → t mod q, via t·(2^64 mod q)·2^-64."""
    return mm.mont_mul(t, r1, q, qinv)
