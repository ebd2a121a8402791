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
        # (2^j·Q) mod r_i for the bit-decomposed v·Q (see extend)
        self._vbits = max(k.bit_length(), 1)
        qmod_pow = np.empty((len(self.dst), self._vbits), dtype=np.uint64)
        for i, r in enumerate(self.dst):
            for j in range(self._vbits):
                qmod_pow[i, j] = (1 << j) * big_q % r
        self.qmod_pow = jnp.asarray(qmod_pow)
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
        # v·Q mod r_i, branch/gather-free: v ∈ [0, K] is tiny, so
        # v·Q = Σ_j bit_j(v)·(2^j·Q); each term is ANDed with an
        # all-ones mask from the bit and accumulated with add_mod.
        # (A take-based gather here dominated the key-switch decompose
        # at 0.5 s per call at logN=16 — TPU gathers are pathological.)
        vu = v.astype(jnp.uint64)[..., None, :]         # [..., 1, N]
        vq = None
        for j in range(self._vbits):
            mask = jnp.uint64(0) - ((vu >> jnp.uint64(j)) & jnp.uint64(1))
            t = self.qmod_pow[:, j:j + 1] & mask        # [..., R, N]
            vq = t if vq is None else mm.add_mod(vq, t, self.dq)
        return mm.sub_mod(acc, vq, self.dq)


def reduce_u64(t: jnp.ndarray, q: jnp.ndarray, qinv: jnp.ndarray,
               r1: jnp.ndarray) -> jnp.ndarray:
    """Arbitrary uint64 t (< 2^62) → t mod q, via t·(2^64 mod q)·2^-64."""
    return mm.mont_mul(t, r1, q, qinv)


class DigitExtender:
    """Batched basis extension of ALL key-switch digits in one op chain.

    The hybrid key-switch decompose previously built one BasisExtender
    per digit and unrolled beta extension graphs (~14 K HLOs at
    logN=16, beta≈8 — the dominant XLA compile cost per level, ~4 min
    each on the remote TPU helper).  This class stacks the per-digit
    tables into [beta, ...] arrays (last digit zero-padded to alpha)
    so one vectorized chain extends every digit at once: graph size is
    independent of beta, results bit-identical (padding contributes
    exactly 0: padded qhat/qhat_inv/inv_src entries are 0).

    Replaces the per-digit use of ring/ring_basis_extension.go in the
    fork's keyswitch (SURVEY.md C4).
    """

    def __init__(self, digits: list[tuple[int, ...]], dst: tuple[int, ...],
                 moduli: list[int]):
        beta = len(digits)
        alpha = max(len(d) for d in digits)
        R = len(dst)
        dst_mods = [int(moduli[i]) for i in dst]

        gather = np.zeros((beta, alpha), dtype=np.int32)
        sq = np.ones((beta, alpha, 1), dtype=np.uint64)
        sqinv = np.zeros((beta, alpha, 1), dtype=np.uint64)
        qhat_inv = np.zeros((beta, alpha, 1), dtype=np.uint64)
        inv_src = np.zeros((beta, alpha, 1), dtype=np.float32)
        qhat = np.zeros((beta, R, alpha), dtype=np.uint64)
        self._vbits = max(alpha.bit_length(), 1)
        qmod_pow = np.zeros((beta, R, self._vbits), dtype=np.uint64)
        r64 = 1 << 64

        for b, dig in enumerate(digits):
            src = [int(moduli[i]) for i in dig]
            k = len(src)
            big_q = 1
            for q in src:
                big_q *= q
            gather[b, :k] = dig
            for j, q in enumerate(src):
                sq[b, j, 0] = q
                sqinv[b, j, 0] = mm.mont_qinv(q)
                qhat_inv[b, j, 0] = pow((big_q // q) % q, -1, q) * r64 % q
                inv_src[b, j, 0] = np.float32(1.0 / q)
            for i, r in enumerate(dst_mods):
                for j, q in enumerate(src):
                    qhat[b, i, j] = (big_q // q) % r * r64 % r
                for j in range(self._vbits):
                    qmod_pow[b, i, j] = (1 << j) * big_q % r
        # dummy source rows (j ≥ len(digit)): qhat_inv=0 forces y=0 and
        # qhat=0 kills the terms; q=1 (with its valid qinv) keeps the
        # unused Montgomery reductions well-defined.
        for b, dig in enumerate(digits):
            for j in range(len(dig), alpha):
                sqinv[b, j, 0] = mm.mont_qinv(1)

        self.beta, self.alpha, self.R = beta, alpha, R
        import jax
        with jax.ensure_compile_time_eval():
            self.gather = jnp.asarray(gather)
            self.sq = jnp.asarray(sq)
            self.sqinv = jnp.asarray(sqinv)
            self.qhat_inv_mont = jnp.asarray(qhat_inv)
            self.inv_src_f32 = jnp.asarray(inv_src)
            self.qhat_mont = jnp.asarray(qhat)          # [beta, R, alpha]
            self.qmod_pow = jnp.asarray(qmod_pow)       # [beta, R, vbits]
            dq = np.array(dst_mods, dtype=np.uint64)[None, :, None]
            self.dq = jnp.asarray(dq)
            self.dqinv = jnp.asarray(np.array(
                [mm.mont_qinv(q) for q in dst_mods],
                dtype=np.uint64)[None, :, None])

    def extend_digits(self, c: jnp.ndarray) -> jnp.ndarray:
        """c: [L, N] coeff-domain residues (canonical) →
        [beta, R, N] extended digits (mod dst)."""
        x = c[self.gather]                               # [beta, alpha, N]
        y = mm.mont_mul(x, self.qhat_inv_mont, self.sq, self.sqinv)
        v = jnp.floor(jnp.sum(y.astype(jnp.float32) * self.inv_src_f32,
                              axis=-2)).astype(jnp.int32)        # [beta, N]
        v = jnp.clip(v, 0, self.alpha)
        acc = None
        for j in range(self.alpha):
            t = mm.mont_mul(y[:, None, j, :], self.qhat_mont[:, :, j:j + 1],
                            self.dq, self.dqinv)                 # [beta, R, N]
            acc = t if acc is None else mm.add_mod(acc, t, self.dq)
        # v·Q mod r: bit-decomposed mask accumulation — no gather, no
        # branches (same rationale as BasisExtender.extend).
        vu = v.astype(jnp.uint64)[:, None, :]            # [beta, 1, N]
        vq = None
        for j in range(self._vbits):
            mask = jnp.uint64(0) - ((vu >> jnp.uint64(j)) & jnp.uint64(1))
            t = self.qmod_pow[:, :, j:j + 1] & mask      # [beta, R, N]
            vq = t if vq is None else mm.add_mod(vq, t, self.dq)
        return mm.sub_mod(acc, vq, self.dq)
