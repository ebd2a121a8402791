"""Four-step NTT on the MXU: modular matmuls via int8 systolic tiles.

The butterfly NTTs (core/ntt.py) are VPU-bound on emulated uint64 and
run ~12× below even the measured elementwise u64 rate because every
stage re-lays-out the data (measured round 2: [34, 2^16] forward =
67 ms unrolled / 91 ms looped on v5e).  TPUs want matmuls, so this
backend computes the SAME transform (bit-identical, natural order in →
bit-reversed out, merged ψ-twist) as two modular 256×256 matrix
multiplications with an elementwise twiddle between them:

    out = ((W1 ·q a) ⊙ T) ·q W2ᵀ            (a viewed as [A, B])

with the negacyclic twist ψ^i and the output bit-reversal FOLDED into
the constant matrices (derivation in comments below):

    W1[r, i1] = ψ^{B·i1·(2·brv_a(r)+1)}       [A, A]
    T [r, i2] = ψ^{i2·(2·brv_a(r)+1)}         [A, B]
    W2[c, i2] = ψ^{2A·i2·brv_b(c)}            [B, B]

Each modular matmul is exact int8 MXU arithmetic: operands are
byte-decomposed (8 limbs of 8 bits), all 64 byte-pair products are ONE
[8A, A]×[A, 8B] int8→int32 matmul (signed-offset trick for unsigned
bytes), byte-diagonal groups are recombined as three ≤2^60 partial
sums reduced with two Montgomery constant-multiplies.

Why correct: Σ_t W[m,t]·x[t,n] over 256 terms of 8-bit pairs is
< 255²·256 < 2^24 per byte-pair product (int32-exact on the MXU), and
the recombination arithmetic is all exact u64.

Replaces ring/ring_ntt.go of the Go Lattigo fork (SURVEY.md C2) for
logN ≥ 14 — the production sizes where both XLA butterfly variants are
compile- or runtime-bound.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import modmath as mm


def _brv(x: np.ndarray, bits: int) -> np.ndarray:
    out = np.zeros_like(x)
    xx = x.copy()
    for _ in range(bits):
        out = (out << 1) | (xx & 1)
        xx >>= 1
    return out


def _psi_pows(psi: int, q: int, two_n: int) -> np.ndarray:
    """[ψ^0 … ψ^{2N-1}] mod q as uint64 (host, running product)."""
    out = np.empty(two_n, dtype=np.uint64)
    acc = 1
    for i in range(two_n):
        out[i] = acc
        acc = acc * psi % q
    return out


def _byte_planes(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """u64 [.., M, T] → (int8 planes [.., 8, M, T] of byte−128,
    row-correction [.., 8, M] = 128·Σ_t (byte−128))."""
    planes = np.empty(mat.shape[:-2] + (8,) + mat.shape[-2:], dtype=np.int8)
    rows = np.empty(mat.shape[:-2] + (8, mat.shape[-2]), dtype=np.int32)
    for p in range(8):
        b = ((mat >> np.uint64(8 * p)) & np.uint64(0xFF)).astype(np.int32)
        s8 = b - 128
        planes[..., p, :, :] = s8.astype(np.int8)
        rows[..., p, :] = 128 * s8.sum(axis=-1)
    return planes, rows


class MxuNttTables:
    """Per-limb constant matrices for the four-step MXU transform."""

    def __init__(self, moduli: list[int], log_n: int, psi: list[int]):
        self.log_n = log_n
        n = 1 << log_n
        # A fixed at 256 (the step-1 contraction length that keeps every
        # byte-pair dot < 2^24, int32-exact); B = N/A ≤ 256 for logN ≤ 16
        assert 9 <= log_n <= 16, log_n
        log_b = log_n - 8
        A = 1 << (log_n - log_b)
        B = 1 << log_b
        self.A, self.B = A, B
        L = len(moduli)
        la, lb = log_n - log_b, log_b

        r = np.arange(A, dtype=np.int64)
        c = np.arange(B, dtype=np.int64)
        i1 = np.arange(A, dtype=np.int64)
        i2 = np.arange(B, dtype=np.int64)
        brv_r = _brv(r, la)
        brv_c = _brv(c, lb)
        two_n = 2 * n

        w1 = np.empty((L, A, A), dtype=np.uint64)
        tmid = np.empty((L, A, B), dtype=np.uint64)
        w2 = np.empty((L, B, B), dtype=np.uint64)
        iv2 = np.empty((L, B, B), dtype=np.uint64)
        itmid = np.empty((L, A, B), dtype=np.uint64)
        iv1 = np.empty((L, A, A), dtype=np.uint64)

        for li, (q, ps) in enumerate(zip(moduli, psi)):
            q = int(q)
            pows = _psi_pows(int(ps), q, two_n)
            ninv = pow(n, -1, q)

            odd_r = (2 * brv_r + 1)                       # [A]
            # forward
            e1 = (B * np.outer(i1, odd_r)) % two_n        # [A(i1), A(r)] → T
            w1[li] = pows[e1.T % two_n]                   # [r, i1]
            et = np.outer(odd_r, i2) % two_n              # [r, i2]
            tmid[li] = pows[et]
            e2 = (2 * A * np.outer(brv_c, i2)) % two_n    # [c, i2]
            w2[li] = pows[e2]
            # inverse (1/N folded into V1)
            iv2[li] = pows[(-2 * A * np.outer(i2, brv_c)) % two_n]  # [i2, c]
            itmid[li] = pows[(-np.outer(odd_r, i2)) % two_n]        # [r, i2]
            v1 = pows[(-B * np.outer(i1, odd_r)) % two_n]           # [i1, r]
            iv1[li] = (v1.astype(object) * ninv % q).astype(np.uint64)

        # byte planes + row corrections (int8 matmul operands)
        self.w1_b, self.w1_r = _byte_planes(w1)        # [L,8,A,A], [L,8,A]
        self.w2_b, self.w2_r = _byte_planes(w2)        # [L,8,B,B]
        self.iv2_b, self.iv2_r = _byte_planes(iv2)     # [L,8,B,B] ([i2,c])
        self.iv1_b, self.iv1_r = _byte_planes(iv1)     # [L,8,A,A] ([i1,r])

        # middle twiddles in Montgomery form
        def to_mont(x):
            out = np.empty_like(x)
            for li, q in enumerate(int(m) for m in moduli):
                out[li] = (x[li].astype(object) * ((1 << 64) % q) % q
                           ).astype(np.uint64)
            return out
        self.t_mont = to_mont(tmid)
        self.it_mont = to_mont(itmid)

        # per-limb Montgomery constants for the recombination:
        # 2^{8·5} and 2^{8·10} in Montgomery form, plus r1 = 2^64 mod q
        c40 = np.empty((L, 1, 1), dtype=np.uint64)
        c80 = np.empty((L, 1, 1), dtype=np.uint64)
        r1 = np.empty((L, 1, 1), dtype=np.uint64)
        for li, q in enumerate(int(m) for m in moduli):
            c40[li] = (1 << 40) * ((1 << 64) % q) % q
            c80[li] = ((1 << 80) % q) * ((1 << 64) % q) % q
            r1[li] = (1 << 64) % q
        self.c40, self.c80, self.r1 = c40, c80, r1
        # bytes needed to represent a canonical residue of each limb —
        # the adaptive-width path runs 30/45/55-bit limbs with 4/6/7 byte
        # planes instead of 8, cutting the dominant [8M, 8N] int32
        # intermediate (and its recombination pass) proportionally.
        self.nbytes = [max(1, (int(q).bit_length() + 7) // 8)
                       for q in moduli]
        self._cache: dict = {}

    def group(self, idx: tuple[int, ...], nb: int = 8):
        key = (idx, nb)
        got = self._cache.get(key)
        if got is None:
            assert all(self.nbytes[i] <= nb for i in idx), (idx, nb)
            sel = list(idx)
            planed = {0, 1, 3, 4, 5, 6, 8, 9}       # tensors with a byte-
            with jax.ensure_compile_time_eval():    # plane axis at dim 1
                got = tuple(
                    jnp.asarray(t[sel][:, :nb] if k in planed else t[sel])
                    for k, t in enumerate((
                        self.w1_b, self.w1_r, self.t_mont, self.w2_b,
                        self.w2_r, self.iv2_b, self.iv2_r, self.it_mont,
                        self.iv1_b, self.iv1_r, self.c40, self.c80,
                        self.r1)))
            self._cache[key] = got
        return got

    def group_scan(self, idx: tuple[int, ...], nb: int, g: int,
                   q_np: np.ndarray, qinv_np: np.ndarray):
        """Constants for the scan-over-limb-groups transforms: leading
        axes [nG, g] (limb list padded to a multiple of g by repeating
        the last limb — the duplicate transform output is sliced off)."""
        key = ("scan", idx, nb, g)
        got = self._cache.get(key)
        if got is None:
            assert all(self.nbytes[i] <= nb for i in idx), (idx, nb)
            L = len(idx)
            nG = -(-L // g)
            sel = list(idx) + [idx[-1]] * (nG * g - L)
            planed = {0, 1, 3, 4, 5, 6, 8, 9}
            mats = (self.w1_b, self.w1_r, self.t_mont, self.w2_b, self.w2_r,
                    self.iv2_b, self.iv2_r, self.it_mont, self.iv1_b,
                    self.iv1_r, self.c40, self.c80, self.r1)
            with jax.ensure_compile_time_eval():
                out = []
                for k, t in enumerate(mats):
                    tt = t[sel][:, :nb] if k in planed else t[sel]
                    out.append(jnp.asarray(tt.reshape((nG, g) + tt.shape[1:])))
                out.append(jnp.asarray(q_np[sel].reshape(nG, g, 1)))
                out.append(jnp.asarray(qinv_np[sel].reshape(nG, g, 1)))
            got = tuple(out)
            self._cache[key] = got
        return got

    def buckets(self, idx: tuple[int, ...]) -> list[tuple[tuple[int, ...], int]]:
        """Partition positions of `idx` into byte-width classes.

        Returns [(positions_into_idx, nb)] — each bucket transformed in
        its own (narrower) int8 matmul.  Classes with <3 limbs merge into
        a wider bucket (always safe: a residue fits any nb ≥ its own)
        so tiny buckets don't multiply kernel count.
        """
        nbs = [self.nbytes[i] for i in idx]
        out: list[tuple[tuple[int, ...], int]] = []
        pend: list[int] = []
        pend_nb = 0
        for c in sorted(set(nbs), reverse=True):
            pend += [p for p, v in enumerate(nbs) if v == c]
            pend_nb = max(pend_nb, c)
            if len(pend) >= 3:
                out.append((tuple(pend), pend_nb))
                pend, pend_nb = [], 0
        if pend:
            if out:           # fold leftover small limbs into a wider bucket
                pos, nb = out[-1]
                out[-1] = (pos + tuple(pend), nb)
            else:
                out.append((tuple(pend), pend_nb))
        return out


# ---------------------------------------------------------------------------
# exact modular matmul on int8 tiles
# ---------------------------------------------------------------------------

def _x_bytes(x, nb=8):
    """u64 [.., L, T, NN] → int8 [.., L, T, nb·NN] (bytes−128, byte-major
    along the last axis), plus col corrections [.., L, nb, NN]."""
    outs = []
    cols = []
    for s in range(nb):
        b = ((x >> jnp.uint64(8 * s)) & jnp.uint64(0xFF)).astype(jnp.int32)
        s8 = b - 128
        outs.append(s8.astype(jnp.int8))
        cols.append(128 * s8.sum(axis=-2))
    return jnp.concatenate(outs, axis=-1), jnp.stack(cols, axis=-2)


def _mod_matmul(w_b, w_r, xb, xc, q, qinv, c40, c80, r1, T):
    """Σ_t W[m,t]·x[t,n] mod q.

    w_b [L, nb, M, T] int8 (W bytes − 128), w_r [L, nb, M] row corrections,
    xb [.., L, T, nb·N] int8, xc [.., L, nb, N] col corrections,
    T = contraction length.  nb = byte planes (8 for 64-bit limbs; fewer
    for narrow limbs — see MxuNttTables.nbytes).  Returns [.., L, M, N]
    canonical u64.
    """
    L, nb, M, _ = w_b.shape
    N = xc.shape[-1]
    # lhs layout: [(p·M+m), t] — p-major, so tile (p, s) lands at
    # [p·M:(p+1)·M, s·N:(s+1)·N] of the big product
    w_flat = w_b.reshape(L, nb * M, T)
    big = jnp.einsum("lmt,...ltn->...lmn", w_flat, xb,
                     preferred_element_type=jnp.int32)    # [.., L, nbM, nbN]
    lead = big.shape[:-3]
    big = big.reshape(lead + (L, nb, M, nb, N))

    # byte-diagonal groups s' = p + s ∈ [0, 2nb−2], with corrections:
    #   true product tile(p,s) = big[p,s] + 128·Σ_t W_s8 (row) +
    #                            128·Σ_t x_s8 (col) + 128²·T
    K = jnp.int32(128 * 128 * T)
    groups = []
    for sp in range(2 * nb - 1):
        acc = None
        for p in range(max(0, sp - (nb - 1)), min(nb, sp + 1)):
            s = sp - p
            t = (big[..., p, :, s, :]
                 + w_r[:, p, :, None] + xc[..., s, None, :] + K)
            acc = t if acc is None else acc + t
        groups.append(acc)                                  # i32 < 2^27

    # R = Lo + 2^40·Mi + 2^80·Hi (each ≤ Σ 2^{8k}·2^27 < 2^60, exact u64)
    def part(gs):
        acc = gs[-1].astype(jnp.uint64)
        for g in gs[-2::-1]:
            acc = (acc << jnp.uint64(8)) + g.astype(jnp.uint64)
        return acc

    out = mm.mont_mul(part(groups[0:5]), r1, q, qinv)       # lo mod q
    if len(groups) > 5:
        out = mm.add_mod(out, mm.mont_mul(part(groups[5:10]), c40, q, qinv),
                         q)
    if len(groups) > 10:
        out = mm.add_mod(out, mm.mont_mul(part(groups[10:15]), c80, q, qinv),
                         q)
    return out


# ---------------------------------------------------------------------------
# public transforms
# ---------------------------------------------------------------------------

def _fwd_body(a, w1_b, w1_r, t_mont, w2_b, w2_r, c40, c80, r1, q, qinv,
              log_n, log_b):
    n = 1 << log_n
    B = 1 << log_b
    A = n // B
    shape = a.shape
    x = a.reshape(shape[:-1] + (A, B))
    q3 = q[..., None]
    qi3 = qinv[..., None]
    nb = w1_b.shape[1]
    # step 1: Y[r, i2] = Σ_{i1} W1[r, i1]·x[i1, i2]  (contraction T = A)
    xb, xc = _x_bytes(x, nb)
    y = _mod_matmul(w1_b, w1_r, xb, xc, q3, qi3, c40, c80, r1, A)
    # step 2: ⊙ T (Montgomery)
    z = mm.mont_mul(y, t_mont, q3, qi3)
    # step 3: X[r, c] = Σ_{i2} W2[c, i2]·z[r, i2] → (z ·q W2ᵀ); transpose
    # z so the contraction axis is second-to-last: [.., L, i2, r?]  — use
    # the same helper with x = zᵀ then transpose back.
    zt = jnp.swapaxes(z, -1, -2)                       # [.., L, B(i2), A(r)]
    zb, zc = _x_bytes(zt, nb)
    xt = _mod_matmul(w2_b, w2_r, zb, zc, q3, qi3, c40, c80, r1, B)
    out = jnp.swapaxes(xt, -1, -2)                     # [.., L, A(r), B(c)]
    return out.reshape(shape)


_mxu_fwd = functools.partial(jax.jit, static_argnames=("log_n", "log_b"))(
    _fwd_body)


def _inv_body(a, iv2_b, iv2_r, it_mont, iv1_b, iv1_r, c40, c80, r1, q, qinv,
              log_n, log_b):
    n = 1 << log_n
    B = 1 << log_b
    A = n // B
    shape = a.shape
    x = a.reshape(shape[:-1] + (A, B))                 # [.., L, r, c]
    q3 = q[..., None]
    qi3 = qinv[..., None]
    nb = iv2_b.shape[1]
    # step 1: U[r, i2] = Σ_c V2[i2, c]·x[r, c] → (x ·q V2ᵀ)
    xt = jnp.swapaxes(x, -1, -2)                       # [.., L, c, r]
    xb, xc = _x_bytes(xt, nb)
    ut = _mod_matmul(iv2_b, iv2_r, xb, xc, q3, qi3, c40, c80, r1, B)
    u = jnp.swapaxes(ut, -1, -2)                       # [.., L, r, i2]
    # step 2: ⊙ Ti
    u = mm.mont_mul(u, it_mont, q3, qi3)
    # step 3: a[i1, i2] = Σ_r V1[i1, r]·u[r, i2]
    ub, uc = _x_bytes(u, nb)
    out = _mod_matmul(iv1_b, iv1_r, ub, uc, q3, qi3, c40, c80, r1, A)
    return out.reshape(shape)


_mxu_inv = functools.partial(jax.jit, static_argnames=("log_n", "log_b"))(
    _inv_body)


# ---------------------------------------------------------------------------
# scan-over-limb-groups variants (compile-light for wide stacks)
# ---------------------------------------------------------------------------
#
# The per-limb constants are a BATCH axis of the int8 matmuls, so the
# traced graph is limb-count independent — but the remote XLA-TPU
# helper's compile time still grows superlinearly with the batched
# matmul extent (a level-27 decntt never finished in 50 min unrolled).
# These variants lax.scan over fixed-size limb GROUPS with the constants
# as scan inputs: the compiled body covers one group, so compile cost is
# bounded while each step still issues [nb·A, A]×[A, nb·B] MXU work per
# limb of the group.  Bit-identical to the unrolled path (same body).

def _scan_transform(body, a, consts, log_n, log_b):
    """consts: tuple of arrays with leading [nG, G]; a [.., L, N]."""
    nG, G = consts[0].shape[:2]
    L = a.shape[-2]
    pad = nG * G - L
    if pad:
        a = jnp.concatenate(
            [a, jnp.repeat(a[..., -1:, :], pad, axis=-2)], axis=-2)
    batch = a.shape[:-2]
    n = a.shape[-1]
    xs_a = jnp.moveaxis(a.reshape(batch + (nG, G, n)), len(batch), 0)

    def step(_, xs):
        ag, cs = xs
        return None, body(ag, *cs, log_n, log_b)

    _, out = jax.lax.scan(step, None, (xs_a, consts))
    out = jnp.moveaxis(out, 0, len(batch)).reshape(batch + (nG * G, n))
    return out[..., :L, :] if pad else out


@functools.partial(jax.jit, static_argnames=("log_n", "log_b"))
def _mxu_fwd_scan(a, w1_b, w1_r, t_mont, w2_b, w2_r, c40, c80, r1, q, qinv,
                  log_n, log_b):
    return _scan_transform(
        _fwd_body, a, (w1_b, w1_r, t_mont, w2_b, w2_r, c40, c80, r1, q, qinv),
        log_n, log_b)


@functools.partial(jax.jit, static_argnames=("log_n", "log_b"))
def _mxu_inv_scan(a, iv2_b, iv2_r, it_mont, iv1_b, iv1_r, c40, c80, r1, q,
                  qinv, log_n, log_b):
    return _scan_transform(
        _inv_body, a,
        (iv2_b, iv2_r, it_mont, iv1_b, iv1_r, c40, c80, r1, q, qinv),
        log_n, log_b)
