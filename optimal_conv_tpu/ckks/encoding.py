"""CKKS encoders: coefficient packing (primary) and slot packing.

Replaces the fork's ``ckks/encoder.go`` (SURVEY.md C9/C10).  The
reference's main data path is **coefficient encoding** — real vector →
polynomial coefficients directly (``EncodeCoeffs``/``DecodeCoeffs``,
/root/reference/test.go:46,60) — which makes homomorphic convolution a
single negacyclic polynomial product.  Slot encoding (canonical
embedding) is used for masks/diagonals in repacking and bootstrapping.

Encode/decode are *client-side* operations: they run host-side in
numpy float64/complex128 (TPU has no f64) and are not on the
homomorphic hot path.  Plaintext diagonals/masks produced here are
cached on device by their consumers.

Slot convention: slot t of a (sub)ring of degree m=2n holds p(w^{5^t}),
w = e^{2πi/(4n)}.  Left-rotation by r (slot t ← t+r) is the Galois
automorphism X → X^{5^r}; conjugation is X → X^{-1}.  For
log_slots < log_n-1 the 2n coefficients sit at stride N/(2n) in the
big ring and slot values replicate.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..core import modmath as mm
from .types import Plaintext
from .params import CkksParams


@functools.lru_cache(maxsize=None)
def _rot_group(log_slots: int) -> np.ndarray:
    n = 1 << log_slots
    m = 4 * n
    out = np.empty(n, dtype=np.int64)
    acc = 1
    for t in range(n):
        out[t] = acc
        acc = acc * 5 % m
    return out


def slots_to_coeffs_np(z: np.ndarray) -> np.ndarray:
    """Inverse canonical embedding: complex[n] slots → real[2n] coefficients."""
    n = z.shape[-1]
    m = 4 * n
    e = _rot_group(int(np.log2(n)))
    buf = np.zeros(z.shape[:-1] + (m,), dtype=np.complex128)
    buf[..., e] = z
    buf[..., m - e] = np.conj(z)
    c = np.fft.fft(buf, axis=-1)[..., : 2 * n] / (2 * n)
    return np.ascontiguousarray(c.real)


def coeffs_to_slots_np(c: np.ndarray) -> np.ndarray:
    """Canonical embedding: real[2n] coefficients → complex[n] slot values."""
    two_n = c.shape[-1]
    n = two_n // 2
    m = 4 * n
    e = _rot_group(int(np.log2(n)))
    buf = np.zeros(c.shape[:-1] + (m,), dtype=np.complex128)
    buf[..., :two_n] = c
    v = np.fft.ifft(buf, axis=-1) * m
    return np.ascontiguousarray(v[..., e])


class Encoder:
    def __init__(self, params: CkksParams):
        self.params = params

    # ---- coefficient packing (EncodeCoeffs / DecodeCoeffs) --------------

    def encode_coeffs(self, values: np.ndarray, scale: float, level: int,
                      to_ntt: bool = True, mont: bool = True) -> Plaintext:
        """Real vector (len ≤ N, zero-padded) → plaintext at `level`/`scale`."""
        p = self.params
        v = np.zeros(p.n, dtype=np.float64)
        v[: len(values)] = np.asarray(values, dtype=np.float64)
        ints = np.round(v * scale)
        res = self._ints_to_residues(ints, level)
        return self._finalize(res, level, scale, to_ntt, mont)

    def decode_coeffs(self, poly_coeff: np.ndarray, scale: float) -> np.ndarray:
        """[l+1, N] coeff-domain residues → float64[N].  CRT big-int when l>0."""
        p = self.params
        res = np.asarray(poly_coeff)
        level = res.shape[0] - 1
        if level == 0:
            q = p.q_moduli[0]
            c = res[0].astype(np.int64)
            c = np.where(c > q // 2, c - q, c)
            return c.astype(np.float64) / scale
        from .. import native
        fast = native.crt_decode_centered(res, p.q_moduli[: level + 1], scale)
        if fast is not None:
            return fast
        cent = mm.residues_to_centered(res, p.q_moduli[: level + 1])
        return np.array([float(x) for x in cent]) / scale

    # ---- slot packing (Encode / Decode, canonical embedding) ------------

    def encode_slots(self, z: np.ndarray, scale: float, level: int,
                     log_slots: int | None = None, to_ntt: bool = True,
                     mont: bool = True, qp: bool = False) -> Plaintext:
        """Complex slot vector (len 2^log_slots) → plaintext.

        qp=True: residues over the EXTENDED basis Q_level·P (the double-
        hoisted BSGS path multiplies plaintexts into QP-basis keyswitch
        accumulators before the per-giant mod-down — Bossuat et al. '21).
        The first level+1 limb rows are identical to the qp=False
        encoding (qp_idx = q_idx + p_idx)."""
        p = self.params
        ls = p.log_slots if log_slots is None else log_slots
        n = 1 << ls
        zz = np.zeros(n, dtype=np.complex128)
        zz[: len(z)] = np.asarray(z, dtype=np.complex128)
        c2n = slots_to_coeffs_np(zz)                 # [2n]
        gap = p.n // (2 * n)
        v = np.zeros(p.n, dtype=np.float64)
        v[::gap] = c2n
        ints = np.round(v * scale)
        res = self._ints_to_residues(ints, level, qp=qp)
        return self._finalize(res, level, scale, to_ntt, mont, qp=qp)

    def decode_slots(self, poly_coeff: np.ndarray, scale: float,
                     log_slots: int | None = None) -> np.ndarray:
        """[l+1, N] coeff-domain residues → complex slots[2^log_slots]."""
        p = self.params
        ls = p.log_slots if log_slots is None else log_slots
        n = 1 << ls
        gap = p.n // (2 * n)
        c = self.decode_coeffs(poly_coeff, scale)
        return coeffs_to_slots_np(c[::gap])

    # ---- helpers --------------------------------------------------------

    def _ints_to_residues(self, ints: np.ndarray, level: int,
                          qp: bool = False) -> np.ndarray:
        p = self.params
        idx = p.qp_idx(level) if qp else p.q_idx(level)
        mods = [p.moduli[i] for i in idx]
        if np.abs(ints).max() < 2**62:
            return mm.centered_to_residues(ints.astype(np.int64), mods)
        big = np.array([int(x) for x in ints], dtype=object)
        return mm.centered_to_residues(big, mods)

    def _finalize(self, res: np.ndarray, level: int, scale: float,
                  to_ntt: bool, mont: bool, qp: bool = False) -> Plaintext:
        p = self.params
        poly = jnp.asarray(res)
        idx = p.qp_idx(level) if qp else p.q_idx(level)
        if to_ntt:
            poly = p.ntt.ntt(poly, idx)
        if mont:
            q, qinv, r2, _, _, _, _ = p.ntt.tabs(idx)
            poly = mm.to_mont(poly, q, qinv, r2)
        return Plaintext(poly, level=level, scale=float(scale),
                         is_ntt=to_ntt, is_mont=mont)
