"""CKKS parameter sets: moduli chains, scaling, key-switch layout.

Replaces ``ckks/params.go`` + ``ckks/bootstrap_params.go`` of the Go
Lattigo fork (SURVEY.md C1/C14): an RNS modulus chain Q = [q0..qL]
(level ℓ uses q0..qℓ), special primes P for hybrid key-switching, a
default scale 2^30, sparse ternary secret weight h=192, σ=3.2 — the
same envelope the reference prints at startup
(/root/reference/main.go:85-86: logN=16, logSlots=15, h=192,
logQP≈1553, 28 levels, scale 2^30).

The chain layout is organized around the reference's pipeline
(eval.go:272 evalConv_BNRelu_new):

    level 0        q0 (60b)     conv output / bootstrap base
    level 1        30b          conv input & kernels (ECD_LV = 1)
    levels 2-4     45b          StoC (slots→coeffs DFT, 3 merged stages)
    level 5        45b          post-ReLU repack masks (ext/keep)
    levels 6-16    30b          minimax ReLU (deg 7∘7∘13 + final mul)
    levels 17-24   55b          EvalMod (cosine cheby + double-angle)
    levels 25-28   55b          CtoS (3 merged DFT stages + sparse fold)

All moduli are NTT-friendly primes ≡ 1 mod 2N generated
deterministically from the bit-size lists (core.modmath.gen_ntt_primes).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from ..core import modmath as mm
from ..core import ntt as nttmod
from ..core import rns


@dataclass(frozen=True)
class CkksParams:
    log_n: int
    logq: tuple[int, ...]          # Q-chain bit sizes, level 0 first
    logp: tuple[int, ...]          # special primes
    log_scale: int = 30
    h: int = 192                   # secret key Hamming weight
    sigma: float = 3.2
    # level indices of pipeline stages (bootstrapping layout); None for
    # non-bootstrappable parameter sets.  compare=False keeps the
    # dataclass hashable (needed by the lru_caches below).
    boot_layout: dict | None = field(default=None, compare=False)
    # exact moduli (e.g. the reference fork's chains extracted from the
    # test_run binary — ref_bootstrap_params.json).  When set they
    # override the deterministic bit-size generation; logq/logp must
    # still hold the matching bit lengths (they drive layout decisions).
    q_explicit: tuple[int, ...] | None = None
    p_explicit: tuple[int, ...] | None = None

    # ---- derived --------------------------------------------------------

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def slots(self) -> int:
        return self.n // 2

    @property
    def log_slots(self) -> int:
        return self.log_n - 1

    @property
    def scale(self) -> float:
        return float(1 << self.log_scale)

    @property
    def max_level(self) -> int:
        return len(self.logq) - 1

    @functools.cached_property
    def q_moduli(self) -> list[int]:
        if self.q_explicit is not None:
            assert len(self.q_explicit) == len(self.logq)
            return list(self.q_explicit)
        return mm.gen_ntt_primes(self.log_n, list(self.logq) + list(self.logp))[
            : len(self.logq)]

    @functools.cached_property
    def p_moduli(self) -> list[int]:
        if self.p_explicit is not None:
            assert len(self.p_explicit) == len(self.logp)
            return list(self.p_explicit)
        return mm.gen_ntt_primes(self.log_n, list(self.logq) + list(self.logp))[
            len(self.logq):]

    @functools.cached_property
    def moduli(self) -> list[int]:
        """All limbs, Q first then P (global limb indexing)."""
        return self.q_moduli + self.p_moduli

    @property
    def num_p(self) -> int:
        return len(self.logp)

    @functools.cached_property
    def big_p(self) -> int:
        out = 1
        for p in self.p_moduli:
            out *= p
        return out

    @functools.cached_property
    def ntt(self) -> nttmod.NttContext:
        return nttmod.NttContext(self.moduli, self.log_n)

    # ---- limb index helpers --------------------------------------------

    def q_idx(self, level: int) -> tuple[int, ...]:
        """Global limb indices of Q-limbs at `level`."""
        return tuple(range(level + 1))

    def p_idx(self) -> tuple[int, ...]:
        lq = len(self.logq)
        return tuple(range(lq, lq + self.num_p))

    def qp_idx(self, level: int) -> tuple[int, ...]:
        return self.q_idx(level) + self.p_idx()

    def digits(self, level: int) -> list[tuple[int, ...]]:
        """Key-switch decomposition digits: groups of ≤|P| Q-limbs."""
        alpha = max(self.num_p, 1)
        idx = self.q_idx(level)
        return [idx[i:i + alpha] for i in range(0, len(idx), alpha)]

    @functools.lru_cache(maxsize=None)
    def extender(self, src: tuple[int, ...], dst: tuple[int, ...]) -> rns.BasisExtender:
        """Cached fast basis extender between global limb-index sets."""
        mods = self.moduli
        return rns.BasisExtender([mods[i] for i in src], [mods[i] for i in dst])

    @functools.lru_cache(maxsize=None)
    def digit_extender(self, level: int) -> "rns.DigitExtender":
        """Cached batched all-digits extender for the hybrid key-switch
        decompose at `level` (graph size independent of beta)."""
        return rns.DigitExtender(self.digits(level), self.qp_idx(level),
                                 self.moduli)

    @functools.lru_cache(maxsize=None)
    def p_inv_mont(self, level: int):
        """P^{-1} mod q_i (Montgomery form) for q-limbs at `level`: [l+1, 1]."""
        import jax.numpy as jnp
        vals = np.array(
            [pow(self.big_p % q, -1, q) * ((1 << 64) % q) % q
             for q in self.q_moduli[:level + 1]], dtype=np.uint64)
        return jnp.asarray(vals[:, None])

    @functools.lru_cache(maxsize=None)
    def qlast_inv_mont(self, level: int):
        """q_level^{-1} mod q_i (Montgomery) for i < level: [level, 1]."""
        import jax.numpy as jnp
        ql = self.q_moduli[level]
        vals = np.array(
            [pow(ql % q, -1, q) * ((1 << 64) % q) % q
             for q in self.q_moduli[:level]], dtype=np.uint64)
        return jnp.asarray(vals[:, None])


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

def ref_fork_chain(index: int = 6) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Exact (Q, P) moduli of the test_lattigo fork's
    DefaultBootstrapParams[index], extracted from the reference binary's
    data section (scripts/extract_ref_moduli.py →
    ref_bootstrap_params.json; validated against the binary's printed
    logQP=1553/1582 and QCount=28 — /root/reference/main.go:85)."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__),
                        "ref_bootstrap_params.json")
    e = json.load(open(path))[index]
    return tuple(e["q_chain"]), tuple(e["p"])


def boot_params(log_n: int = 16) -> CkksParams:
    """Bootstrappable parameters — the reference fork's EXACT chain.

    DefaultBootstrapParams[6] (logN=16, logSlots=15, h=192, logQP=1553,
    28 Q-limbs, scale 2^30, σ=3.2 — /root/reference/main.go:85),
    moduli bit-identical to the Go binary's (see ref_fork_chain).  All
    primes are ≡ 1 mod 2^17, so the same chain instantiates at any
    log_n ≤ 16 (CI runs it at 12).

    Level layout (bottom → top), matching the fork's section order
    Residual ++ StC ++ ReLU_A ++ ReLU_B ++ Sine ++ CtS:
        0      q0 2^55          conv output / bootstrap base
        1      2^49             conv inputs & kernels (ECD_LV = 1)
        2-3    2^60 ×2          StoC (3 DFT groups, top level holds 2)
        4      2^42             post-ReLU repack masks (ext/keep)
        5-15   2^30 ×11         minimax ReLU (tight deg 7∘7∘13 + mul)
        16-23  2^55 ×8          EvalMod (tight deg-63 cosine + 2 dbl-angle)
        24-27  2^53 ×4          CtoS (4 DFT groups; sparse: 3 + fold)
        P      2^61 ×5          hybrid key-switch (alpha=5, beta≤6)
    """
    q, p = ref_fork_chain(6)
    logq = tuple(round(np.log2(m)) for m in q)
    logp = tuple(round(np.log2(m)) for m in p)
    n_stoc, n_relu, n_mod, n_ctos = 2, 11, 8, 4
    layout = {
        "ecd": 1,
        "stoc": (2, 2 + n_stoc),                 # levels [2, 4)
        "stoc_groups": 3,                        # 3 matrices on 2 levels
        "repack": 2 + n_stoc,                    # 4 (the 42-bit prime)
        "relu": (3 + n_stoc, 3 + n_stoc + n_relu),
        "evalmod": (3 + n_stoc + n_relu, 3 + n_stoc + n_relu + n_mod),
        "ctos": (3 + n_stoc + n_relu + n_mod,
                 3 + n_stoc + n_relu + n_mod + n_ctos),
    }
    return CkksParams(log_n=log_n, logq=logq, logp=logp,
                      log_scale=30, h=192, sigma=3.2, boot_layout=layout,
                      q_explicit=q, p_explicit=p)


def mini_boot_params(log_n: int = 10, n_relu: int = 2,
                     n_mod: int = 9, stoc_groups: int | None = None) -> CkksParams:
    """Small bootstrappable set for unit tests (scale 2^25, q0 2^55).

    Same level layout structure as boot_params; pair with
    SplitBootstrapper(k_range=12, sin_deg=31, double_angle=3, h=64).
    n_mod > 9 leaves EvalMod slack for the arcsine option.
    stoc_groups > n_stoc (2) packs extra StoC matrices onto the top StoC
    level un-rescaled — the production chain's "3 matrices on 2 levels"
    double-top layout (boot_params stoc_groups=3), for tests/dryruns
    that must exercise the rescale=False LinearTransform path.
    """
    n_stoc, n_ctos = 2, 3
    logq = (55, 35) + (35,) * n_stoc + (35,) + (25,) * n_relu + (45,) * n_mod \
        + (45,) * n_ctos
    layout = {
        "ecd": 1,
        "stoc": (2, 2 + n_stoc),
        "repack": 2 + n_stoc,
        "relu": (3 + n_stoc, 3 + n_stoc + n_relu),
        "evalmod": (3 + n_stoc + n_relu, 3 + n_stoc + n_relu + n_mod),
        "ctos": (3 + n_stoc + n_relu + n_mod,
                 3 + n_stoc + n_relu + n_mod + n_ctos),
    }
    if stoc_groups is not None:
        layout["stoc_groups"] = stoc_groups
    return CkksParams(log_n=log_n, logq=logq, logp=(56, 56, 56, 56),
                      log_scale=25, h=64, sigma=3.2, boot_layout=layout)


def tiny_params(log_n: int = 10, levels: int = 5) -> CkksParams:
    """Small non-bootstrappable set for fast unit tests."""
    logq = (50,) + (40,) * levels
    return CkksParams(log_n=log_n, logq=logq, logp=(55, 55), log_scale=30,
                      h=min(64, (1 << log_n) // 4), sigma=3.2)
