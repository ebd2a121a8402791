"""Ciphertext / Plaintext containers.

Replaces ``rlwe/elements.go`` + the ckks wrappers of the Go fork: a
ciphertext is a pair of RNS polynomials with a level (top Q-limb index)
and a scale (float bookkeeping, Lattigo semantics).  Polynomials are
``[l+1, N]`` uint64 arrays, NTT domain (bit-reversed) and standard
(non-Montgomery) form unless stated otherwise.

Plaintext polynomials destined for ct×pt multiplication are stored in
NTT + *Montgomery* form so the product is a single fused REDC pass
(mirrors the reference's ``encoder.ToNTT(pl)`` pre-conversion,
/root/reference/conv.go:514).

Both types are pytrees with (level, scale, domain flags) as static
metadata, so evaluator functions jit cleanly per (level, scale) shape.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@dataclass
class Ciphertext:
    c0: jnp.ndarray                 # [l+1, N]
    c1: jnp.ndarray                 # [l+1, N]
    level: int = None               # static metadata
    scale: float = None             # static metadata
    is_ntt: bool = True             # static metadata

    def __post_init__(self):
        if self.level is None:
            self.level = self.c0.shape[-2] - 1

    def with_scale(self, scale: float) -> "Ciphertext":
        return replace(self, scale=float(scale))

    def copy(self) -> "Ciphertext":
        return replace(self)


@dataclass
class Plaintext:
    poly: jnp.ndarray               # [l+1, N]
    level: int = None               # static metadata
    scale: float = None             # static metadata
    is_ntt: bool = True             # static metadata
    is_mont: bool = True            # static metadata

    def __post_init__(self):
        if self.level is None:
            self.level = self.poly.shape[-2] - 1


def _flatten_ct(ct):
    return (ct.c0, ct.c1), (ct.level, ct.scale, ct.is_ntt)


def _unflatten_ct(aux, children):
    return Ciphertext(children[0], children[1], level=aux[0], scale=aux[1],
                      is_ntt=aux[2])


def _flatten_pt(pt):
    return (pt.poly,), (pt.level, pt.scale, pt.is_ntt, pt.is_mont)


def _unflatten_pt(aux, children):
    return Plaintext(children[0], level=aux[0], scale=aux[1], is_ntt=aux[2],
                     is_mont=aux[3])


jax.tree_util.register_pytree_node(Ciphertext, _flatten_ct, _unflatten_ct)
jax.tree_util.register_pytree_node(Plaintext, _flatten_pt, _unflatten_pt)
