"""Multi-chip sharding for the CKKS evaluator.

The reference is strictly single-process (SURVEY.md §2.3 — no MPI/NCCL/
goroutine fan-out anywhere); its only parallelism is SIMD packing inside
one ciphertext.  This module adds what it lacks, the TPU-native way:

  dp  (data parallel)      batch of ciphertexts/images — the reference's
                           outer `for iter` loop (test.go:128)
  tp  (tensor parallel)    the RNS limb axis of [L, N] polynomials:
                           NTT/pointwise/automorphism are limb-local;
                           key-switch basis extension and rescale induce
                           cross-limb collectives, which XLA GSPMD
                           inserts from the shardings (all-gather /
                           reduce-scatter over ICI)
  sp  (sequence parallel)  the N coefficient axis; NTT butterfly stages
                           whose stride crosses the shard boundary
                           become stage-wise collective permutes

Everything runs through jit with NamedSharding-annotated inputs — no
hand-written collectives; the compiler lays communication on ICI.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import modmath as mm
from ..core import ntt as nttmod
from ..ckks.params import CkksParams
from ..ckks.context import CkksContext


def make_mesh(n_devices: int | None = None, axis_names=("dp", "tp")) -> Mesh:
    """Factor the device count into a (dp, tp) mesh (tp innermost so
    limb collectives ride the fastest links)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    tp = 1
    while tp * 2 <= n and n % (tp * 2) == 0 and tp < 4:
        tp *= 2
    dp = n // tp
    return Mesh(np.asarray(devs[:n]).reshape(dp, tp), axis_names)


def ct_sharding(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """[B, l+1, N] ciphertext batches: batch→dp, limbs→tp, coeffs local."""
    if batched:
        return NamedSharding(mesh, P("dp", "tp", None))
    return NamedSharding(mesh, P(None, "tp", None))


def key_sharding(mesh: Mesh) -> NamedSharding:
    """[beta, l+1+P, N] switching keys: limbs→tp, replicated over dp."""
    return NamedSharding(mesh, P(None, "tp", None))


def build_sharded_layer_step(ctx: CkksContext, level: int, mesh: Mesh):
    """A jitted, mesh-sharded fused step: ct×pt conv product + Galois
    rotation (full hybrid key-switch) + rescale, vmapped over a batch.

    This is the communication-complete core of one encrypted conv layer:
    limb-parallel NTT/pointwise work plus the cross-limb traffic of
    basis extension and mod-down, laid out by GSPMD over the mesh.
    """
    p = ctx.params
    dec = ctx._build_decompose(level)
    core = ctx._ks_core_builder(level)
    q, qinv, _, _, _, _, _ = p.ntt.tabs(p.q_idx(level))
    sub = p.q_idx(level)[:-1]
    qs, qsinv, _, r1, _, _, _ = p.ntt.tabs(sub)
    q_top = p.q_moduli[level]
    half = jnp.uint64(q_top // 2)
    qtop_mod = jnp.asarray(np.array([q_top % qi for qi in p.q_moduli[:level]],
                                    dtype=np.uint64)[:, None])
    qlast_inv = p.qlast_inv_mont(level)
    ntt = p.ntt

    def rescale_poly(c):
        t = ntt.intt(c[level:], (level,))
        red = mm.mont_mul(t, r1, qs, qsinv)
        red = jnp.where(t > half, mm.sub_mod(red, qtop_mod, qs), red)
        return mm.mont_mul(mm.sub_mod(c[:level], ntt.ntt(red, sub), qs),
                           qlast_inv, qs, qsinv)

    def one(c0, c1, pt, perm, d0k, d1k):
        # conv product (NTT-domain ct×pt)
        m0 = mm.mont_mul(c0, pt, q, qinv)
        m1 = mm.mont_mul(c1, pt, q, qinv)
        # rotation: permute + hybrid key-switch (cross-limb collectives)
        c0p = nttmod.apply_galois_ntt(m0, perm)
        c1p = nttmod.apply_galois_ntt(m1, perm)
        ks0, ks1 = core(dec(c1p), d0k, d1k)
        r0 = mm.add_mod(c0p, ks0, q)
        # rescale (broadcast of the top limb)
        return rescale_poly(r0), rescale_poly(ks1)

    batched = jax.vmap(one, in_axes=(0, 0, None, None, None, None))

    cts = ct_sharding(mesh)
    ks = key_sharding(mesh)
    rep = NamedSharding(mesh, P())
    # out_shardings inferred: the rescale drops a limb, so the output limb
    # count may not divide tp evenly — GSPMD picks a valid layout.
    return jax.jit(
        batched,
        in_shardings=(cts, cts, NamedSharding(mesh, P("tp", None)), rep, ks, ks),
    )


def dryrun(n_devices: int, log_n: int = 8, levels: int = 7,
           batch: int | None = None) -> None:
    """Compile + execute one sharded layer step on an n_devices mesh.

    Used by the driver's multichip validation (see __graft_entry__) and
    by tests on the fake-CPU-device mesh.
    """
    mesh = make_mesh(n_devices)
    params = CkksParams(log_n=log_n, logq=(45,) + (35,) * levels,
                        logp=(45, 45, 45, 45), log_scale=25, h=32)
    ctx = CkksContext(params, seed=0)
    level = params.max_level
    dp = mesh.devices.shape[0]
    b = dp if batch is None else batch

    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, params.scale, level))
    c0 = jnp.broadcast_to(ct.c0, (b,) + ct.c0.shape)
    c1 = jnp.broadcast_to(ct.c1, (b,) + ct.c1.shape)
    pt = ctx.encoder.encode_coeffs(rng.uniform(-1, 1, 8), params.scale, level)
    g = nttmod.rot_to_galois(1, params.log_n)
    swk = ctx.galois_key(g, level)
    perm = jnp.asarray(nttmod.galois_perm_ntt(params.log_n, g))

    step = build_sharded_layer_step(ctx, level, mesh)
    o0, o1 = step(jax.device_put(c0, ct_sharding(mesh)),
                  jax.device_put(c1, ct_sharding(mesh)),
                  pt.poly, perm, swk.d0, ctx.swk_d1(swk))
    jax.block_until_ready((o0, o1))
    assert o0.shape == (b, level, params.n)
