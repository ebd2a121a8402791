"""Multi-device sharding tests on the fake 8-CPU-device mesh.

Validates what the reference never had (SURVEY.md §4.7): the limb/batch
sharded evaluator compiles and produces results identical to the
single-device path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from optimal_conv_tpu.parallel import sharding as sh
from optimal_conv_tpu.ckks.params import CkksParams
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.core import ntt as nttmod
from optimal_conv_tpu.core import modmath as mm


def test_mesh_factoring():
    mesh = sh.make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "tp")


def test_dryrun_8_devices():
    sh.dryrun(8)


def test_sharded_matches_single_device():
    """Sharded layer step == unsharded step, bit for bit."""
    params = CkksParams(log_n=8, logq=(45,) + (35,) * 7, logp=(45, 45, 45, 45),
                        log_scale=25, h=32)
    ctx = CkksContext(params, seed=0)
    level = params.max_level
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, params.scale, level))
    pt = ctx.encoder.encode_coeffs(rng.uniform(-1, 1, 8), params.scale, level)
    g = nttmod.rot_to_galois(1, params.log_n)
    swk = ctx.galois_key(g, level)
    perm = jnp.asarray(nttmod.galois_perm_ntt(params.log_n, g))

    mesh = sh.make_mesh(8)
    step = sh.build_sharded_layer_step(ctx, level, mesh)
    b = mesh.devices.shape[0]
    c0 = jnp.broadcast_to(ct.c0, (b,) + ct.c0.shape)
    c1 = jnp.broadcast_to(ct.c1, (b,) + ct.c1.shape)
    o0, o1 = step(jax.device_put(c0, sh.ct_sharding(mesh)),
                  jax.device_put(c1, sh.ct_sharding(mesh)),
                  pt.poly, perm, swk.d0, swk.d1)

    # single-device reference: mul_plain → rotate → rescale
    ref = ctx.rescale(ctx.rotate(ctx.mul_plain(ct, pt), 1))
    np.testing.assert_array_equal(np.asarray(o0[0]), np.asarray(ref.c0))
    np.testing.assert_array_equal(np.asarray(o0[-1]), np.asarray(ref.c0))
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(ref.c1))


def test_hybrid_dcn_mesh_matches_single_device():
    """(dcn, dp, tp) hybrid mesh — batch over hosts (DCN) and chips, limbs
    over ICI — produces bit-identical results to the single-device path.
    Single-process emulation: leading axis = host granularity; the GSPMD
    partitioning (and so the collective placement) is what's validated."""
    mesh = sh.make_hybrid_mesh(8, n_hosts=2)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    assert mesh.devices.shape == (2, 1, 4)   # tp greedily fills ICI

    params = CkksParams(log_n=8, logq=(45,) + (35,) * 7, logp=(45,) * 4,
                        log_scale=25, h=32)
    ctx = CkksContext(params, seed=0)
    level = params.max_level
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, params.scale, level))
    pt = ctx.encoder.encode_coeffs(rng.uniform(-1, 1, 8), params.scale, level)
    g = nttmod.rot_to_galois(1, params.log_n)
    swk = ctx.galois_key(g, level)
    perm = jnp.asarray(nttmod.galois_perm_ntt(params.log_n, g))

    step = sh.build_sharded_layer_step(ctx, level, mesh)
    b = 4    # dcn × dp batch shards
    c0 = jnp.broadcast_to(ct.c0, (b,) + ct.c0.shape)
    c1 = jnp.broadcast_to(ct.c1, (b,) + ct.c1.shape)
    o0, o1 = step(jax.device_put(c0, sh.batch_sharding(mesh)),
                  jax.device_put(c1, sh.batch_sharding(mesh)),
                  pt.poly, perm, swk.d0, swk.d1)

    ref = ctx.rescale(ctx.rotate(ctx.mul_plain(ct, pt), 1))
    np.testing.assert_array_equal(np.asarray(o0[0]), np.asarray(ref.c0))
    np.testing.assert_array_equal(np.asarray(o0[-1]), np.asarray(ref.c0))
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(ref.c1))


def test_init_distributed_single_process():
    assert sh.init_distributed() == 1


def test_coeff_axis_sharding_matches_single_device():
    """sp (coefficient-axis) sharding: NTT butterflies + keyswitch across
    a (dp,tp,sp)=(2,2,2) mesh — GSPMD inserts the stage collectives; the
    result is bit-identical to the single-device path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    params = CkksParams(log_n=8, logq=(45,) + (35,) * 7, logp=(45,) * 4,
                        log_scale=25, h=32)
    ctx = CkksContext(params, seed=0)
    lvl = params.max_level
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, params.scale, lvl))

    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2), ("dp", "tp", "sp"))
    shd = NamedSharding(mesh, P("tp", "sp"))
    idx = params.q_idx(lvl)
    f = jax.jit(lambda a: params.ntt.intt(params.ntt.ntt(a, idx), idx),
                in_shardings=shd, out_shardings=shd)
    out = f(jax.device_put(ct.c0, shd))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ct.c0))

    g = nttmod.rot_to_galois(1, params.log_n)
    swk = ctx.galois_key(g, lvl)
    perm = jnp.asarray(nttmod.galois_perm_ntt(params.log_n, g))
    dec = ctx._build_decompose(lvl)
    core = ctx._ks_core_builder(lvl)
    ksh = NamedSharding(mesh, P(None, "tp", "sp"))

    def step(c1, pm, d0, d1):
        return core(dec(nttmod.apply_galois_ntt(c1, pm)), d0, d1)

    fs = jax.jit(step, in_shardings=(shd, NamedSharding(mesh, P()), ksh, ksh))
    o0, _ = fs(jax.device_put(ct.c1, shd), perm,
               jax.device_put(swk.d0, ksh), jax.device_put(swk.d1, ksh))
    ref = ctx.keyswitch(nttmod.apply_galois_ntt(ct.c1, perm), lvl, swk)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(ref[0]))
