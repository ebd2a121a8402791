"""Multi-device sharding tests on the fake 8-CPU-device mesh.

Validates what the reference never had (SURVEY.md §4.7): the limb/batch
sharded evaluator compiles and produces results identical to the
single-device path.
"""

import numpy as np
import pytest
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


@pytest.mark.slow_e2e
def test_sharded_fused_layer_bit_exact():
    """The FULL fused layer (conv+BN → CtoS → ReLU → repack → StoC) with
    the limb axis tp-sharded over the 8-device mesh produces EXACTLY the
    same ciphertext as the single-device run — same keys, same input,
    integer modular arithmetic end to end (VERDICT r1 #10)."""
    from optimal_conv_tpu.ckks.params import mini_boot_params
    from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper
    from optimal_conv_tpu.ops import conv as convops
    from optimal_conv_tpu.ops import repack as rp
    from optimal_conv_tpu.ops.pipeline import eval_conv_bn_relu, LayerMaps

    params = mini_boot_params(log_n=10, n_relu=14)
    ctx = CkksContext(params, seed=19)
    n = params.n
    in_wid, ker_wid = 16, 3
    raw = in_wid - ker_wid // 2
    max_batch = n // (in_wid * in_wid)
    norm, ls = 4, 2
    real_b = max_batch // norm

    rng = np.random.default_rng(41)
    img = rng.uniform(-0.8, 0.8, (raw, raw, real_b))
    ker = rng.uniform(-1, 1, (ker_wid, ker_wid, real_b, real_b)) / 4.0
    bn_a = rng.uniform(0.8, 1.2, real_b)
    bn_b = rng.uniform(-0.2, 0.2, real_b)
    inp = convops.prep_input(img.ravel(), raw, in_wid, n, norm)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, params.scale, 1))

    btps = {ls: SplitBootstrapper(ctx, log_sparse=ls, k_range=12.0,
                                  sin_deg=31, double_angle=3)}
    maps = LayerMaps(ext_idx=[
        rp.gen_keep_vec_sparse(n // 2, in_wid, raw, ls), None])

    def run(ct_in):
        out = eval_conv_bn_relu(ctx, btps, ct_in, ker.ravel(), bn_a, bn_b,
                                0.0, 4.0, in_wid, raw, ker_wid, real_b,
                                real_b, norm, 0, 1, 2, ls, "Conv_sparse",
                                maps)
        return np.asarray(out.c0), np.asarray(out.c1)

    single0, single1 = run(ct)
    mesh = sh.make_mesh(8)
    shard0, shard1 = run(sh.shard_ct(ct, mesh))
    np.testing.assert_array_equal(single0, shard0)
    np.testing.assert_array_equal(single1, shard1)
