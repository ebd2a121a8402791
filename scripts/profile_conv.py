#!/usr/bin/env python
"""Break down the encrypted conv3x3 benchmark into device-time pieces.

Times (honest chained sync) at the bench geometry logN=16, batch 4:
  - ct x pt mul + scale-fold + rescale 1->0 (x4 channels)
  - galois gather alone ([2, N] NTT-domain permutation)
  - level-0 keyswitch (decompose + inner product + mod-down)
  - the full fused conv_then_pack
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from optimal_conv_tpu.ckks.params import CkksParams
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.core import modmath as mm
    from optimal_conv_tpu.core import ntt as nttmod
    from optimal_conv_tpu.ops import conv as convops
    from optimal_conv_tpu.utils.timing import sync, timeit_chained

    log_n = 16
    in_wid, ker_wid, batch = 128, 3, 4
    raw_wid = in_wid - ker_wid // 2
    params = CkksParams(log_n=log_n, logq=(60, 45), logp=(61,),
                        log_scale=30, h=192)
    ctx = CkksContext(params, seed=0)
    p = params
    rng = np.random.default_rng(0)

    img = rng.uniform(-1, 1, (raw_wid, raw_wid, batch))
    inp = convops.prep_input(img.ravel(), raw_wid, in_wid, p.n, 1)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, p.scale, 1))

    q01, qinv01, r2_01, _, _, _, _ = p.ntt.tabs((0, 1))
    q0, qinv0, r2_0, _, _, _, _ = p.ntt.tabs((0,))
    ntt = p.ntt

    # --- raw pieces -----------------------------------------------------
    perm = jnp.asarray(nttmod.galois_perm_ntt(p.log_n, (1 << (p.log_n - 1)) + 1))

    f_gather = jax.jit(lambda x: nttmod.apply_galois_ntt(x, perm))
    print("galois gather [2,N]      %7.2f ms" %
          timeit_chained(f_gather, ct.c0[:1].repeat(2, 0)), flush=True)

    f_ntt = jax.jit(lambda x: ntt.ntt(ntt.intt(x, (0,)), (0,)))
    print("intt+ntt [1,N]           %7.2f ms" %
          timeit_chained(f_ntt, ct.c0[:1]), flush=True)

    f_mul = jax.jit(lambda x: mm.mont_mul(x, ct.c0, q01, qinv01))
    print("pointwise mul [2,N]      %7.2f ms" %
          timeit_chained(f_mul, ct.c0), flush=True)

    # level-0 keyswitch core
    dec0 = ctx._build_decompose(0)
    core0 = ctx._ks_core_builder(0)
    swk = ctx.galois_key((1 << (p.log_n - 1)) + 1, 0)
    d0k, d1k = swk.d0, ctx.swk_d1(swk)

    def ks(x):
        ks0, ks1 = core0(dec0(x), d0k, d1k)
        return mm.add_mod(x, ks0, q0)
    f_ks = jax.jit(ks)
    print("keyswitch lvl0 [1,N]     %7.2f ms" %
          timeit_chained(f_ks, ct.c0[:1]), flush=True)

    # full rotate at level 0 through the public API (incl. dispatch)
    ct0 = Ciphertext = None
    from optimal_conv_tpu.ckks.types import Ciphertext
    ctl0 = ctx.rescale(ct)

    def rot(c):
        o = ctx.apply_galois(Ciphertext(c, ctl0.c1, 0, ctl0.scale), 5)
        return o.c0
    rot(ctl0.c0)
    t0 = time.perf_counter()
    x = ctl0.c0
    for _ in range(10):
        x = rot(x)
    sync(x)
    print("rotate lvl0 e2e          %7.2f ms" %
          ((time.perf_counter() - t0) / 10 * 1e3), flush=True)

    # full conv
    ker = rng.uniform(-1, 1, (ker_wid, ker_wid, batch, batch)) / 9.0
    bn_a = rng.uniform(0.8, 1.2, batch)
    bn_b = rng.uniform(-0.2, 0.2, batch)
    max_batch = p.n // (in_wid * in_wid)
    out_scale = float(1 << 30)
    pl = convops.prep_ker(ctx, ker.ravel(), bn_a, in_wid, ker_wid, batch,
                          batch, 1, 1, 0, False)
    b_coeffs = np.zeros(p.n)
    for i, b in enumerate(bn_b):
        b_coeffs[i::max_batch] = b
    pl_b = ctx.encoder.encode_coeffs(b_coeffs, out_scale, 0, mont=False)

    def run(ct_in):
        out = convops.conv_then_pack(ctx, ct_in, pl, max_batch, 1, out_scale,
                                     bias_pt=pl_b)
        return out

    cts = [ct] + [ctx.encrypt(ctx.encoder.encode_coeffs(
        inp * (1.0 - 1e-6 * (i + 1)), p.scale, 1)) for i in range(5)]
    o = run(cts[0]); sync(o.c0, o.c1)
    t0 = time.perf_counter()
    for i in range(5):
        o = run(cts[1 + i])
        sync(o.c0, o.c1)
    print("conv_then_pack e2e       %7.2f ms" %
          ((time.perf_counter() - t0) / 5 * 1e3), flush=True)


if __name__ == "__main__":
    main()
