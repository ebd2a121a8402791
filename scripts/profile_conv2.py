#!/usr/bin/env python
"""Bisect the fused conv_then_pack kernel's 95 ms: compile variants with
stages knocked out and time each on the TPU.

Variants:
  full        the real kernel
  nogather    galois permutation replaced by identity
  noks        keyswitch (decompose+inner product+moddown) dropped
  nopack      butterfly skipped entirely (products+rescale only)
  norescale   SetScale-fold rescale replaced by slicing off limb 1
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
    from optimal_conv_tpu.utils.timing import sync

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
    cts = [ctx.encrypt(ctx.encoder.encode_coeffs(
        inp * (1.0 - 1e-6 * i), p.scale, 1)) for i in range(8)]

    ker = rng.uniform(-1, 1, (ker_wid, ker_wid, batch, batch)) / 9.0
    bn_a = rng.uniform(0.8, 1.2, batch)
    max_batch = p.n // (in_wid * in_wid)
    out_scale = float(1 << 30)
    pl = convops.prep_ker(ctx, ker.ravel(), bn_a, in_wid, ker_wid, batch,
                          batch, 1, 1, 0, False)
    pls = jnp.stack([pl[i].poly for i in range(0, max_batch, 1)])

    # rebuild the kernel body with switches (mirrors _conv_pack_kernel)
    max_ob, norm = max_batch, 1
    per_scale = out_scale / max_ob
    scale_in, scale_ker = cts[0].scale, pl[0].scale
    q1 = p.q_moduli[1]
    c_int = int(round(per_scale * q1 / (scale_in * scale_ker)))
    mods1 = p.q_moduli[:2]
    c_mont = mm.to_mont(
        jnp.asarray(np.array([c_int % q for q in mods1],
                             dtype=np.uint64)[:, None]),
        *p.ntt.tabs((0, 1))[:2], p.ntt.tabs((0, 1))[2])
    q01, qinv01, _, _, _, _, _ = p.ntt.tabs((0, 1))
    q0, qinv0, _, _, _, _, _ = p.ntt.tabs((0,))
    r1_0 = p.ntt.tabs((0,))[3]
    half = jnp.uint64(q1 // 2)
    q1_mod0 = jnp.uint64(q1 % p.q_moduli[0])
    q1inv = p.qlast_inv_mont(1)
    ntt = p.ntt

    steps = []
    step = max_ob // 2
    log_step = max(step.bit_length() - 1, 0)
    j = p.log_n - log_step
    while step >= norm and step >= 1:
        steps.append((step, log_step, j))
        step //= 2
        log_step -= 1
        j += 1
    monos = [ctx.monomial_pt(1 << ls, 0) for (_, ls, _) in steps]
    perms = [jnp.asarray(nttmod.galois_perm_ntt(p.log_n, (1 << jj) + 1))
             for (_, _, jj) in steps]
    swks = [ctx.galois_key((1 << jj) + 1, 0) for (_, _, jj) in steps]
    dec0 = ctx._build_decompose(0)
    core0 = ctx._ks_core_builder(0)

    def rescale10(c, on=True):
        if not on:
            return c[:1]
        t = ntt.intt(c[1:], (1,))
        red = mm.mont_mul(t, r1_0, q0, qinv0)
        red = jnp.where(t > half, mm.sub_mod(red, q1_mod0, q0), red)
        red_ntt = ntt.ntt(red, (0,))
        return mm.mont_mul(mm.sub_mod(c[:1], red_ntt, q0), q1inv, q0, qinv0)

    def make(gather=True, ks=True, pack=True, rescale=True):
        def fused(c0, c1, pls):
            cts_ = [None] * max_ob
            for ci, i in enumerate(range(0, max_ob, norm)):
                m0 = mm.mont_mul(mm.mont_mul(c0, pls[ci], q01, qinv01),
                                 c_mont, q01, qinv01)
                m1 = mm.mont_mul(mm.mont_mul(c1, pls[ci], q01, qinv01),
                                 c_mont, q01, qinv01)
                cts_[i] = (rescale10(m0, rescale), rescale10(m1, rescale))
            if pack:
                for si, (stp, ls, jj) in enumerate(steps):
                    mono = monos[si]
                    perm = perms[si]
                    d0k, d1k = swks[si].d0, ctx.swk_d1(swks[si])
                    for i in range(0, stp, norm):
                        a0, a1 = cts_[i]
                        b0 = mm.mont_mul(cts_[i + stp][0], mono, q0, qinv0)
                        b1 = mm.mont_mul(cts_[i + stp][1], mono, q0, qinv0)
                        t10 = mm.add_mod(a0, b0, q0)
                        t11 = mm.add_mod(a1, b1, q0)
                        t20 = mm.sub_mod(a0, b0, q0)
                        t21 = mm.sub_mod(a1, b1, q0)
                        if gather:
                            t20 = nttmod.apply_galois_ntt(t20, perm)
                            t21 = nttmod.apply_galois_ntt(t21, perm)
                        if ks:
                            ks0, ks1 = core0(dec0(t21), d0k, d1k)
                            cts_[i] = (
                                mm.add_mod(t10, mm.add_mod(t20, ks0, q0), q0),
                                mm.add_mod(t11, ks1, q0))
                        else:
                            cts_[i] = (mm.add_mod(t10, t20, q0),
                                       mm.add_mod(t11, t21, q0))
            return cts_[0]
        return jax.jit(fused)

    variants = [
        ("full", dict()),
        ("nogather", dict(gather=False)),
        ("noks", dict(ks=False)),
        ("nogather+noks", dict(gather=False, ks=False)),
        ("nopack", dict(pack=False)),
        ("norescale", dict(rescale=False, pack=False)),
    ]
    for name, kw in variants:
        f = make(**kw)
        o = f(cts[0].c0, cts[0].c1, pls)
        sync(*o)
        t0 = time.perf_counter()
        iters = 5
        for i in range(iters):
            o = f(cts[1 + i].c0, cts[1 + i].c1, pls)
            sync(*o)
        print("%-16s %7.2f ms" %
              (name, (time.perf_counter() - t0) / iters * 1e3), flush=True)


if __name__ == "__main__":
    main()
