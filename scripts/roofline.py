#!/usr/bin/env python
"""Roofline / speed-of-light statement for the headline encrypted conv.

For every device kernel in the benched conv_then_pack (logN=16, batch 4,
level≤1 — the reference's `conv 3 0 1` geometry) this measures honest
chained latency and compares it against the HBM-bandwidth floor: the
time to stream each kernel's mandatory bytes (inputs + outputs + keys +
gather indices, each touched once) at the chip's peak HBM bandwidth.
CKKS kernels at 1-2 limbs are far below the MXU/VPU compute roof, so
bandwidth is the binding limit; the printed ratio is therefore an upper
bound on remaining headroom (XLA may re-read intermediates).

    python scripts/roofline.py            # real TPU (axon)

v5e (1 chip): 819 GB/s HBM, 394 bf16 TFLOP/s / 197 int8 MXU TOP/s.
"""

import sys
import time

sys.path.insert(0, ".")

HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from optimal_conv_tpu.ckks.params import CkksParams
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.types import Ciphertext
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
    n = p.n
    rng = np.random.default_rng(0)

    img = rng.uniform(-1, 1, (raw_wid, raw_wid, batch))
    inp = convops.prep_input(img.ravel(), raw_wid, in_wid, n, 1)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, p.scale, 1))

    q01, qinv01, *_ = p.ntt.tabs((0, 1))
    q0, *_ = p.ntt.tabs((0,))
    ntt = p.ntt

    rows = []

    def bench(name, fn, x0, nbytes):
        t_ms = timeit_chained(jax.jit(fn), x0)
        sol_us = nbytes / (HBM_GBPS * 1e3)        # bytes / (GB/s) → µs
        rows.append((name, t_ms, sol_us, t_ms * 1e3 / sol_us))

    # --- galois gather: permute [2, N] u64 rows through a [N] index ----
    g = (1 << (log_n - 1)) + 1
    perm = jnp.asarray(nttmod.galois_perm_ntt(log_n, g))
    bench("galois gather [2,N]",
          lambda x: nttmod.apply_galois_ntt(x, perm),
          ct.c0, (2 * n + 2 * n) * 8 + n * 4)

    # --- negacyclic iNTT+NTT roundtrip [1, N] ---------------------------
    bench("intt+ntt [1,N]",
          lambda x: ntt.ntt(ntt.intt(x, (0,)), (0,)),
          ct.c0[:1], (2 * (n + n)) * 8)

    # --- pointwise modmul [2, N] ----------------------------------------
    c0ref = ct.c0
    bench("mont_mul [2,N]",
          lambda x: mm.mont_mul(x, c0ref, q01, qinv01),
          ct.c0, (2 * n * 3) * 8)

    # --- level-0 hybrid keyswitch (decompose, key inner product,
    #     mod-down: the rotation's cost minus the gather) ----------------
    dec0 = ctx._build_decompose(0)
    core0 = ctx._ks_core_builder(0)
    swk = ctx.galois_key(g, 0)
    d0k, d1k = swk.d0, ctx.swk_d1(swk)
    key_bytes = (int(np.prod(np.shape(d0k))) +
                 int(np.prod(np.shape(d1k)))) * 8
    # digits through NTT (≈3 passes of [nqp≈2, N]) + key read + outputs
    ks_bytes = key_bytes + (3 * 2 * n + 2 * n + 2 * n) * 8

    def ks(x):
        ks0, ks1 = core0(dec0(x), d0k, d1k)
        return mm.add_mod(x, ks0, q0)

    bench("keyswitch lvl0 [1,N]", ks, ct.c0[:1], ks_bytes)

    # --- the full fused conv_then_pack ----------------------------------
    ker = rng.uniform(-1, 1, (ker_wid, ker_wid, batch, batch)) / 9.0
    bn_a = rng.uniform(0.8, 1.2, batch)
    bn_b = rng.uniform(-0.2, 0.2, batch)
    max_batch = n // (in_wid * in_wid)
    out_scale = float(1 << 30)
    pl = convops.prep_ker(ctx, ker.ravel(), bn_a, in_wid, ker_wid, batch,
                          batch, 1, 1, 0, False)
    b_coeffs = np.zeros(n)
    for i, b in enumerate(bn_b):
        b_coeffs[i::max_batch] = b
    pl_b = ctx.encoder.encode_coeffs(b_coeffs, out_scale, 0, mont=False)

    cts = [ct] + [ctx.encrypt(ctx.encoder.encode_coeffs(
        inp * (1.0 - 1e-6 * (i + 1)), p.scale, 1)) for i in range(16)]

    def run(ct_in):
        return convops.conv_then_pack(ctx, ct_in, pl, max_batch, 1,
                                      out_scale, bias_pt=pl_b)

    o = run(cts[0])
    sync(o.c0, o.c1)
    t0 = time.perf_counter()
    outs = [run(c) for c in cts[1:]]
    sync(outs[-1].c0, outs[-1].c1)
    conv_ms = (time.perf_counter() - t0) / 16 * 1e3

    # mandatory traffic for the whole fused conv:
    #   input ct [2,2,N], 4 channel pt [2,N] products accumulated,
    #   2 butterfly stages: 4 rotations (keyswitch each) + monomials,
    #   output ct [2,1,N]
    conv_bytes = ((2 * 2 * n + 4 * 2 * n + 2 * n) * 8    # ct + pts + out
                  + 4 * ks_bytes                          # 4 rotations
                  + 4 * (2 * n * 2) * 8)                  # monomial muls
    conv_sol_us = conv_bytes / (HBM_GBPS * 1e3)

    print(f"\n{'kernel':28s} {'measured':>10s} {'HBM SOL':>9s} {'x off':>7s}")
    for name, t_ms, sol_us, ratio in rows:
        print(f"{name:28s} {t_ms:8.2f}ms {sol_us:7.0f}us {ratio:6.1f}x")
    print(f"{'conv_then_pack (fused)':28s} {conv_ms:8.2f}ms "
          f"{conv_sol_us:7.0f}us {conv_ms * 1e3 / conv_sol_us:6.1f}x")
    print(f"\nHBM floor assumes {HBM_GBPS:.0f} GB/s; bytes counted once "
          f"(conv: {conv_bytes / 1e6:.1f} MB mandatory traffic).")
    print("Fixed per-dispatch overhead on this tunnel backend was "
          "measured at ~3.5 ms (round 1) — the fused-conv gap above is "
          "dominated by dispatch + gather inefficiency, not arithmetic.")


if __name__ == "__main__":
    main()
