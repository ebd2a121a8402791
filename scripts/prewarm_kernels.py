#!/usr/bin/env python
"""Pre-warm the XLA compile cache for the production (logN=16) chain.

The fused-layer pipeline walks one (op, level) kernel ladder; cold
remote compiles are minutes each and serialize inside a single run.
This script triggers the same compilations from a second process so the
shared on-disk cache (~/.cache/optimal_conv_tpu_xla) fills in parallel
— run it alongside a cold ResNet run, ideally in the OPPOSITE level
order (--start-low compiles the ReLU/repack/StoC regions first, which
the main run reaches last).

    python scripts/prewarm_kernels.py [--logn 16] [--start-low]
    python scripts/prewarm_kernels.py --levels 16,15,14
    python scripts/prewarm_kernels.py --aot --levels 33,32,31

Values are garbage on purpose: compilation only depends on shapes.

--aot compiles the kernel family via ShapeDtypeStruct lowering
(CkksContext.aot_warm) WITHOUT allocating device memory or executing —
safe to run next to a live model process on the same chip (compile
requests overlap on the remote helper; there is no HBM contention).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--start-low", action="store_true")
    ap.add_argument("--levels", type=str, default=None,
                    help="comma-separated level list (overrides order)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--aot", action="store_true",
                    help="compile-only warm (no device memory/execution)")
    ap.add_argument("--ops", type=str, default=None,
                    help="comma-separated aot op subset (default: all)")
    ap.add_argument("--lt", type=str, default=None,
                    help="comma-separated log_sparse list: aot-compile "
                         "every LinearTransform inner kernel those "
                         "bootstrappers will jit (plan_lt_shapes)")
    ap.add_argument("--dh", type=int, default=None, choices=(0, 1),
                    help="compile the double-hoisted (1) or plain (0) "
                         "lt_inner/hoist kernel flavor.  DEFAULT 0 at "
                         "--logn 16: the flagship recipe runs "
                         "OPTCONV_DOUBLE_HOIST=0 (run_resnet_demo sets "
                         "it), and prewarming the WRONG flavor cost a "
                         "5365 s layer in round 4 (BENCH_DETAIL "
                         "one_time_costs_measured)")
    args = ap.parse_args()

    import os
    if args.dh is None:
        args.dh = 0 if args.logn >= 16 else int(
            os.environ.get("OPTCONV_DOUBLE_HOIST", "1") != "0")
    os.environ["OPTCONV_DOUBLE_HOIST"] = str(args.dh)
    print(f"prewarming the OPTCONV_DOUBLE_HOIST={args.dh} kernel flavor",
          flush=True)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from optimal_conv_tpu.ckks.params import boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.types import Ciphertext

    params = boot_params(args.logn)
    ctx = CkksContext(params, seed=0)
    lay = params.boot_layout

    levels = (list(range(1, params.max_level + 1)) if args.start_low
              else list(range(params.max_level, 0, -1)))
    if args.levels:
        levels = [int(x) for x in args.levels.split(",")]

    rng = np.random.default_rng(0)

    if args.lt:
        from optimal_conv_tpu.ckks.bootstrap import plan_lt_shapes

        by_level: dict[int, list] = {}
        for ls in (int(x) for x in args.lt.split(",")):
            for lvl, nb, sl, ident in plan_lt_shapes(params, ls):
                spec = (nb, sl, ident)
                if spec not in by_level.setdefault(lvl, []):
                    by_level[lvl].append(spec)
        for lvl in sorted(by_level, reverse=True):
            t0 = time.perf_counter()
            times = ctx.aot_warm(lvl, ops=(), lt_babies=tuple(by_level[lvl]))
            detail = " ".join(f"{k}:{v:.0f}s" for k, v in times.items())
            print(f"level {lvl} lt-warmed in "
                  f"{time.perf_counter() - t0:.1f}s  ({detail})", flush=True)
        return

    if args.aot:
        kw = {}
        if args.ops:
            kw["ops"] = tuple(args.ops.split(","))
        for lvl in levels:
            t0 = time.perf_counter()
            times = ctx.aot_warm(lvl, **kw)
            detail = " ".join(f"{k}:{v:.0f}s" for k, v in times.items())
            print(f"level {lvl} aot-warmed in "
                  f"{time.perf_counter() - t0:.1f}s  ({detail})", flush=True)
        return

    def dummy_ct(lvl):
        rows = np.stack([rng.integers(0, params.moduli[i], size=params.n,
                                      dtype=np.uint64)
                         for i in range(lvl + 1)])
        return Ciphertext(jnp.asarray(rows), jnp.asarray(rows), level=lvl,
                          scale=params.scale)

    for lvl in levels:
        t0 = time.perf_counter()
        ct = dummy_ct(lvl)
        # the per-level kernel family the pipeline uses
        ctx.rotate(ct, 1)                       # galois + ks + decompose
        ctx.rotate_hoisted(ct, [1, 2])          # dec + hoistrot
        if lvl >= 1:
            ctx.rescale(ct)
        relu_lo, relu_hi = lay["relu"]
        if relu_lo <= lvl < relu_hi + 1:
            ctx.mul_ct(ct, ct)                  # relin at ReLU levels
        em_lo, em_hi = lay["evalmod"]
        if em_lo <= lvl < em_hi:
            ctx.mul_ct(ct, ct)
        print(f"level {lvl} warmed in {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
