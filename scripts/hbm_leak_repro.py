#!/usr/bin/env python
"""Minimal repro for the cross-layer HBM accumulation (round-4 finding).

One process, one fused Conv_sparse layer (the flagship's steady-state
op) applied to the SAME input ciphertext N times.  Every iteration is
identical work on identical buffers, so any drift to RESOURCE_EXHAUSTED
is state that accumulates per *execution*, not per *model layer* —
separating "the model's residency grows" from "the backend retains
per-call buffers" (the round-4 hypothesis, scripts/flagship_legs.sh).

    python scripts/hbm_leak_repro.py [--iters 12] [--ls 2]
        [--clear-caches]   jax.clear_caches() between iterations
        [--delete]         explicitly .delete() each output's buffers
        [--probe-free]     after each iter, count how many 256 MB
                           on-device allocations fit (coarse free-HBM
                           gauge; axon's memory_stats() returns {})

Compare iterations-until-OOM across flag combinations; the flagship
recipe (OPTCONV_KEY_CACHE_GB=4, OPTCONV_DOUBLE_HOIST=0) is applied by
default.  Findings land in BENCH_DETAIL.json.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--ls", type=int, default=2, choices=(2,),
                    help="log_sparse of the looped layer (block-1 "
                         "geometry; other blocks need a mid-net input ct)")
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--clear-caches", action="store_true")
    ap.add_argument("--delete", action="store_true")
    ap.add_argument("--probe-free", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("OPTCONV_KEY_CACHE_GB", "4")
    os.environ.setdefault("OPTCONV_DOUBLE_HOIST", "0")
    os.environ.setdefault("OPTCONV_SYNC_STAGES", "1")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from optimal_conv_tpu.ckks.params import boot_params, mini_boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.models.plain import random_weights
    from optimal_conv_tpu.models.resnet import ResNetConfig, ResNetRunner
    from optimal_conv_tpu.ops.pipeline import eval_conv_bn_relu
    from optimal_conv_tpu.utils.timing import sync

    logn = args.logn
    w0 = int(np.sqrt((1 << logn) / 64)) if logn >= 14 else 16
    rb = ((16, 32, 64) if logn >= 14 else
          tuple(b * (1 << logn) // (1 << 14) for b in (16, 32, 64)))
    cfg = ResNetConfig(ker_wid=3, depth=20, in_wids=(w0, w0 // 2, w0 // 4),
                       real_batch=rb, init_pow=5.0, mid_pow=5.0,
                       final_pow=5.0)
    boot_kwargs = {}
    if logn >= 15:
        params = boot_params(logn)
    else:
        params = mini_boot_params(logn, n_relu=14)
        boot_kwargs = dict(k_range=12.0, sin_deg=31, double_angle=3)
    t0 = time.perf_counter()
    ctx = CkksContext(params, seed=0)
    runner = ResNetRunner(ctx, cfg, boot_kwargs=boot_kwargs)
    print(f"context+maps built in {time.perf_counter()-t0:.1f}s", flush=True)

    w = random_weights(3, 20, cfg.real_batch, fc_out=10, seed=1)
    rng = np.random.default_rng(2)
    image = rng.uniform(-1, 1, (cfg.raw_in_wids[0], cfg.raw_in_wids[0], 3))
    ct0 = runner.encrypt_image(image)

    def probe_free():
        held, n = [], 0
        try:
            for _ in range(64):
                import jax.numpy as jnp
                b = jnp.zeros((256 * 1024 * 1024 // 8,), jnp.uint64) + 1
                sync(b)
                held.append(b)
                n += 1
        except Exception:
            pass
        del held
        import gc
        gc.collect()
        return n

    for it in range(args.iters):
        t = time.perf_counter()
        try:
            out = eval_conv_bn_relu(
                ctx, runner.btps, ct0, w.convs[0].ravel(), w.bn_a[0],
                w.bn_b[0], cfg.alpha, cfg.init_pow, cfg.in_wids[0],
                cfg.raw_in_wids[0], 3, w.convs[0].shape[2],
                w.convs[0].shape[3], runner.norm[0], 0, 1, 2,
                args.ls, "Conv_sparse", runner.keep_maps[0])
            sync(out.c0, out.c1)
        except Exception as e:
            print(f"ITER {it}: FAILED after {time.perf_counter()-t:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            print(f"RESULT iters_before_oom={it} clear_caches="
                  f"{args.clear_caches} delete={args.delete}", flush=True)
            return
        # client-side census: if this stays flat while the device OOMs,
        # the accumulation is server-side (or executable-embedded
        # constants), not python-held buffers
        live = sum(a.nbytes for a in jax.live_arrays())
        msg = (f"ITER {it}: ok in {time.perf_counter()-t:.1f}s  "
               f"client-live={live/2**30:.2f}GiB")
        if args.delete:
            for buf in (out.c0, out.c1):
                try:
                    buf.delete()
                except Exception:
                    pass
        del out
        import gc
        gc.collect()
        if args.clear_caches:
            jax.clear_caches()
        if args.probe_free:
            msg += f"  free~{probe_free() * 256} MB"
        print(msg, flush=True)
    print(f"RESULT iters_before_oom=>{args.iters} (no OOM) clear_caches="
          f"{args.clear_caches} delete={args.delete}", flush=True)


if __name__ == "__main__":
    main()
