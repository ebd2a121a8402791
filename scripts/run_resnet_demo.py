#!/usr/bin/env python
"""Encrypted ResNet end-to-end demo/benchmark.

Runs the full sparse-packed encrypted ResNet (depth 8/14/20) on the
available backend (TPU by default; pass --cpu for the host) against the
plaintext mirror, printing per-block timings in the reference's format
(/root/reference/test.go:361-367) and logits agreement.

    python scripts/run_resnet_demo.py [--depth 8] [--logn 14] [--cpu] [--n 1]

At --logn 16 the geometry equals the reference's CIFAR run (32×32×3
input, real_batch (16,32,64)); smaller logn runs the same graph
miniaturized (e.g. 14 → 16×16 inputs), useful for CPU smoke runs.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=8, choices=(8, 14, 20))
    ap.add_argument("--ker", type=int, default=3, choices=(3, 5, 7))
    ap.add_argument("--wide", type=int, default=1, choices=(1, 2, 3),
                    help="widen factor (sparse-regime runner; wide 2/3 "
                         "use the reference's doubled/tripled channel "
                         "plan, /root/reference/test.go:638-912)")
    ap.add_argument("--cf100", action="store_true",
                    help="CIFAR-100 dual-FC head (fc_out=100, "
                         "/root/reference/test.go:291-317)")
    ap.add_argument("--logn", type=int, default=14)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--trace", type=str, default=None, metavar="DIR",
                    help="capture a JAX profiler trace of the first "
                         "inference into DIR (view with tensorboard / "
                         "xprof; SURVEY §5 tracing parity)")
    ap.add_argument("--ckpt", type=str, default=None, metavar="DIR",
                    help="per-layer encrypted-ct checkpoint dir — an "
                         "interrupted inference resumes from the last "
                         "completed layer (flagship runs span sessions)")
    ap.add_argument("--keys", type=str, default=None, metavar="FILE",
                    help="persist the switching-key cache: load FILE if "
                         "it exists (skipping the ~20 min logN=16 "
                         "on-device keygen), save after the first "
                         "inference")
    ap.add_argument("--results-root", type=str, default=None, metavar="DIR",
                    help="write per-sample enc/plain logits CSVs in the "
                         "reference's layout (DIR/results_crop_ker{k}_"
                         "d{depth}_wid1/{class,plain}_result_ker{k}_{i}"
                         ".csv) for python -m optimal_conv_tpu.compare "
                         "— resumable-sweep protocol, /root/reference/"
                         "compare_final.py:19-64")
    ap.add_argument("--start", type=int, default=0,
                    help="first sample index (resume a partial sweep; "
                         "sample i uses seed+i so indices are stable)")
    args = ap.parse_args()

    import os

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif args.logn >= 16:
        # fold the proven flagship recipe into the defaults (round-4
        # measurements, BENCH_DETAIL round4_flagship_postfix_steady_state):
        # 4 GB key budget + double-hoist OFF is the only config that
        # sustains warm layers on one v5e (8/5 GB OOM after 1-2 layers);
        # per-stage syncs make the logged stage times real.  Each is
        # overridable by exporting the var before launch.
        for var, val in (("OPTCONV_KEY_CACHE_GB", "4"),
                         ("OPTCONV_DOUBLE_HOIST", "0"),
                         ("OPTCONV_SYNC_STAGES", "1")):
            os.environ.setdefault(var, val)
        print("flagship env: " + " ".join(
            f"{v}={os.environ[v]}" for v in
            ("OPTCONV_KEY_CACHE_GB", "OPTCONV_DOUBLE_HOIST",
             "OPTCONV_SYNC_STAGES")), flush=True)

    import numpy as np
    from optimal_conv_tpu.ckks.params import boot_params, mini_boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.models.plain import random_weights, plain_forward
    from optimal_conv_tpu.models.resnet import ResNetConfig, ResNetRunner

    logn = args.logn
    base_rb = {1: (16, 32, 64), 2: (32, 64, 128), 3: (48, 96, 192)}[args.wide]
    if logn >= 14:
        w0 = int(np.sqrt((1 << logn) / 64))      # so max_batch[0] = 64
        rb = base_rb
    else:
        # keep spatial widths ≥ 4: shrink channels instead (same norms)
        w0 = 16
        rb = tuple(b * (1 << logn) // (1 << 14) for b in base_rb)
    fc_out = 100 if args.cf100 else 10
    if args.cf100 and fc_out // 2 > rb[2]:
        # mini geometry: keep the dual-conv split-FC path exercised but
        # fit the halves in the final real batch (logN=16 runs the
        # true 100-class head: 50 <= b3)
        fc_out = 2 * rb[2]
        print(f"mini cf100: fc_out scaled to {fc_out}")
    # wide>1: the 3→init_batch first layer shrinks with the grid
    # (reference init_batch=16, test.go:645); the 3 input channels need
    # init_batch ≥ 4, so mini wide runs need --logn ≥ 12.  Capped at the
    # reference's 16 for logn ≥ 14 — scaling past it would push real_ob
    # rows beyond max_batch in prep_ker at the flagship geometry.
    init_batch = max(1, 16 * min(1 << logn, 1 << 14) // (1 << 14))
    if args.wide > 1 and init_batch < 4:
        ap.error("--wide 2/3 needs --logn >= 12 (init_batch >= 4)")
    # cf100 widens the final ReLU range like the reference sparse driver
    # (final_pow 7.0 for ker3 / 6.0 for ker5, test.go:85-97)
    final_pow = (7.0 if args.ker == 3 else 6.0) if args.cf100 else 5.0
    cfg = ResNetConfig(ker_wid=args.ker, depth=args.depth,
                       in_wids=(w0, w0 // 2, w0 // 4),
                       real_batch=rb, init_pow=5.0, mid_pow=5.0,
                       final_pow=final_pow, wide=args.wide, cf100=args.cf100,
                       fc_out=fc_out, init_batch=init_batch)
    boot_kwargs = {}
    if logn >= 15:
        params = boot_params(logn)
    else:
        params = mini_boot_params(logn, n_relu=14)
        boot_kwargs = dict(k_range=12.0, sin_deg=31, double_angle=3)

    print(f"logN={logn} in_wids={cfg.in_wids} real_batch={cfg.real_batch} "
          f"depth={args.depth} ker={args.ker} wide={args.wide}"
          f"{' cf100' if args.cf100 else ''}", flush=True)
    t0 = time.perf_counter()
    ctx = CkksContext(params, seed=0)
    runner = ResNetRunner(ctx, cfg, boot_kwargs=boot_kwargs)
    print(f"context+maps+bootstrappers built in {time.perf_counter()-t0:.1f}s",
          flush=True)
    import os
    if args.keys and os.path.exists(args.keys):
        from optimal_conv_tpu.utils import serialization as ser
        t0 = time.perf_counter()
        n_keys = ser.load_keys(args.keys, ctx)
        print(f"{n_keys} switching keys loaded in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)

    w = random_weights(args.ker, args.depth, cfg.real_batch, fc_out=fc_out,
                       seed=1,
                       init_batch=cfg.init_batch if args.wide > 1 else None)
    # widen the FC margins so argmax comparison is meaningful against the
    # ~0.03 encrypted-evaluation noise of the mini chain
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    raw0 = cfg.raw_in_wids[0]
    import contextlib

    res_dir = None
    if args.results_root:
        res_dir = os.path.join(
            args.results_root,
            f"results_{'cf100_' if args.cf100 else ''}crop_ker{args.ker}"
            f"_d{args.depth}_wid{args.wide}")
        os.makedirs(res_dir, exist_ok=True)

    for it in range(args.start, args.start + args.n):
        # per-sample seed: indices stay stable across partial/resumed
        # sweeps (the reference's st..end range, test.go:76)
        image = np.random.default_rng(args.seed + it).uniform(
            -1, 1, (raw0, raw0, 3))
        timings = {}
        first = it == args.start
        trace_ctx = (jax.profiler.trace(args.trace)
                     if args.trace and first else contextlib.nullcontext())
        t0 = time.perf_counter()
        with trace_ctx:
            logits = runner.infer(image, w, timings,
                                  ckpt_dir=args.ckpt if first else None)
        total = time.perf_counter() - t0
        if args.keys and first and not os.path.exists(args.keys):
            from optimal_conv_tpu.utils import serialization as ser
            t1 = time.perf_counter()
            ser.save_keys(args.keys, ctx)
            print(f"switching-key cache saved to {args.keys} in "
                  f"{time.perf_counter()-t1:.1f}s", flush=True)
        plain = plain_forward(w, image, args.depth, cfg.raw_in_wids)
        print(f"[sample {it}]")
        print(f"Blc1: {timings['blc1']:.1f}s  Blc1->2: {timings['blc1to2']:.1f}s  "
              f"Blc2: {timings['blc2']:.1f}s  Blc2->3: {timings['blc2to3']:.1f}s  "
              f"Blc3: {timings['blc3']:.1f}s  FC: {timings['fc']:.1f}s")
        print(f"Total done in {total:.1f}s")
        print("enc  logits:", np.array2string(logits, precision=4))
        print("plain logits:", np.array2string(plain, precision=4))
        print("argmax agree:", int(np.argmax(logits) == np.argmax(plain)),
              flush=True)
        if res_dir:
            np.savetxt(os.path.join(
                res_dir, f"class_result_ker{args.ker}_{it}.csv"), logits)
            np.savetxt(os.path.join(
                res_dir, f"plain_result_ker{args.ker}_{it}.csv"), plain)
            np.savetxt(os.path.join(
                res_dir, f"time_ker{args.ker}_{it}.csv"), [total])


if __name__ == "__main__":
    main()
