"""Command-line driver, mirroring the reference's main()
(/root/reference/main.go:512-645):

    python -m optimal_conv_tpu conv     <ker 3|5|7> <i_batch 0..3> <n_tests>
    python -m optimal_conv_tpu convReLU <ker 3|5|7> <i_batch 0..3> <n_tests>
    python -m optimal_conv_tpu resnet   <ker> <depth 8|14|20> <wide 1> <n> <cf100>

Batch/width table as the reference (main.go:578): batches {4,16,64,256}
× widths {128,64,32,16}.  If the reference's CSV data sets
(test_conv_data/, Resnet_weights/…) are present in the working
directory they are used; otherwise deterministic synthetic
weights/inputs are generated and the plaintext mirror provides the
golden outputs (the reference's golden files came from an external
python pipeline that is not in its repo either).

Encrypted ResNet outputs one logits CSV per sample
(Resnet_enc_results/…, resumable per sample like the reference) which
``python -m optimal_conv_tpu.compare`` scores.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

BATCHS = [4, 16, 64, 256, 1024]
WIDTHS = [128, 64, 32, 16, 8]


def _precision_stats(want: np.ndarray, have: np.ndarray) -> str:
    """log2-error distribution, the reference's GetPrecisionStatsPlain
    (avg/min/max/median/quartiles + cumulative bucket table)."""
    from .ops.debug import precision_stats

    return precision_stats(want, have, distribution=True)


def run_conv_bl(ker_wid: int, i_batch: int, n_tests: int, boot: bool) -> None:
    """Prior-art ("Base Line") conv — run back-to-back with the paper's
    method on the same data, like the reference CLI
    (/root/reference/main.go:639-643 → test_BL.go:16-185)."""
    from .ckks.params import CkksParams, boot_params
    from .ckks.context import CkksContext
    from .ckks.bootstrap import SplitBootstrapper
    from .ops import baseline as bl
    from .ops import conv as convops
    from .ops.relu import relu_np

    in_batch = BATCHS[i_batch]
    in_wid = WIDTHS[i_batch]
    pad = ker_wid // 2
    raw_wid = in_wid - pad
    pow_ = 4.0
    hb = in_batch // 2

    if boot:
        params = boot_params(16)
    else:
        params = CkksParams(log_n=16, logq=(60, 45), logp=(61,),
                            log_scale=30, h=192)
    print(f"CKKS parameters: logN={params.log_n} logSlots={params.log_slots} "
          f"h={params.h} logQP~{sum(params.logq) + sum(params.logp)} "
          f"levels={len(params.logq)} scale=2^{params.log_scale}")
    ctx = CkksContext(params, seed=0)
    btp = None
    if boot:
        stoc_top = params.boot_layout["relu"][1] - 1
        btp = SplitBootstrapper(ctx, log_sparse=0, stoc_level=stoc_top)
    rng = np.random.default_rng(0)

    for it in range(n_tests):
        print(f"{it + 1}-th iter... start")
        base = f"test_conv_data/test_conv{ker_wid}_batch_{in_batch}"
        if os.path.exists(f"{base}_in_{it}.csv"):
            raw = np.loadtxt(f"{base}_in_{it}.csv").ravel()
            ker = np.loadtxt(f"{base}_ker_{it}.csv").ravel()
            bn_a = np.loadtxt(f"{base}_bna_{it}.csv").ravel()
            bn_b = np.loadtxt(f"{base}_bnb_{it}.csv").ravel()
            out_name = "reluout" if boot else "out"
            want = np.loadtxt(f"{base}_{out_name}_{it}.csv").ravel()
        else:
            raw = rng.uniform(-1, 1, raw_wid * raw_wid * in_batch)
            ker = rng.uniform(-1, 1, ker_wid * ker_wid * in_batch * in_batch) \
                / ker_wid**2
            bn_a = rng.uniform(0.8, 1.2, in_batch)
            bn_b = rng.uniform(-0.2, 0.2, in_batch)
            img = raw.reshape(raw_wid, raw_wid, in_batch)
            kk = ker.reshape(ker_wid, ker_wid, in_batch, in_batch)
            plain = convops.conv2d_same_np(img, kk) * bn_a + bn_b
            want = (relu_np(plain) if boot else plain).ravel()

        # split channels over two ciphertexts (test_BL.go:59-76)
        img3 = raw.reshape(raw_wid, raw_wid, in_batch)
        pads = []
        for half in range(2):
            p_in = np.zeros(in_wid * in_wid * hb)
            for b in range(hb):
                blk = np.zeros((in_wid, in_wid))
                blk[:raw_wid, :raw_wid] = img3[..., half * hb + b]
                p_in[b::hb] = blk.ravel()
            pads.append(bl.reshape_input_bl(p_in, in_wid))
        t0 = time.perf_counter()
        lvl = min(1, params.max_level) if not boot else 1
        cts = [ctx.encrypt(ctx.encoder.encode_slots(v, params.scale, lvl))
               for v in pads]
        print(f"Encryption done in {time.perf_counter() - t0:.3f}s")

        t0 = time.perf_counter()
        ct_res = bl.conv_bl_split(ctx, cts[0], cts[1], ker, bn_a, bn_b,
                                  in_wid, ker_wid, in_batch, pad)
        print(f"Evaluation total done in {time.perf_counter() - t0:.3f}s")

        if boot:
            t0 = time.perf_counter()
            r0 = ctx.rescale(ct_res[0])
            r1 = ctx.rescale(ct_res[1])
            ct_res = list(bl.eval_conv_bl_boot_relu(ctx, btp, r0, r1,
                                                    0.0, pow_))
            print(f"Boot (imaginary pack) + ReLU done in "
                  f"{time.perf_counter() - t0:.3f}s")

        t0 = time.perf_counter()
        v1 = ctx.decrypt_decode_slots(ct_res[0] if boot
                                      else ctx.rescale(ct_res[0]))
        v2 = ctx.decrypt_decode_slots(ct_res[1] if boot
                                      else ctx.rescale(ct_res[1]))
        print(f"Decryption done in {time.perf_counter() - t0:.3f}s")
        got = np.concatenate([bl.post_trim_bl(v1, raw_wid, in_wid),
                              bl.post_trim_bl(v2, raw_wid, in_wid)])
        got = bl.post_process_bl(got, raw_wid)
        print(_precision_stats(want, got))


def run_conv(ker_wid: int, i_batch: int, n_tests: int, boot: bool,
             debug: bool = False) -> None:
    from .ckks.params import CkksParams, boot_params
    from .ckks.context import CkksContext
    from .ckks.bootstrap import SplitBootstrapper
    from .ops import conv as convops
    from .ops import repack as rp
    from .ops.pipeline import eval_conv_bn_relu, LayerMaps
    from .ops.relu import relu_np

    in_batch = BATCHS[i_batch]
    in_wid = WIDTHS[i_batch]
    raw_wid = in_wid - ker_wid // 2
    pow_ = 4.0
    log_n = 16

    if boot:
        params = boot_params(log_n)
    else:
        params = CkksParams(log_n=log_n, logq=(60, 45), logp=(61,),
                            log_scale=30, h=192)
    print(f"CKKS parameters: logN={params.log_n} logSlots={params.log_slots} "
          f"h={params.h} logQP~{sum(params.logq) + sum(params.logp)} "
          f"levels={len(params.logq)} scale=2^{params.log_scale}")
    ctx = CkksContext(params, seed=0)
    btps = {0: SplitBootstrapper(ctx, log_sparse=0)} if boot else None
    rng = np.random.default_rng(0)

    for it in range(n_tests):
        print(f"{it + 1}-th iter... start")
        base = f"test_conv_data/test_conv{ker_wid}_batch_{in_batch}"
        if os.path.exists(f"{base}_in_{it}.csv"):
            raw = np.loadtxt(f"{base}_in_{it}.csv").ravel()
            ker = np.loadtxt(f"{base}_ker_{it}.csv").ravel()
            bn_a = np.loadtxt(f"{base}_bna_{it}.csv").ravel()
            bn_b = np.loadtxt(f"{base}_bnb_{it}.csv").ravel()
            out_name = "reluout" if boot else "out"
            want = np.loadtxt(f"{base}_{out_name}_{it}.csv").ravel()
        else:
            raw = rng.uniform(-1, 1, raw_wid * raw_wid * in_batch)
            ker = rng.uniform(-1, 1, ker_wid * ker_wid * in_batch * in_batch) \
                / ker_wid**2
            bn_a = rng.uniform(0.8, 1.2, in_batch)
            bn_b = rng.uniform(-0.2, 0.2, in_batch)
            img = raw.reshape(raw_wid, raw_wid, in_batch)
            kk = ker.reshape(ker_wid, ker_wid, in_batch, in_batch)
            plain = convops.conv2d_same_np(img, kk) * bn_a + bn_b
            want = (relu_np(plain) if boot else plain).ravel()

        inp = convops.prep_input(raw, raw_wid, in_wid, params.n, 1)
        t0 = time.perf_counter()
        ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, params.scale, 1))
        print(f"Encryption done in {time.perf_counter() - t0:.3f}s")

        t0 = time.perf_counter()
        if boot:
            maps = LayerMaps(ext_idx=[
                rp.gen_keep_vec(params.n // 2, in_wid, raw_wid, 0),
                rp.gen_keep_vec(params.n // 2, in_wid, raw_wid, 1)])
            hook = None
            if debug:
                # per-stage decrypt oracles (the reference's debug=true
                # mode); expected conv output on the full padded grid
                from .ops.debug import DebugOracle
                full = np.zeros((in_wid, in_wid, in_batch))
                full[:raw_wid, :raw_wid] = raw.reshape(raw_wid, raw_wid,
                                                       in_batch)
                kk = ker.reshape(ker_wid, ker_wid, in_batch, in_batch)
                pc = convops.conv2d_same_np(full, kk) * bn_a + bn_b
                cfs = np.zeros(params.n)
                for b in range(in_batch):
                    cfs[b::in_batch] = pc[..., b].ravel()
                hook = DebugOracle(ctx, in_wid, raw_wid, "Conv", pow_, 0, cfs)
            out_ct = eval_conv_bn_relu(ctx, btps, ct, ker, bn_a, bn_b, 0.0,
                                       pow_, in_wid, raw_wid, ker_wid,
                                       in_batch, in_batch, 1, 0, 1, 2, 0,
                                       "Conv", maps, debug_hook=hook)
        else:
            out_ct = convops.eval_conv_bn(ctx, ct, ker, bn_a, bn_b, in_wid,
                                          ker_wid, in_batch, in_batch, 1,
                                          float(1 << 30))
        print(f"Conv{'+ReLU+boot' if boot else ' (with BN)'} done in "
              f"{time.perf_counter() - t0:.3f}s")

        cfs = ctx.decrypt_decode_coeffs(out_ct)
        got = convops.post_process(cfs, raw_wid, in_wid)
        print(_precision_stats(want, got))


def run_resnet(ker_wid: int, depth: int, wide: int, n_tests: int,
               cf100: bool, fast: bool = False, debug: bool = False) -> None:
    from .ckks.params import boot_params
    from .ckks.context import CkksContext
    from .models.plain import random_weights, plain_forward
    from .models.resnet import (ResNetConfig, ResNetRunner, FastResNetRunner,
                                WideFastResNetRunner)

    fc_out = 100 if cf100 else 10
    batches = {1: (16, 32, 64), 2: (32, 64, 128), 3: (48, 96, 192)}[wide]
    cfg = ResNetConfig(ker_wid=ker_wid, depth=depth, cf100=cf100,
                       real_batch=batches, wide=wide, fc_out=fc_out)
    params = boot_params(16)
    print("building context + keys ...")
    ctx = CkksContext(params, seed=0)
    if fast:
        # wide 1 → testResNet_crop_fast_in (test.go:372); wide 2/3 →
        # testResNet_crop_fast_wide_in (test.go:914, main.go:264-345)
        runner = (FastResNetRunner(ctx, cfg) if wide == 1
                  else WideFastResNetRunner(ctx, cfg))
    else:
        runner = ResNetRunner(ctx, cfg)
    # real weights when the reference's weight directory exists
    # (Resnet_weights/weights[_cf100]_crop_ker{k}_d{d}_wid{w}/w{li}-*.csv,
    # /root/reference/test.go:92-100), else deterministic random
    pfx = "weights_cf100_crop" if cf100 else "weights_crop"
    weight_dir = f"Resnet_weights/{pfx}_ker{ker_wid}_d{depth}_wid{wide}"
    if os.path.isdir(weight_dir):
        from .models.plain import load_weights_dir
        print(f"loading weights from {weight_dir}")
        w = load_weights_dir(weight_dir, ker_wid, depth, cfg.real_batch,
                             fc_out=fc_out,
                             init_batch=cfg.init_batch if wide > 1 else None)
    else:
        w = random_weights(ker_wid, depth, cfg.real_batch, fc_out=fc_out,
                           seed=1,
                           init_batch=cfg.init_batch if wide > 1 else None)
    rng = np.random.default_rng(2)
    out_dir = f"Resnet_enc_results/results_crop_ker{ker_wid}_d{depth}_wid{wide}"
    os.makedirs(out_dir, exist_ok=True)
    raw0 = cfg.raw_in_wids[0]
    w0 = cfg.in_wids[0]

    for it in range(n_tests):
        pfx_d = "cf100_crop" if cf100 else "crop"
        img_file = (f"Resnet_plain_data/{pfx_d}_ker{ker_wid}_d{depth}"
                    f"_wid{wide}/test_image_{it}.csv")
        if os.path.exists(img_file):
            # the reference's image CSVs are the FULL in_wid² grid with
            # only the raw_in_wid² top-left corner meaningful
            # (/root/reference/test.go:129-148)
            image = np.loadtxt(img_file).reshape(w0, w0, 3)[:raw0, :raw0]
        else:
            image = rng.uniform(-1, 1, (raw0, raw0, 3))
        if debug:
            # packed-input matrix view (/root/reference/test.go:151)
            from .ops.debug import prt_mat

            mb0 = (runner.max_batch[0]
                   if isinstance(runner.max_batch, (list, tuple))
                   else runner.max_batch)
            norm0 = runner.norm[0]
            inp = np.zeros(params.n)
            w0 = cfg.in_wids[0]
            for b in range(3):
                blk = np.zeros((w0, w0))
                blk[:raw0, :raw0] = image[..., b]
                inp[b * norm0::mb0] = blk.ravel()
            prt_mat(inp, mb0, show=3, norm=norm0)
        timings: dict = {}
        t0 = time.perf_counter()
        logits = runner.infer(image, w, timings)
        total = time.perf_counter() - t0
        plain = plain_forward(w, image, depth, cfg.raw_in_wids)
        np.savetxt(f"{out_dir}/class_result_ker{ker_wid}_{it}.csv", logits)
        np.savetxt(f"{out_dir}/plain_result_ker{ker_wid}_{it}.csv", plain)
        agree = int(np.argmax(logits) == np.argmax(plain))
        for k, v in timings.items():
            print(f"  {k}: {v:.1f}s")
        print(f"sample {it}: total {total:.1f}s, argmax agree={agree}")
        print(_precision_stats(plain, logits))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 1
    debug = "--debug" in argv
    fast = "--fast" in argv
    skip_bl = "--no-bl" in argv
    argv = [a for a in argv if a not in ("--debug", "--fast", "--no-bl")]
    cmd = argv[0]
    if cmd in ("conv", "convReLU"):
        ker, ib, n = int(argv[1]), int(argv[2]), int(argv[3])
        if ker not in (3, 5, 7):
            raise SystemExit("kernel width must be 3, 5 or 7")
        if n > 10 or ib > 3:
            raise SystemExit("too many tests (>10) or batch index (>3)")
        boot = cmd == "convReLU"
        # the reference runs prior-art and the paper's method
        # back-to-back on the same data (/root/reference/main.go:639-643)
        if not skip_bl:
            print("Base Line start.")
            run_conv_bl(ker, ib, n, boot=boot)
        print("Ours start.")
        run_conv(ker, ib, n, boot=boot, debug=debug)
    elif cmd == "resnet":
        ker, depth, wide, n = (int(x) for x in argv[1:5])
        cf100 = argv[5].lower() in ("true", "1") if len(argv) > 5 else False
        if depth not in (8, 14, 20):
            raise SystemExit("depth must be 8, 14 or 20")
        run_resnet(ker, depth, wide, n, cf100, fast=fast, debug=debug)
    else:
        raise SystemExit(f"unknown command {cmd}")
    return 0
