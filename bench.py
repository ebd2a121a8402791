#!/usr/bin/env python
"""Benchmark: encrypted 3×3 packed convolution (the reference's `conv 3 0 1`).

Runs the full homomorphic conv+BN layer — 4 NTT-domain ct×pt channel
products + SetScale + the log-depth pack butterfly (4 monomial muls,
4 Galois rotations with hybrid key-switch) — at the reference's own
geometry: logN=16, 128×128 spatial grid, 4 channels
(/root/reference/main.go:578: batch table {4,…}×width {128,…}).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the Go reference binary (test_run conv 3 0 1, "Ours" path) on
this container's CPU, measured once with synthetic-but-identically-sized
inputs: conv (with BN) wall-clock.  See BASELINE_NOTES below.
"""

import json
import os
import sys
import time

import numpy as np

# Go reference `test_run conv 3 0 1` on this container: "Ours" path
# "Conv (with BN) Done in" wall-clock = conv_then_pack + BN-bias add
# (kernel prep and en/decryption excluded), single-threaded Go/Lattigo
# fork, measured round 1: mult 90.9ms + pack 182.2ms = 273.3ms.
GO_REFERENCE_CONV_S = 0.2733


def micro_rates(iters: int = 8) -> dict:
    """Hot-loop primitive rates at the production chain (logN=16,
    DefaultBootstrapParams[6] moduli, max level): rotate / hoisted
    rotate / ct×ct+relin, chained-call protocol (one drain per span —
    see the tunnel note in the module docstring)."""
    from optimal_conv_tpu.ckks.params import boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.types import Ciphertext
    from optimal_conv_tpu.utils.timing import timeit_chained
    import jax.numpy as jnp

    params = boot_params(16)
    ctx = CkksContext(params, seed=0)
    lvl = params.max_level
    rng = np.random.default_rng(0)
    rows = np.stack([rng.integers(0, params.moduli[i], size=params.n,
                                  dtype=np.uint64) for i in range(lvl + 1)])
    ct = Ciphertext(jnp.asarray(rows), jnp.asarray(rows), level=lvl,
                    scale=params.scale)
    out = {}
    out["rotate_ms"] = round(timeit_chained(
        lambda c: ctx.rotate(c, 1), ct, iters), 2)
    # hoisted pair: one shared decomposition, two rotations
    out["hoisted_rotate_pair_ms"] = round(timeit_chained(
        lambda c: ctx.rotate_hoisted(c, [1, 2])[2], ct, iters), 2)
    out["mul_relin_ms"] = round(timeit_chained(
        lambda c: ctx.mul_ct(c, c), ct, iters), 2)
    out["rotates_per_sec"] = round(1e3 / out["rotate_ms"], 2)
    return out


def lt_stage_rate(iters: int = 4) -> dict:
    """One CtoS BSGS stage (grouped homomorphic DFT LinearTransform,
    log_sparse=3 stage 0, production chain, level max) — the flagship's
    hot block.  Warm-key, chained protocol.  ~1.3 s/apply post
    gcd-balanced split (commit 1382455); was 8.1 s with the degenerate
    1-baby split."""
    import time
    import jax.numpy as jnp
    from optimal_conv_tpu.ckks.params import boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.types import Ciphertext
    from optimal_conv_tpu.ckks import bootstrap as bs, dft
    from optimal_conv_tpu.utils.timing import sync

    p = boot_params(16)
    ctx = CkksContext(p, seed=0)
    ls = 3
    log_nsub = p.log_slots - ls
    reps = p.slots // (1 << log_nsub)
    enc_st = [dft.tile(s, reps) for s in dft.encode_stages(log_nsub)]
    lay = p.boot_layout
    ctos_groups = lay["ctos"][1] - lay["ctos"][0] - 1
    groups = dft.group_stages(enc_st, ctos_groups, p.slots)
    lt = bs.LinearTransform(ctx, groups[0], p.max_level)
    rng = np.random.default_rng(0)
    rows = np.stack([rng.integers(0, p.moduli[i], p.n, dtype=np.uint64)
                     for i in range(p.max_level + 1)])
    ct = Ciphertext(jnp.asarray(rows), jnp.asarray(rows),
                    level=p.max_level, scale=p.scale)
    sync(lt(ct))                                # compiles + keygen
    t0 = time.perf_counter()
    outs = [lt(ct) for _ in range(iters)]
    sync(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return {"lt_ctos_stage_ms": round(dt * 1e3, 1),
            "lt_stages_per_sec": round(1.0 / dt, 2)}


def main():
    import jax

    from optimal_conv_tpu.ckks.params import CkksParams
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ops import conv as convops

    log_n = 16
    in_wid, ker_wid, batch = 128, 3, 4
    raw_wid = in_wid - ker_wid // 2
    params = CkksParams(log_n=log_n, logq=(60, 45), logp=(61,),
                        log_scale=30, h=192)
    ctx = CkksContext(params, seed=0)
    rng = np.random.default_rng(0)

    img = rng.uniform(-1, 1, (raw_wid, raw_wid, batch))
    ker = rng.uniform(-1, 1, (ker_wid, ker_wid, batch, batch)) / 9.0
    bn_a = rng.uniform(0.8, 1.2, batch)
    bn_b = rng.uniform(-0.2, 0.2, batch)

    inp = convops.prep_input(img.ravel(), raw_wid, in_wid, params.n, 1)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, params.scale, 1))
    # distinct input cts per timed iteration: the axon tunnel memoizes
    # (executable, inputs) pairs, so repeating one ct measures cache hits
    iters = 16
    cts = [ct] + [ctx.encrypt(ctx.encoder.encode_coeffs(
        inp * (1.0 - 1e-6 * (i + 1)), params.scale, 1)) for i in range(iters)]

    # kernel prep outside the timed span, matching the reference's
    # "Conv (with BN) Done in" = conv_then_pack + bias add
    max_batch = params.n // (in_wid * in_wid)
    out_scale = float(1 << 30)
    pl = convops.prep_ker(ctx, ker.ravel(), bn_a, in_wid, ker_wid, batch,
                          batch, 1, 1, 0, False)
    b_coeffs = np.zeros(params.n)
    for i, b in enumerate(bn_b):
        b_coeffs[i::max_batch] = b
    pl_b = ctx.encoder.encode_coeffs(b_coeffs, out_scale, 0, mont=False)

    from optimal_conv_tpu.utils.timing import sync

    def run(ct_in):
        return convops.conv_then_pack(ctx, ct_in, pl, max_batch, 1, out_scale,
                                      bias_pt=pl_b)

    out = run(cts[0])
    sync(out.c0, out.c1)       # warmup: compiles + key generation + drain
    # Enqueue all iterations (distinct inputs — every conv genuinely
    # executes) and drain ONCE: the host→device sync round-trip through
    # the tunnel is ~30 ms, so syncing each call would measure RPC
    # latency, not the op.  The single drain amortizes to ~2 ms/call.
    t0 = time.perf_counter()
    outs = [run(cts[1 + i]) for i in range(iters)]
    out = outs[-1]
    sync(out.c0, out.c1)
    dt = (time.perf_counter() - t0) / iters

    # correctness spot check
    cfs = ctx.decrypt_decode_coeffs(out)
    got = convops.post_process(cfs, raw_wid, in_wid)
    got = got.reshape(raw_wid, raw_wid, -1)[:, :, :batch]
    want = convops.conv2d_same_np(img, ker) * bn_a + bn_b
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-2, f"conv mismatch: {err}"

    extra = {}
    if os.environ.get("OPTCONV_BENCH_MICRO", "1") != "0":
        try:
            extra.update(micro_rates())
        except Exception as e:            # never fail the primary metric
            extra["micro_error"] = repr(e)
        try:
            extra.update(lt_stage_rate())
        except Exception as e:
            extra["lt_error"] = repr(e)
    # Full-run detail (flagship per-block timings, bootstraps/sec,
    # roofline) lives in BENCH_DETAIL.json — produced by
    # scripts/run_resnet_demo.py / bench_boot.py / roofline.py and
    # committed.  Echo only a few recorded SCALARS here: the primary
    # metric line must stay short (the driver keeps a bounded tail of
    # stdout, and round 3's inlined blob made it unparseable).
    detail = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_DETAIL.json")
    if os.path.exists(detail):
        try:
            rec = json.load(open(detail))
            br = rec.get("boot_rates", {})
            for k in ("boots_per_sec_ls3", "boots_per_sec_ls0",
                      "flagship_layer_s_warm"):
                if k in br:
                    extra[k] = br[k]
        except Exception:
            pass

    print(json.dumps({
        "metric": "encrypted_conv3x3_batch4_latency",
        "value": round(dt * 1e3, 2),
        "unit": "ms",
        "vs_baseline": round(GO_REFERENCE_CONV_S / dt, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
