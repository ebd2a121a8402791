#!/usr/bin/env python
"""Scaling-efficiency report: sharded encrypted-layer throughput vs mesh
size (BASELINE.md north-star: efficiency at 1 chip / 1 host / N hosts).

Runs the communication-complete fused layer step (ct×pt product + full
hybrid-key-switch rotation + rescale) batched over the mesh's data axes,
with RNS limbs sharded over tp — the same GSPMD program the TPU pod
would run; on the fake-CPU mesh the numbers are *relative* scaling, not
absolute rates.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py [--logn 12] [--levels 23]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--levels", type=int, default=23)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax
    # This host preimports jax with a 1-chip remote TPU (axon). A scaling
    # sweep needs >1 device, so run the fake CPU mesh: the backend
    # initializes lazily, so flipping the platform here (before any device
    # use) keeps the sweep off the TPU tunnel. Pass --devices 1 to measure
    # the real single chip instead.
    if args.devices > 1:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from optimal_conv_tpu.ckks.params import CkksParams
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.core import ntt as nttmod
    from optimal_conv_tpu.parallel import sharding as sh

    params = CkksParams(log_n=args.logn,
                        logq=(45,) + (35,) * args.levels,
                        logp=(45,) * 4, log_scale=25,
                        h=min(192, (1 << args.logn) // 4))
    ctx = CkksContext(params, seed=0)
    lvl = params.max_level
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, params.scale, lvl))
    pt = ctx.encoder.encode_coeffs(rng.uniform(-1, 1, 8), params.scale, lvl)
    g = nttmod.rot_to_galois(1, params.log_n)
    swk = ctx.galois_key(g, lvl)
    perm = jnp.asarray(nttmod.galois_perm_ntt(params.log_n, g))

    devs = jax.devices()
    base_dt = None
    batch = args.devices                       # fixed total work
    print(f"platform={devs[0].platform}  batch={batch}  "
          f"[{lvl + 1} limbs, N=2^{args.logn}]")
    n = 1
    while n <= len(devs):
        tp = 1
        while tp * 2 <= n and (lvl + 1 + params.num_p) % 1 == 0 and tp < 4:
            tp *= 2
        mesh = Mesh(np.asarray(devs[:n]).reshape(n // tp, tp), ("dp", "tp"))
        step = sh.build_sharded_layer_step(ctx, lvl, mesh)
        c0 = jnp.broadcast_to(ct.c0, (batch,) + ct.c0.shape)
        c1 = jnp.broadcast_to(ct.c1, (batch,) + ct.c1.shape)
        a0 = jax.device_put(c0, sh.batch_sharding(mesh))
        a1 = jax.device_put(c1, sh.batch_sharding(mesh))
        d0 = jax.device_put(swk.d0, sh.key_sharding(mesh))
        d1 = jax.device_put(ctx.swk_d1(swk), sh.key_sharding(mesh))
        out = step(a0, a1, pt.poly, perm, d0, d1)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(a0, a1, pt.poly, perm, d0, d1)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        if base_dt is None:
            base_dt = dt
        eff = base_dt / dt / n
        print(f"devices {n:2d} (dp={n // tp} tp={tp}): {dt * 1e3:8.1f} ms/step"
              f"  speedup {base_dt / dt:5.2f}x  efficiency {eff * 100:5.1f}%",
              flush=True)
        n *= 2


if __name__ == "__main__":
    main()
