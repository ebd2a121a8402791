#!/usr/bin/env python
"""Profile ONE CtoS BSGS stage at logN=16 (production chain) on the TPU.

Phase breakdown via OPTCONV_LT_PROFILE (keys / babies / inner /
giant_acc / finish), warm-key vs churn (key cache cleared per apply) —
decides where the flagship's 48 s CtoS actually goes.

    python scripts/profile_lt.py [--level L] [--ls 3] [--iters 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
os.environ["OPTCONV_LT_PROFILE"] = "1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ls", type=int, default=3)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--level", type=int, default=None)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from optimal_conv_tpu.ckks.params import boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.types import Ciphertext
    from optimal_conv_tpu.ckks import bootstrap as bs, dft
    from optimal_conv_tpu.utils.timing import sync

    params = boot_params(16)
    ctx = CkksContext(params, seed=0)
    p = params
    lvl = p.max_level if args.level is None else args.level
    log_nsub = p.log_slots - args.ls
    reps = p.slots // (1 << log_nsub)
    enc_st = [dft.tile(s, reps) for s in dft.encode_stages(log_nsub)]
    lay = p.boot_layout
    ctos_groups = lay["ctos"][1] - lay["ctos"][0] - (1 if args.ls else 0)
    t0 = time.perf_counter()
    groups = dft.group_stages(enc_st, ctos_groups, p.slots)
    lt = bs.LinearTransform(ctx, groups[0], lvl)
    print(f"build: {time.perf_counter()-t0:.1f} s  "
          f"(babies {len(lt.babies)}, giants {len(lt.stacked)}, "
          f"level {lvl})", flush=True)

    rng = np.random.default_rng(0)
    rows = np.stack([rng.integers(0, p.moduli[i], p.n, dtype=np.uint64)
                     for i in range(lvl + 1)])
    ct = Ciphertext(jnp.asarray(rows), jnp.asarray(rows), level=lvl,
                    scale=p.scale)

    t0 = time.perf_counter()
    out = lt(ct)
    sync(out)
    print(f"first apply (compiles+keygen): {time.perf_counter()-t0:.1f} s",
          flush=True)
    for mode in ("warm", "churn"):
        bs.LT_PROF.clear()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            if mode == "churn":
                ctx._swk_cache.d.clear()
                ctx._swk_cache.d0_bytes = ctx._swk_cache.d1_bytes = 0
            out = lt(ct)
            sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        phases = {k: round(v / args.iters, 3)
                  for k, v in bs.LT_PROF.items()}
        print(f"{mode}: {dt:.2f} s/apply  {json.dumps(phases)}", flush=True)


if __name__ == "__main__":
    main()
