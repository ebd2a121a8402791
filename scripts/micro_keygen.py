#!/usr/bin/env python
"""Micro: hoisted Galois key generation/REGENERATION cost at the
production chain (logN=16, DefaultBootstrapParams[6]).

The flagship's per-layer key working set exceeds the HBM key budget, so
the LRU regenerates most switching keys every layer.  This measures the
per-key regen wall time (the suspected dominator of the 48 s CtoS /
15.6 s StoC steady-state stages) at a high and a low level.
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    from optimal_conv_tpu.ckks.params import boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.utils.timing import sync

    params = boot_params(16)
    ctx = CkksContext(params, seed=0)
    for lvl in (params.max_level, 3):
        ks = [1, 2, 4, 8]
        # cold generation
        t0 = time.perf_counter()
        swks = []
        for k in ks:
            import optimal_conv_tpu.core.ntt as nttmod
            g = nttmod.rot_to_galois(k, params.log_n)
            swks.append(ctx.galois_key_hoisted(g, lvl))
        sync(*[s.d0 for s in swks])
        cold = (time.perf_counter() - t0) / len(ks)
        # regen: evict everything, same calls repeat the full chain
        ctx._swk_cache.d.clear()
        ctx._swk_cache.d0_bytes = ctx._swk_cache.d1_bytes = 0
        t0 = time.perf_counter()
        swks = []
        for k in ks:
            g = nttmod.rot_to_galois(k, params.log_n)
            swks.append(ctx.galois_key_hoisted(g, lvl))
        sync(*[s.d0 for s in swks])
        regen = (time.perf_counter() - t0) / len(ks)
        d0_mb = swks[0].d0.size * 8 / 1e6
        print(f"level {lvl}: cold {cold:.2f} s/key, regen {regen:.2f} s/key"
              f"  (d0 {d0_mb:.0f} MB)")


if __name__ == "__main__":
    main()
