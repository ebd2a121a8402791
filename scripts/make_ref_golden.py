"""Synthesize test_conv_data/*.csv for the Go reference binary.

Generates EXACTLY the same deterministic data the CLI's synthetic branch
uses (cli.run_conv, rng seed 0, same draw order), so that

  1. ./test_run conv 3 0 1 / convReLU 3 0 1   (the reference binary) and
  2. python -m optimal_conv_tpu conv 3 0 1 / convReLU 3 0 1

consume IDENTICAL inputs and can be A/B'd: the binary prints its first
10 decrypted output values at 10 decimals (printDebugCfsPlain,
/root/reference/main.go:694-717) plus precision stats vs the golden
'out'/'reluout' files written here (computed by the same numpy oracle
the CLI validates against).

Usage: python scripts/make_ref_golden.py <out_dir> <ker_wid> <i_batch> <n>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from optimal_conv_tpu.ops.conv import conv2d_same_np
from optimal_conv_tpu.ops.relu import relu_np

BATCHS = [4, 16, 64, 256, 1024]
WIDTHS = [128, 64, 32, 16, 8]


def main():
    out_dir, ker_wid, i_batch, n = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    in_batch = BATCHS[i_batch]
    in_wid = WIDTHS[i_batch]
    raw_wid = in_wid - ker_wid // 2
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for it in range(n):
        # EXACT draw order of cli.run_conv's synthetic branch
        raw = rng.uniform(-1, 1, raw_wid * raw_wid * in_batch)
        ker = rng.uniform(-1, 1, ker_wid * ker_wid * in_batch * in_batch) \
            / ker_wid**2
        bn_a = rng.uniform(0.8, 1.2, in_batch)
        bn_b = rng.uniform(-0.2, 0.2, in_batch)
        img = raw.reshape(raw_wid, raw_wid, in_batch)
        kk = ker.reshape(ker_wid, ker_wid, in_batch, in_batch)
        plain = conv2d_same_np(img, kk) * bn_a + bn_b
        base = os.path.join(out_dir,
                            f"test_conv{ker_wid}_batch_{in_batch}")
        for name, arr in (("in", raw), ("ker", ker), ("bna", bn_a),
                          ("bnb", bn_b), ("out", plain.ravel()),
                          ("reluout", relu_np(plain).ravel())):
            np.savetxt(f"{base}_{name}_{it}.csv", arr, fmt="%.17g")
        print(f"iter {it}: wrote {base}_*  (raw {raw_wid}x{raw_wid}x"
              f"{in_batch}, plain out range [{plain.min():.3f}, "
              f"{plain.max():.3f}])")


if __name__ == "__main__":
    main()
