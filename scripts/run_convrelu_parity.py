#!/usr/bin/env python
"""Run the convReLU binary-parity check on the live backend (TPU).

The pytest version (tests/test_reference_parity.py::
test_reference_binary_parity_convrelu) is env-gated because it drives
the full logN=16 conv→CtoS→ReLU→StoC pipeline; under pytest it would
also run on the CPU conftest backend.  This wrapper executes the same
assertions on the default (axon TPU) platform:

    python scripts/run_convrelu_parity.py
"""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

os.environ["OPTCONV_RUN_HEAVY"] = "1"

from test_reference_parity import test_reference_binary_parity_convrelu

t0 = time.perf_counter()
test_reference_binary_parity_convrelu()
print(f"convReLU binary parity OK in {time.perf_counter() - t0:.1f}s")
