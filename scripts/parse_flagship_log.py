#!/usr/bin/env python
"""Collect per-layer / per-stage seconds from run_resnet_demo logs.

    python scripts/parse_flagship_log.py LOG [LOG...]

Prints one JSON object: {"layers": {li: {"total": s, "stages": {...}}},
"blocks": {...}, "total": s} — later logs override earlier (resume
legs re-run the interrupted layer).
"""
import json
import re
import sys

stage_re = re.compile(r"\[(\w+): ([0-9.]+)s\]")
layer_re = re.compile(r"layer (\d+) \((\w+), ls=(\d+)\) done in ([0-9.]+)s")
block_re = re.compile(
    r"Blc1: ([0-9.]+)s  Blc1->2: ([0-9.]+)s  Blc2: ([0-9.]+)s  "
    r"Blc2->3: ([0-9.]+)s  Blc3: ([0-9.]+)s  FC: ([0-9.]+)s")
total_re = re.compile(r"Total done in ([0-9.]+)s")

layers = {}
blocks = {}
total = None
pending = {}
leg_re = re.compile(r"^=== leg \d+ ")
for path in sys.argv[1:]:
    # stage lines from a leg that died mid-layer must not attach to the
    # next leg's first completed layer
    pending = {}
    for line in open(path):
        if leg_re.match(line):
            pending = {}
            continue
        m = stage_re.search(line)
        if m:
            pending[m.group(1)] = float(m.group(2))
            continue
        m = layer_re.search(line)
        if m:
            li = int(m.group(1))
            layers[li] = {"kind": m.group(2), "ls": int(m.group(3)),
                          "total": float(m.group(4)), "stages": pending}
            pending = {}
            continue
        m = block_re.search(line)
        if m:
            for k, v in zip(("blc1", "blc1to2", "blc2", "blc2to3", "blc3",
                             "fc"), m.groups()):
                blocks[k] = float(v)
            continue
        m = total_re.search(line)
        if m:
            total = float(m.group(1))

print(json.dumps({"layers": layers, "blocks": blocks, "total": total},
                 indent=1))
