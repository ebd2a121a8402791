"""Extract the test_lattigo fork's exact CKKS bootstrap parameter sets
from the shipped reference binary (/root/reference/test_run).

Lattigo v2's DefaultBootstrapParams is a []*BootstrappingParameters; the
fork (github.com/dwkim606/test_lattigo@eb33b0555aaa) extends the struct
with two extra moduli sections used for the in-bootstrap ReLU.  The
structs and their []uint64 moduli arrays live in the binary's RW data
segment; the pointer slice for DefaultBootstrapParams (8 entries) sits
at file offset 0x2a1040.  Struct layout (verified by dumping [6]/[7] and
cross-checking the printed logQP=1553/1582, QCount=28):

    +0x00 ResidualModuli        []uint64
    +0x18 KeySwitchModuli       []uint64      (the P primes)
    +0x30 SlotsToCoeffs.Qi      []uint64
    +0x48 SlotsToCoeffs.Scaling [][]float64
    +0x60 ReLUModuliA.Qi        []uint64      (fork addition; empty in [7])
    +0x78 ReLUModuliA.Scaling   float64
    +0x80 ReLUModuliB.Qi        []uint64      (fork addition; empty in [7])
    +0x98 ReLUModuliB.Scaling   float64
    +0xa0 SineEval.Qi           []uint64
    +0xb8 SineEval.Scaling      float64
    +0xc0 CoeffsToSlots.Qi      []uint64
    +0xd8 CoeffsToSlots.Scaling [][]float64
    +0xf0 LogN  +0xf8 LogSlots  +0x100 Scale  +0x108 Sigma  +0x110 H

Full Q chain (bottom..top) = Residual ++ StC ++ ReLUA ++ ReLUB ++ Sine
++ CtS; P = KeySwitchModuli.  Writes JSON to stdout or argv[2].
"""

import json
import math
import struct
import sys

BIN = "/root/reference/test_run"
PTR_ARRAY_OFF = 0x2A1040  # file offset of DefaultBootstrapParams backing array

SEGMENTS = [  # (vaddr, file_off, size) from readelf -l
    (0x684000, 0x284000, 0x557B0),
    (0x55F000, 0x15F000, 0x1247A8),
    (0x400000, 0x000000, 0x15E6AA),
]


def va2off(va):
    for v, o, s in SEGMENTS:
        if v <= va < v + s:
            return va - v + o
    raise ValueError(hex(va))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else BIN
    blob = open(path, "rb").read()

    def w(off):
        return struct.unpack("<Q", blob[off:off + 8])[0]

    def f(off):
        return struct.unpack("<d", blob[off:off + 8])[0]

    def u64s(off, n):
        return list(struct.unpack(f"<{n}Q", blob[off:off + 8 * n]))

    def slice_u64(soff):
        ptr, ln = w(soff), w(soff + 8)
        return u64s(va2off(ptr), ln) if ln else []

    def slice_f64_2d(soff):
        """[][]float64: outer slice of slice-headers."""
        ptr, ln = w(soff), w(soff + 8)
        out = []
        for i in range(ln):
            h = va2off(ptr) + 24 * i
            p2, l2 = w(h), w(h + 8)
            out.append(list(struct.unpack(f"<{l2}d", blob[va2off(p2):va2off(p2) + 8 * l2])))
        return out

    params = []
    for i in range(8):
        s = va2off(w(PTR_ARRAY_OFF + 8 * i))
        entry = {
            "index": i,
            "residual": slice_u64(s + 0x00),
            "p": slice_u64(s + 0x18),
            "stc_qi": slice_u64(s + 0x30),
            "stc_scaling": slice_f64_2d(s + 0x48),
            "relu_a_qi": slice_u64(s + 0x60),
            "relu_a_scaling": f(s + 0x78),
            "relu_b_qi": slice_u64(s + 0x80),
            "relu_b_scaling": f(s + 0x98),
            "sine_qi": slice_u64(s + 0xA0),
            "sine_scaling": f(s + 0xB8),
            "cts_qi": slice_u64(s + 0xC0),
            "cts_scaling": slice_f64_2d(s + 0xD8),
            "log_n": w(s + 0xF0),
            "log_slots": w(s + 0xF8),
            "scale": f(s + 0x100),
            "sigma": f(s + 0x108),
            "h": w(s + 0x110),
        }
        q = (entry["residual"] + entry["stc_qi"] + entry["relu_a_qi"]
             + entry["relu_b_qi"] + entry["sine_qi"] + entry["cts_qi"])
        entry["q_chain"] = q
        prod = 1
        for x in q + entry["p"]:
            prod *= x
        entry["log_qp"] = prod.bit_length()
        entry["q_count"] = len(q)
        entry["q_bits"] = [x.bit_length() for x in q]
        entry["p_bits"] = [x.bit_length() for x in entry["p"]]
        params.append(entry)

    out = json.dumps(params, indent=1)
    if len(sys.argv) > 2:
        open(sys.argv[2], "w").write(out)
    else:
        print(out)
    for e in params:
        print(f"[{e['index']}] logN={e['log_n']} logSlots={e['log_slots']} "
              f"h={e['h']} scale=2^{math.log2(e['scale']):.0f} "
              f"QCount={e['q_count']} logQP={e['log_qp']} "
              f"Qbits={e['q_bits']} Pbits={e['p_bits']}", file=sys.stderr)


if __name__ == "__main__":
    main()
