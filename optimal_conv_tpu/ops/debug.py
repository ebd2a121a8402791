"""Per-stage decrypt oracles for the fused conv-BN-ReLU-bootstrap layer.

The reference's de-facto unit tests are decrypt-and-compare hooks
between pipeline stages (debug=true in evalConv_BNRelu_new:
debugCtoS /root/reference/eval.go:610-631, debugReLU :633-649,
debugStoC :651-722, printed through printDebug's precision stats).
`DebugOracle` reproduces that flow as a `debug_hook` for
`ops.pipeline.eval_conv_bn_relu`: each stage is decrypted and compared
against the plaintext mirror chain, restricted to the positions the
keep-mask retains (outside them the homomorphic result legitimately
carries negacyclic pad garbage that the repack discards).

Supported kinds: "Conv" (full pack) and "Conv_sparse" (folded sparse
pack).  Other kinds get level/scale/magnitude reporting only.
"""

from __future__ import annotations

import numpy as np

from ..ckks.context import CkksContext
from . import repack as rp
from .relu import relu_np


def precision_stats(want: np.ndarray, have: np.ndarray,
                    mask: np.ndarray | None = None) -> str:
    """log2-error distribution (GetPrecisionStatsPlain,
    /root/reference/main.go:694-717)."""
    want = np.asarray(want, dtype=float).ravel()
    have = np.asarray(have, dtype=float).ravel()
    if mask is not None:
        sel = np.asarray(mask).ravel().astype(bool)
        want, have = want[sel], have[sel]
    err = np.abs(want - have) + 1e-300
    lg = -np.log2(err)
    return (f"prec (log2): avg {lg.mean():6.2f}  min {lg.min():6.2f}  "
            f"max {lg.max():6.2f}")


class DebugOracle:
    """debug_hook comparing each pipeline stage to the plaintext mirror.

    plain_conv_cfs: expected conv+BN output as the N-coefficient layout
    vector, in unscaled units (the values the layer would decode to if
    decrypted right after the conv, times 2^pow).
    """

    def __init__(self, ctx: CkksContext, in_wid: int, kp_wid: int, kind: str,
                 pow_: float, log_sparse: int, plain_conv_cfs: np.ndarray):
        self.ctx = ctx
        self.in_wid = in_wid
        self.kp_wid = kp_wid
        self.kind = kind
        self.pow = pow_
        self.ls = log_sparse
        p = ctx.params
        self.n = p.n
        self.slots = p.n // 2
        self.logn = p.log_n
        self.cfs = np.asarray(plain_conv_cfs, dtype=float) / 2.0 ** pow_
        self.brv = np.array([rp.reverse_bits(i, self.logn - 1)
                             for i in range(self.slots)])
        self.golden = kind in ("Conv", "Conv_sparse")
        if not self.golden:
            return
        if self.ls == 0:
            self.keep = [rp.gen_keep_vec(self.slots, in_wid, kp_wid, ul)
                         for ul in (0, 1)]
            self.w_slots = [self.cfs[: self.slots][self.brv],
                            self.cfs[self.slots:][self.brv]]
        else:
            n_sub = self.slots >> self.ls
            cp = self.cfs[:: 1 << self.ls]            # subring coeffs
            brv_s = np.array([rp.reverse_bits(i, self.logn - 1 - self.ls)
                              for i in range(n_sub)])
            period = np.concatenate([cp[brv_s], cp[brv_s + n_sub]])
            self.w_slots = [np.tile(period, self.slots // (2 * n_sub)), None]
            self.keep = [rp.gen_keep_vec_sparse(self.slots, in_wid, kp_wid,
                                                self.ls), None]

    # ------------------------------------------------------------------

    def _info(self, ct) -> str:
        return f"lv={ct.level} scale=2^{np.log2(ct.scale):.1f}"

    def _report(self, stage: str, want, have, mask=None, ct=None):
        head = f"[debug {stage:6s}]"
        if ct is not None:
            head += f" {self._info(ct)}"
        if want is None:
            have = np.asarray(have)
            print(f"{head}  |have|max={np.max(np.abs(have)):.3g} "
                  "(no golden for this kind)", flush=True)
        else:
            print(f"{head}  {precision_stats(want, have, mask)}", flush=True)

    def __call__(self, stage: str, data):
        ctx = self.ctx
        if stage == "conv":
            have = ctx.decrypt_decode_coeffs(data)
            want = mask = None
            if self.golden:
                want = self.cfs
                mask = np.zeros(self.n)
                if self.ls == 0:
                    mask[: self.slots][self.brv] = self.keep[0]
                    mask[self.slots:][self.brv] = self.keep[1]
                else:
                    sub = np.zeros(self.slots >> (self.ls - 1))
                    n_sub = self.slots >> self.ls
                    brv_s = np.array(
                        [rp.reverse_bits(i, self.logn - 1 - self.ls)
                         for i in range(n_sub)])
                    sub[brv_s] = self.keep[0][:n_sub]
                    sub[brv_s + n_sub] = self.keep[0][n_sub: 2 * n_sub]
                    mask[:: 1 << self.ls] = sub
            self._report(stage, want, have, mask, ct=data)
            return
        if stage in ("ctos", "relu", "repack"):
            for ul, ct in enumerate(data):
                if ct is None:
                    continue
                have = ctx.decrypt_decode_slots(ct).real
                if len(have) < self.slots:           # sparse bootstrapper
                    have = np.tile(have, self.slots // len(have))
                want = mask = None
                if self.golden:
                    want = self.w_slots[ul]
                    if stage == "relu":
                        want = relu_np(want) * 2.0 ** self.pow
                    elif stage == "repack":
                        want = relu_np(want) * 2.0 ** self.pow * self.keep[ul]
                    mask = None if stage == "repack" else self.keep[ul]
                self._report(f"{stage}[{ul}]", want, have, mask, ct=ct)
            return
        if stage == "stoc":
            have = ctx.decrypt_decode_coeffs(data)
            want = None
            if self.golden:
                r = [relu_np(w) * 2.0 ** self.pow * k if w is not None else None
                     for w, k in zip(self.w_slots, self.keep)]
                want = np.zeros(self.n)
                if self.ls == 0:
                    want[: self.slots] = r[0][self.brv]
                    want[self.slots:] = r[1][self.brv]
                else:
                    n_sub = self.slots >> self.ls
                    brv_s = np.array(
                        [rp.reverse_bits(i, self.logn - 1 - self.ls)
                         for i in range(n_sub)])
                    sub = np.zeros(2 * n_sub)
                    sub[brv_s] = r[0][:n_sub]
                    sub[brv_s + n_sub] = r[0][n_sub: 2 * n_sub]
                    want[:: 1 << self.ls] = sub
            self._report(stage, want, have, ct=data)
            return
        print(f"[debug {stage}] (unknown stage)", flush=True)
