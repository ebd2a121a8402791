"""Encrypted ImageNet tail blocks (14×14×256 → 7×7×512 → FC-1000).

Replaces ``testImagenet_sparse`` (/root/reference/test.go:1402-1607) and
the ``Imagenet_sparse`` branch of newContext (main.go:225-263): two conv
blocks at full packing (log_sparse 0) and half-sparse (1), the
transition as TWO split-kernel ``StrConv_sparse_full`` convolutions with
the odd half interleaved by X^norm (the same dual-full-conv trick as
wide-3 ResNet), and a dual-conv FC head for the 1000-way classifier.

Both runners expose ``infer_features`` (identity-FC feature readout)
and ``infer_logits`` (the reference's RMFC: FC matrix replicated at all
7×7 taps, bn 1/kp², 1000 logits at output stride 1 read from the
1-based (4,4) grid position, /root/reference/test.go:1565-1600).  The
reference reaches this workload only by editing its main(); mini e2e
tests validate both heads against the plain mirror.
"""

from __future__ import annotations

import numpy as np

from ..ckks.context import CkksContext
from ..ckks.bootstrap import BootstrapperFamily
from ..ops import conv as convops
from ..ops import repack as rp
from ..ops.pipeline import eval_conv_bn_relu, LayerMaps


class ImagenetTailRunner:
    def __init__(self, ctx: CkksContext, ker_wid: int = 3,
                 boot_kwargs: dict | None = None,
                 num_blc: tuple[int, int] = (3, 3)):
        self.ctx = ctx
        self.ker_wid = ker_wid
        p = ctx.params
        self.in_wids = (16, 8)
        self.kp_wids = (14, 7 if ker_wid == 3 else 6)
        self.real_batch = (p.n // 256 * 0 + p.n // (16 * 16) // 1,
                           p.n // (8 * 8) // 2)   # full pack / half sparse
        self.norm = (1, 2)
        self.log_sparse = (0, 1)
        self.num_blc = num_blc
        vec = p.n // 2

        self.keep_maps = [
            LayerMaps(ext_idx=[rp.gen_keep_vec(vec, 16, self.kp_wids[0], 0),
                               rp.gen_keep_vec(vec, 16, self.kp_wids[0], 1)]),
            LayerMaps(ext_idx=[rp.gen_keep_vec_sparse(vec, 8, self.kp_wids[1],
                                                      1), None]),
        ]
        m0, r0 = rp.gen_comprs_sparse(vec, 16, self.kp_wids[1], 0, 0, 0)
        m1, r1 = rp.gen_comprs_sparse(vec, 16, self.kp_wids[1], 0, 1, 0)
        self.str_maps = LayerMaps(m_idx=m0, r_idx=r0, m_idx_l=m1, r_idx_l=r1)

        self.btps = BootstrapperFamily(ctx, boot_kwargs)

    def encrypt_input(self, x: np.ndarray):
        """x [14, 14, C0] (C0 = full batch of block 1) → level-1 ct."""
        p = self.ctx.params
        b0 = self.real_batch[0]
        inp = np.zeros(p.n)
        w0 = self.in_wids[0]
        for b in range(x.shape[-1]):
            blk = np.zeros((w0, w0))
            blk[: x.shape[0], : x.shape[1]] = x[..., b]
            inp[b::p.n // (w0 * w0)] = blk.ravel()
        return self.ctx.encrypt(self.ctx.encoder.encode_coeffs(inp, p.scale, 1))

    def infer_features(self, x: np.ndarray, convs: list, bn_a: list,
                       bn_b: list, init_pow=6.0, mid_pow=5.0) -> np.ndarray:
        """Run the two blocks; returns decrypted feature coefficients."""
        ctx = self.ctx
        b1 = self.real_batch[1]
        ct = self._run_blocks(x, convs, bn_a, bn_b, init_pow, mid_pow)
        return ctx.decrypt_decode_coeffs(
            convops.eval_conv_bn(ctx, ct, *_identity_fc(b1, self.kp_wids[1]),
                                 8, self.kp_wids[1] | 1, b1, b1, 2,
                                 float(1 << 30)))

    def infer_logits(self, x: np.ndarray, convs: list, bn_a: list,
                     bn_b: list, fc_w: np.ndarray, fc_b: np.ndarray,
                     init_pow=6.0, mid_pow=5.0) -> np.ndarray:
        """Full classifier: blocks + the 1000-way RMFC head — one conv
        with the FC matrix replicated at all 7×7 taps and bn_a = 1/kp²
        (reduce-mean), logits read at the 1-based (4,4) grid position
        (/root/reference/test.go:1565-1600).  The reference's own call
        passes norm=1 for BOTH sides, misreading the stride-2 sparse
        input (that test is unreachable without editing its main());
        here the input stride is the explicit in_norm=norm[1] so every
        block-2 feature contributes, while the 1000 logits land at
        output stride 1 (1000 > max_batch/norm would not fit at 2)."""
        ctx = self.ctx
        p = ctx.params
        b1 = self.real_batch[1]
        kp = self.kp_wids[1]
        ct = self._run_blocks(x, convs, bn_a, bn_b, init_pow, mid_pow)
        kw = 7
        n_out = fc_w.shape[1]
        ker = np.broadcast_to(fc_w[None, None], (kw, kw, b1, n_out)).copy()
        bn_af = np.full(n_out, 1.0 / (kp * kp))
        out = convops.eval_conv_bn(ctx, ct, ker.ravel(), bn_af,
                                   np.asarray(fc_b), 8, kw, b1, n_out, 1,
                                   float(1 << 30), in_norm=self.norm[1])
        cfs = ctx.decrypt_decode_coeffs(out)
        mb = p.n // 64
        ctr = (kw // 2) * 8 * mb + (kw // 2) * mb
        return cfs[ctr: ctr + n_out]

    def _run_blocks(self, x: np.ndarray, convs: list, bn_a: list,
                    bn_b: list, init_pow: float, mid_pow: float):
        ctx = self.ctx
        ct = self.encrypt_input(x)
        li = 0
        pow_ = init_pow
        b0, b1 = self.real_batch
        for i in range(self.num_blc[0]):
            if i == self.num_blc[0] - 1:
                pow_ = mid_pow
            ct = eval_conv_bn_relu(
                ctx, self.btps, ct, convs[li].ravel(), bn_a[li], bn_b[li],
                0.0, pow_, 16, self.kp_wids[0], self.ker_wid, b0, b0,
                1, 0, 1, 2, 0, "Conv_sparse", self.keep_maps[0])
            li += 1
        # transition: dual split-kernel full strided convs
        ker = convs[li]
        c1 = eval_conv_bn_relu(
            ctx, self.btps, ct, ker[:, :, :, 0::2].ravel(), bn_a[li][0::2],
            bn_b[li][0::2], 0.0, pow_, 16, self.kp_wids[1], self.ker_wid,
            b0, b1 // 2, 1, 0, 1, 2, 0, "StrConv_sparse_full", self.str_maps)
        c2 = eval_conv_bn_relu(
            ctx, self.btps, ct, ker[:, :, :, 1::2].ravel(), bn_a[li][1::2],
            bn_b[li][1::2], 0.0, pow_, 16, self.kp_wids[1], self.ker_wid,
            b0, b1 // 2, 1, 0, 1, 2, 0, "StrConv_sparse_full", self.str_maps)
        ct = ctx.add(c1, ctx.mul_monomial(c2, self.norm[1]))
        li += 1
        for i in range(self.num_blc[1]):
            ct = eval_conv_bn_relu(
                ctx, self.btps, ct, convs[li].ravel(), bn_a[li], bn_b[li],
                0.0, pow_, 8, self.kp_wids[1], self.ker_wid, b1, b1,
                2, 0, 1, 2, 1, "Conv_sparse", self.keep_maps[1])
            li += 1
        return ct


def _identity_fc(ch: int, raw: int):
    """Reduce-mean 'conv' with identity channel mixing (feature readout)."""
    kw = raw if raw % 2 == 1 else raw + 1
    ker = np.zeros((kw, kw, ch, ch))
    ker[:, :] = np.eye(ch)
    bn_a = np.full(ch, 1.0 / (raw * raw))
    bn_b = np.zeros(ch)
    return ker.ravel(), bn_a, bn_b


class ImagenetFinalFastRunner:
    """The ``Imagenet_final_fast`` regime (testImagenet_final_fast_in,
    /root/reference/test.go:1209-1400): BOTH blocks at full packing
    (log_sparse=0, "Conv" with gen_keep_vec masks); the block transition
    is TWO plain "StrConv" evaluations of the out-channel halves at
    pack_pos 0 and 1 (single-stage gen_comprs_full repack with
    kp = 2·kp_wids[1], newContext "Imagenet_final_fast",
    /root/reference/main.go:378-404), summed; RMFC head = one 7-wide
    replicated-tap conv, logits at 1-based grid position (4, 4)."""

    def __init__(self, ctx: CkksContext, ker_wid: int = 3,
                 boot_kwargs: dict | None = None,
                 num_blc: tuple[int, int] = (3, 3)):
        self.ctx = ctx
        self.ker_wid = ker_wid
        p = ctx.params
        self.in_wids = (16, 8)
        self.kp_wids = (14, 7 if ker_wid == 3 else 6)
        self.real_batch = (p.n // (16 * 16), 2 * (p.n // (16 * 16)))
        self.num_blc = num_blc
        vec = p.n // 2

        self.keep_maps = [
            LayerMaps(ext_idx=[rp.gen_keep_vec(vec, 16, self.kp_wids[0], 0),
                               rp.gen_keep_vec(vec, 16, self.kp_wids[0], 1)]),
            LayerMaps(ext_idx=[rp.gen_keep_vec(vec, 8, self.kp_wids[1], 0),
                               rp.gen_keep_vec(vec, 8, self.kp_wids[1], 1)]),
        ]
        kp2 = 2 * self.kp_wids[1]
        self.str_maps = [
            LayerMaps(r_idx=rp.gen_comprs_full(vec, 16, kp2, pos, 0),
                      r_idx_l=rp.gen_comprs_full(vec, 16, kp2, pos, 1))
            for pos in range(2)]
        self.btps = BootstrapperFamily(ctx, boot_kwargs)

    def encrypt_input(self, x: np.ndarray):
        p = self.ctx.params
        w0 = self.in_wids[0]
        inp = np.zeros(p.n)
        for b in range(x.shape[-1]):
            blk = np.zeros((w0, w0))
            blk[: x.shape[0], : x.shape[1]] = x[..., b]
            inp[b::p.n // (w0 * w0)] = blk.ravel()
        return self.ctx.encrypt(self.ctx.encoder.encode_coeffs(inp, p.scale, 1))

    def infer_features(self, x: np.ndarray, convs: list, bn_a: list,
                       bn_b: list, init_pow=6.0, mid_pow=5.0) -> np.ndarray:
        ctx = self.ctx
        b1 = self.real_batch[1]
        ct = self._run_blocks(x, convs, bn_a, bn_b, init_pow, mid_pow)
        return ctx.decrypt_decode_coeffs(
            convops.eval_conv_bn(ctx, ct, *_identity_fc(b1, self.kp_wids[1]),
                                 8, self.kp_wids[1] | 1, b1, b1, 1,
                                 float(1 << 30)))

    def infer_logits(self, x: np.ndarray, convs: list, bn_a: list,
                     bn_b: list, fc_w: np.ndarray, fc_b: np.ndarray,
                     init_pow=6.0, mid_pow=5.0) -> np.ndarray:
        """1000-way RMFC head at full packing: FC replicated at all 7×7
        taps, bn_a = 1/kp², both strides 1 (the full-pack block-2 output
        is contiguous), logits at the 1-based (4,4) grid position
        (/root/reference/test.go:1360-1393)."""
        ctx = self.ctx
        p = ctx.params
        b1 = self.real_batch[1]
        kp = self.kp_wids[1]
        ct = self._run_blocks(x, convs, bn_a, bn_b, init_pow, mid_pow)
        kw = 7
        n_out = fc_w.shape[1]
        ker = np.broadcast_to(fc_w[None, None], (kw, kw, b1, n_out)).copy()
        bn_af = np.full(n_out, 1.0 / (kp * kp))
        out = convops.eval_conv_bn(ctx, ct, ker.ravel(), bn_af,
                                   np.asarray(fc_b), 8, kw, b1, n_out, 1,
                                   float(1 << 30))
        cfs = ctx.decrypt_decode_coeffs(out)
        mb = p.n // 64
        ctr = (kw // 2) * 8 * mb + (kw // 2) * mb
        return cfs[ctr: ctr + n_out]

    def _run_blocks(self, x: np.ndarray, convs: list, bn_a: list,
                    bn_b: list, init_pow: float, mid_pow: float):
        ctx = self.ctx
        ct = self.encrypt_input(x)
        li = 0
        pow_ = init_pow
        b0, b1 = self.real_batch
        for i in range(self.num_blc[0]):
            if i == self.num_blc[0] - 1:
                pow_ = mid_pow
            ct = eval_conv_bn_relu(
                ctx, self.btps, ct, convs[li].ravel(), bn_a[li], bn_b[li],
                0.0, pow_, 16, self.kp_wids[0], self.ker_wid, b0, b0,
                1, 0, 1, 2, 0, "Conv", self.keep_maps[0])
            li += 1
        # transition: out-channel halves as two plain StrConvs at pos 0/1
        ker = convs[li]
        halves = []
        for pos in range(2):
            kh = ker[:, :, :, pos * b1 // 2:(pos + 1) * b1 // 2]
            halves.append(eval_conv_bn_relu(
                ctx, self.btps, ct, kh.ravel(),
                bn_a[li][pos * b1 // 2:(pos + 1) * b1 // 2],
                bn_b[li][pos * b1 // 2:(pos + 1) * b1 // 2],
                0.0, pow_, 16, 2 * self.kp_wids[1], self.ker_wid, b0, b0,
                1, pos, 1, 2, 0, "StrConv", self.str_maps[pos]))
        ct = ctx.add(halves[0], halves[1])
        li += 1
        for i in range(self.num_blc[1]):
            ct = eval_conv_bn_relu(
                ctx, self.btps, ct, convs[li].ravel(), bn_a[li], bn_b[li],
                0.0, pow_, 8, self.kp_wids[1], self.ker_wid, b1, b1,
                1, 0, 1, 2, 0, "Conv", self.keep_maps[1])
            li += 1
        return ct
