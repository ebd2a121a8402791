"""Coefficient-domain multiplexed-packed convolution.

Replaces the reference's L3 conv core (SURVEY.md R5, R9-R12, R17, R18,
R22): input layout scatter (`prep_Input`, /root/reference/main.go:1007),
kernel reshaping + BN fold (`reshape_ker`/`prep_Ker`,
/root/reference/conv.go:184,487), the negacyclic kernel alignment trick
(`encode_ker_final`, /root/reference/conv.go:206 — tap (j,k) placed at
(in_wid·(k/kw)+k%kw)·B + j in reversed batch/tap order, then left-shift
by adj=(B-1)+B(in_wid+1)(kw-1)/2 with sign-flip wraparound so the
correlation result lands at position 0), the log-depth ciphertext
packing butterfly (`pack_ctxts`, /root/reference/conv.go:266), and the
fused `conv_then_pack` / `evalConv_BN` drivers
(/root/reference/conv.go:522, eval.go:224).

One homomorphic convolution over ALL channels = max_ob/norm NTT-domain
ct×pt products + a log-depth pack of Galois automorphisms — this is the
paper's headline trick and the reason coefficient encoding (not slot
encoding) is the primary packing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ckks.context import CkksContext
from ..ckks.types import Ciphertext, Plaintext


# ---------------------------------------------------------------------------
# host-side layout/kernel preparation (numpy)
# ---------------------------------------------------------------------------

def prep_input(raw: np.ndarray, raw_in_wid: int, in_wid: int, n: int,
               norm: int, trans: bool = False) -> np.ndarray:
    """Scatter a raw HWC vector into the N-coefficient layout.

    out[i·w·B + j·B + b·norm] = raw[(i,j,b)] for i,j < raw_in_wid
    (mirror of prep_Input, /root/reference/main.go:1007-1042).
    """
    out = np.zeros(n)
    batch = n // (in_wid * in_wid)
    k = 0
    if trans:
        for i in range(in_wid // 2):
            for j in range(in_wid // 2):
                for b in range(batch // norm):
                    if i < raw_in_wid and j < raw_in_wid:
                        out[(2 * i + 1) * in_wid * batch + (2 * j + 1) * batch
                            + b * norm] = raw[k]
                        k += 1
    else:
        for i in range(in_wid):
            for j in range(in_wid):
                for b in range(batch // norm):
                    if i < raw_in_wid and j < raw_in_wid:
                        out[i * in_wid * batch + j * batch + b * norm] = raw[k]
                        k += 1
    return out


def post_process(cfs: np.ndarray, raw_in_wid: int, in_wid: int) -> np.ndarray:
    """Crop the valid raw_in_wid² region (mirror of main.go:1057-1070)."""
    batch = len(cfs) // (in_wid * in_wid)
    out = np.zeros(raw_in_wid * raw_in_wid * batch)
    for i in range(raw_in_wid):
        for j in range(raw_in_wid):
            out[(i * raw_in_wid + j) * batch:(i * raw_in_wid + j) * batch + batch] = \
                cfs[(i * in_wid + j) * batch:(i * in_wid + j) * batch + batch]
    return out


def reshape_ker(ker_in: np.ndarray, k_sz: int, out_batch: int,
                trans: bool) -> np.ndarray:
    """Flat python-order kernel → [out_b, in_b·k_sz]
    (mirror of reshape_ker, /root/reference/conv.go:184-202)."""
    in_batch = len(ker_in) // (k_sz * out_batch)
    out = np.zeros((out_batch, k_sz * in_batch))
    for i in range(out_batch):
        for j in range(in_batch):
            for k in range(k_sz):
                if trans:
                    out[i][j * k_sz + (k_sz - k - 1)] = \
                        ker_in[j + i * in_batch + k * out_batch * in_batch]
                else:
                    out[i][j * k_sz + k] = \
                        ker_in[i + j * out_batch + k * out_batch * in_batch]
    return out


def encode_ker_final(ker: np.ndarray, pos: int, i: int, in_wid: int,
                     in_batch: int, ker_wid: int) -> np.ndarray:
    """Place kernel taps so the negacyclic poly-product computes the
    correlation, result aligned to position 0 (conv.go:206-237)."""
    vec_size = in_wid * in_wid * in_batch
    out = np.zeros(vec_size)
    bias = pos * ker_wid * ker_wid * in_batch
    k_sz = ker_wid * ker_wid
    for j in range(in_batch):
        for k in range(k_sz):
            out[(in_wid * (k // ker_wid) + k % ker_wid) * in_batch + j] = \
                ker[i][(in_batch - 1 - j) * k_sz + (k_sz - 1 - k) + bias]
    # negacyclic left-shift by adj with sign-flip wraparound
    adj = (in_batch - 1) + in_batch * (in_wid + 1) * (ker_wid - 1) // 2
    if adj > 0:
        tmp = out[vec_size - adj:].copy()
        head = out[:adj].copy()
        shifted = np.empty_like(out)
        shifted[: vec_size - 2 * adj] = out[adj: vec_size - adj]
        shifted[vec_size - 2 * adj: vec_size - adj] = tmp
        shifted[vec_size - adj:] = -head
        out = shifted
    return out


def prep_ker(ctx: CkksContext, ker_in: np.ndarray, bn_a: np.ndarray,
             in_wid: int, ker_wid: int, real_ib: int, real_ob: int,
             norm: int, ecd_lv: int, pos: int, trans: bool,
             in_norm: int | None = None) -> list[Plaintext]:
    """Kernel reshape + BN fold + overload to max batch + coeff-encode all
    max_bat kernel polys as NTT plaintexts (prep_Ker, conv.go:487-518).

    ``in_norm`` decouples the input channel stride from the output one
    (the reference's prep_Ker conflates them in a single ``norm``).  The
    ImageNet FC-1000 head needs it: the sparse block-2 output has
    channel c at position norm[1]·c = 2c, but 1000 logits only fit at
    output stride 1 (evalConv_BN call, /root/reference/test.go:1591 —
    which passes norm=1 and therefore misreads the stride-2 input; kept
    here as an explicit in_norm so all 512 features contribute)."""
    p = ctx.params
    max_bat = p.n // (in_wid * in_wid)
    if in_norm is None:
        in_norm = norm
    k_sz = ker_wid * ker_wid
    ker_rs = reshape_ker(ker_in, k_sz, real_ob, trans)
    ker_rs = ker_rs * np.asarray(bn_a)[:, None]
    max_ker = np.zeros((max_bat, max_bat * k_sz))
    for i in range(real_ob):
        for j in range(real_ib):
            max_ker[norm * i, in_norm * j * k_sz: in_norm * j * k_sz + k_sz] \
                = ker_rs[i, j * k_sz: j * k_sz + k_sz]
    # only every norm-th output row is populated (max_ker[norm·i]); the
    # pack consumer (conv_then_pack) reads exactly those — encoding the
    # other rows built zero polynomials (at norm=16 that was 15/16 of
    # the host encode time and ~1 GB of dead device plaintexts per conv)
    out = [None] * max_bat
    for i in range(0, max_bat, norm):
        coeffs = encode_ker_final(max_ker, pos, i, in_wid, max_bat, ker_wid)
        out[i] = ctx.encoder.encode_coeffs(coeffs, p.scale, ecd_lv)
    return out


# ---------------------------------------------------------------------------
# homomorphic packing + conv
# ---------------------------------------------------------------------------

def pack_ctxts(ctx: CkksContext, ctxts: list, max_cnum: int,
               real_cnum: int) -> Ciphertext:
    """Combine real_cnum sparse (stride-norm) ctxts into one via the
    log-depth (a−b·X^s, a+b·X^s, RotateGal 2^j+1) butterfly
    (pack_ctxts, /root/reference/conv.go:266-300)."""
    p = ctx.params
    log_n = p.log_n
    step = max_cnum // 2
    norm = max_cnum // real_cnum
    cts = list(ctxts)
    for i in range(max_cnum):
        if i % norm == 0:
            cts[i] = cts[i].with_scale(cts[i].scale * real_cnum)
    log_step = max(step.bit_length() - 1, 0)
    j = log_n - log_step
    while step >= norm and step >= 1:
        for i in range(0, step, norm):
            tmp1 = ctx.mul_monomial(cts[i + step], 1 << log_step)
            tmp2 = ctx.sub(cts[i], tmp1)
            tmp1 = ctx.add(cts[i], tmp1)
            tmp2 = ctx.apply_galois(tmp2, (1 << j) + 1)
            cts[i] = ctx.add(tmp1, tmp2)
        step //= 2
        log_step -= 1
        j += 1
    return cts[0]


def conv_then_pack(ctx: CkksContext, ct_in: Ciphertext, pl_ker: list,
                   max_ob: int, norm: int, out_scale: float,
                   bias_pt: Plaintext | None = None) -> Ciphertext:
    """One ct×pt NTT-domain product per (stride-norm) out-channel group,
    SetScale to out_scale/(max_ob/norm), then pack
    (conv_then_pack, /root/reference/conv.go:522-546).

    The whole thing — products, scale-fold+rescale to level 0, the
    log-depth butterfly with its level-0 Galois key-switches, and the
    optional BN-bias add — runs as a single jitted kernel cached per
    (max_ob, norm, scale signature)."""
    per_scale = out_scale / (max_ob // norm)
    kern = _conv_pack_kernel(ctx, max_ob, norm, ct_in.scale,
                             pl_ker[0].scale, per_scale, ct_in.level,
                             with_bias=bias_pt is not None)
    pls = jnp.stack([pl_ker[i].poly for i in range(0, max_ob, norm)])
    if bias_pt is not None:
        assert not bias_pt.is_mont and bias_pt.level == 0
        c0, c1 = kern(ct_in.c0, ct_in.c1, pls, bias_pt.poly)
    else:
        c0, c1 = kern(ct_in.c0, ct_in.c1, pls)
    out = Ciphertext(c0, c1, level=0, scale=per_scale * (max_ob // norm))
    assert abs(out.scale / out_scale - 1) < 1e-9, (out.scale, out_scale)
    return out


def _conv_pack_kernel(ctx: CkksContext, max_ob: int, norm: int,
                      scale_in: float, scale_ker: float, per_scale: float,
                      in_level: int, with_bias: bool = False):
    """Build (and cache) the fused conv_then_pack kernel."""
    key = ("convpack", max_ob, norm, round(np.log2(scale_in * scale_ker), 6),
           round(np.log2(per_scale), 6), in_level, with_bias)
    f = ctx._jit_cache.get(key)
    if f is not None:
        return f

    import jax
    from ..core import modmath as mm
    from ..core import ntt as nttmod

    p = ctx.params
    assert in_level == 1, "conv inputs live at the ECD level"
    # SetScale fold: multiply by c = round(target·q1/scale), rescale by q1
    q1 = p.q_moduli[1]
    c_int = int(round(per_scale * q1 / (scale_in * scale_ker)))
    assert c_int >= 1
    mods1 = p.q_moduli[:2]
    c_mont = mm.to_mont(
        jnp.asarray(np.array([c_int % q for q in mods1],
                             dtype=np.uint64)[:, None]),
        *ctx.params.ntt.tabs((0, 1))[:2], ctx.params.ntt.tabs((0, 1))[2])

    q01, qinv01, _, _, _, _, _ = p.ntt.tabs((0, 1))
    q0, qinv0, _, _, _, _, _ = p.ntt.tabs((0,))

    # rescale level 1 → 0 pieces
    r1_0 = p.ntt.tabs((0,))[3]
    half = jnp.uint64(q1 // 2)
    q1_mod0 = jnp.uint64(q1 % p.q_moduli[0])
    q1inv = p.qlast_inv_mont(1)
    ntt = p.ntt

    # pack butterfly structure (pack_ctxts, conv.go:266-300)
    steps = []
    step = max_ob // 2
    log_step = max(step.bit_length() - 1, 0)
    j = p.log_n - log_step
    while step >= norm and step >= 1:
        steps.append((step, log_step, j))
        step //= 2
        log_step -= 1
        j += 1
    monos = [ctx.monomial_pt(1 << ls, 0) for (_, ls, _) in steps]
    perms = [jnp.asarray(nttmod.galois_perm_ntt(p.log_n, (1 << jj) + 1))
             for (_, _, jj) in steps]
    swks = [ctx.galois_key((1 << jj) + 1, 0) for (_, _, jj) in steps]
    dec0 = ctx._build_decompose(0)
    core0 = ctx._ks_core_builder(0)

    def rescale10(c):
        t = ntt.intt(c[1:], (1,))
        red = mm.mont_mul(t, r1_0, q0, qinv0)
        red = jnp.where(t > half, mm.sub_mod(red, q1_mod0, q0), red)
        red_ntt = ntt.ntt(red, (0,))
        return mm.mont_mul(mm.sub_mod(c[:1], red_ntt, q0), q1inv, q0, qinv0)

    ks_batched = jax.vmap(lambda c, d0k, d1k: core0(dec0(c), d0k, d1k),
                          in_axes=(0, None, None))
    rescale10_b = jax.vmap(rescale10)

    def fused(c0, c1, pls, bias=None):
        # All channel products and all key-switches of one butterfly
        # stage are batched (vmap) rather than unrolled: at
        # max_ob/norm=16 the unrolled graph held 15 full key-switch
        # subgraphs and OOM-killed the XLA compile at logN=16.
        m0 = mm.mont_mul(mm.mont_mul(c0[None], pls, q01, qinv01), c_mont,
                         q01, qinv01)
        m1 = mm.mont_mul(mm.mont_mul(c1[None], pls, q01, qinv01), c_mont,
                         q01, qinv01)
        cur0 = rescale10_b(m0)          # [C, 1, N], C = max_ob // norm
        cur1 = rescale10_b(m1)
        for si, (stp, ls, jj) in enumerate(steps):
            mono = monos[si]
            perm = perms[si]
            d0k, d1k = swks[si].d0, ctx.swk_d1(swks[si])
            k = stp // norm
            a0, a1 = cur0[:k], cur1[:k]
            b0 = mm.mont_mul(cur0[k: 2 * k], mono, q0, qinv0)
            b1 = mm.mont_mul(cur1[k: 2 * k], mono, q0, qinv0)
            t10 = mm.add_mod(a0, b0, q0)
            t11 = mm.add_mod(a1, b1, q0)
            t20 = nttmod.apply_galois_ntt(mm.sub_mod(a0, b0, q0), perm)
            t21 = nttmod.apply_galois_ntt(mm.sub_mod(a1, b1, q0), perm)
            ks0, ks1 = ks_batched(t21, d0k, d1k)
            cur0 = mm.add_mod(t10, mm.add_mod(t20, ks0, q0), q0)
            cur1 = mm.add_mod(t11, ks1, q0)
        r0, r1 = cur0[0], cur1[0]
        if bias is not None:
            r0 = mm.add_mod(r0, bias, q0)
        return r0, r1

    from ..utils.exec_cache import JitProxy
    f = JitProxy(key, fused, salt=ctx._params_fp)
    ctx._jit_cache[key] = f
    return f


def eval_conv_bn(ctx: CkksContext, ct_in: Ciphertext, ker_in: np.ndarray,
                 bn_a: np.ndarray, bn_b: np.ndarray, in_wid: int, ker_wid: int,
                 real_ib: int, real_ob: int, norm: int, out_scale: float,
                 trans: bool = False, ecd_lv: int = 1,
                 in_norm: int | None = None) -> Ciphertext:
    """Conv + BN: kernel prep, conv_then_pack, add coeff-encoded bias
    (evalConv_BN, /root/reference/eval.go:224-263).  ``in_norm``: input
    channel stride when it differs from the output one (see prep_ker)."""
    p = ctx.params
    max_batch = p.n // (in_wid * in_wid)
    pl = prep_ker(ctx, ker_in, bn_a, in_wid, ker_wid, real_ib, real_ob, norm,
                  ecd_lv, 0, trans, in_norm=in_norm)
    b_coeffs = np.zeros(p.n)
    for i, b in enumerate(np.asarray(bn_b)):
        b_coeffs[norm * i::max_batch] = b
    pl_b = ctx.encoder.encode_coeffs(b_coeffs, out_scale, 0, mont=False)
    return conv_then_pack(ctx, ct_in, pl, max_batch, norm, out_scale,
                          bias_pt=pl_b)


# ---------------------------------------------------------------------------
# plaintext reference (golden oracle for tests; the role the reference's
# external python pipeline + golden CSVs play, SURVEY.md §4.1)
# ---------------------------------------------------------------------------

def conv2d_same_np(img: np.ndarray, ker: np.ndarray) -> np.ndarray:
    """img [H, W, Cin], ker [kh, kw, Cin, Cout] → [H, W, Cout]
    (cross-correlation with zero 'same' padding, python/keras semantics)."""
    h, w, cin = img.shape
    kh, kw, _, cout = ker.shape
    out = np.zeros((h, w, cout))
    ph, pw = kh // 2, kw // 2
    pad = np.zeros((h + 2 * ph, w + 2 * pw, cin))
    pad[ph: ph + h, pw: pw + w] = img
    for di in range(kh):
        for dj in range(kw):
            out += np.einsum("hwc,co->hwo", pad[di: di + h, dj: dj + w], ker[di, dj])
    return out
