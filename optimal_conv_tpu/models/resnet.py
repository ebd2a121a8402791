"""Encrypted ResNet (plain conv-BN-ReLU stack) — sparse-packed pipeline.

Replaces the reference's flagship workload ``testResNet_crop_sparse``
(/root/reference/test.go:76-370) and the model-specific parts of
``newContext`` (/root/reference/main.go:137-224): three conv blocks at
log_sparse 2/3/4 with split-kernel strided transitions at log_sparse
1/2, one bootstrap per layer, reduce-mean + FC head evaluated as one
coefficient-domain conv with an all-ones spatial kernel
(/root/reference/test.go:281-338).

Widths are parameterized so the same graph runs miniaturized in tests
(log_n 12 ⇒ 16×16 inputs) and at full CIFAR scale (log_n 16 ⇒ 32×32,
real_batch (16,32,64), norm (4,8,16)) on hardware.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..ckks.context import CkksContext
from ..ckks.bootstrap import BootstrapperFamily
from ..ckks.types import Ciphertext
from ..ops import conv as convops
from ..ops import repack as rp
from ..ops.pipeline import eval_conv_bn_relu, LayerMaps
from .plain import ResNetWeights, NUM_BLOCKS


@dataclass
class ResNetConfig:
    ker_wid: int = 3
    depth: int = 20
    cf100: bool = False
    # packing geometry; defaults = reference CIFAR shapes at logN 16.
    # wide=2: real_batch (32,64,128), wide=3: (48,96,192)
    # (/root/reference/test.go:680-693)
    in_wids: tuple = (32, 16, 8)
    real_batch: tuple = (16, 32, 64)
    wide: int = 1
    init_batch: int = 16          # first-layer width for wide models
    fc_out: int = 10
    init_pow: float = 6.0
    mid_pow: float = 6.0
    final_pow: float = 6.0
    alpha: float = 0.0

    @property
    def raw_in_wids(self) -> tuple:
        k = self.ker_wid
        return tuple(w - k // 2 for w in self.in_wids)


class ResNetRunner:
    """Builds the per-model repack tables + bootstrapper family, then runs
    encrypted inference layer by layer (one fused conv-BN-ReLU-boot per
    layer), mirroring testResNet_crop_sparse."""

    def __init__(self, ctx: CkksContext, cfg: ResNetConfig,
                 boot_kwargs: dict | None = None, debug: bool = False):
        self.ctx = ctx
        self.cfg = cfg
        self.debug = debug
        p = ctx.params
        n = p.n
        self.max_batch = [n // (w * w) for w in cfg.in_wids]
        self.norm = [mb // rb for mb, rb in zip(self.max_batch, cfg.real_batch)]
        self.log_sparse = [int(np.log2(v)) for v in self.norm]
        assert all(1 << ls == v for ls, v in zip(self.log_sparse, self.norm))

        raw = cfg.raw_in_wids
        vec = n // 2

        # keep-masks per block: sparse for ls≥1, up/low pair for full pack
        # (gen_keep_vec[_sparse], main.go:137-162 incl. wide3 branch)
        self.keep_maps = []
        for i, w in enumerate(cfg.in_wids):
            if self.log_sparse[i] == 0:
                self.keep_maps.append(LayerMaps(ext_idx=[
                    rp.gen_keep_vec(vec, w, raw[i], 0),
                    rp.gen_keep_vec(vec, w, raw[i], 1)]))
            else:
                mask = rp.gen_keep_vec_sparse(vec, w, raw[i],
                                              self.log_sparse[i])
                self.keep_maps.append(LayerMaps(ext_idx=[mask, None]))

        # strided-transition maps (gen_comprs_sparse, main.go:164-224):
        # combined stride-conv ct has log_sparse = ls_in − 1 (or 0 for the
        # wide3 StrConv_sparse_full transition); full pack needs both
        # up/low map sets
        self.str_maps = []
        self.str_ls = []
        for i in (0, 1):
            ls_comb = max(self.log_sparse[i] - 1, 0)
            m_idx, r_idx = rp.gen_comprs_sparse(vec, cfg.in_wids[i],
                                                raw[i + 1], ls_comb, 0, 0)
            maps = LayerMaps(m_idx=m_idx, r_idx=r_idx)
            if ls_comb == 0:
                maps.m_idx_l, maps.r_idx_l = rp.gen_comprs_sparse(
                    vec, cfg.in_wids[i], raw[i + 1], 0, 1, 0)
            self.str_maps.append(maps)
            self.str_ls.append(ls_comb)

        # bootstrapper family (one per log_sparse in use) — lazy with
        # bounded device residency; see BootstrapperFamily
        self.btps = BootstrapperFamily(ctx, boot_kwargs)

    # ------------------------------------------------------------------

    def encrypt_image(self, image: np.ndarray):
        """image [raw0, raw0, C] → sparse-packed level-1 ciphertext.

        Scatters only the image's own channels at stride norm (the
        reference's inline loop, /root/reference/test.go:140-148)."""
        cfg, p = self.cfg, self.ctx.params
        w0 = cfg.in_wids[0]
        mb = self.max_batch[0]
        raw0 = cfg.raw_in_wids[0]
        nch = image.shape[-1]
        inp = np.zeros(p.n)
        for b in range(nch):
            blk = np.zeros((w0, w0))
            blk[:raw0, :raw0] = image[..., b]
            inp[b * self.norm[0]::mb] = blk.ravel()
        pt = self.ctx.encoder.encode_coeffs(inp, p.scale, 1)
        return self.ctx.encrypt(pt)

    def infer(self, image: np.ndarray, w: ResNetWeights,
              timings: dict | None = None,
              ckpt_dir: str | None = None) -> np.ndarray:
        """ckpt_dir: mid-inference ciphertext checkpointing — after each
        fused layer the output ct is written to `ckpt_dir/layer.npz`
        (overwriting the previous one), and an interrupted inference
        resumes from the last completed layer on the next call.  Extends
        the reference's per-SAMPLE resumability (gap-tolerant CSVs,
        /root/reference/compare_final.py:43-45) down to per-LAYER — a
        cold logN=16 run spends hours in XLA compiles, longer than one
        driver session, so the flagship inference completes across
        sessions (the ct is saved ENCRYPTED; nothing is decrypted)."""
        ctx, cfg = self.ctx, self.cfg
        n1, n2, n3 = NUM_BLOCKS[cfg.depth]
        raw = cfg.raw_in_wids
        rb = cfg.real_batch
        ct = self.encrypt_image(image)
        li = 0
        t0 = time.perf_counter()
        tm = timings if timings is not None else {}

        resume_li = -1
        ckpt_path = None
        if ckpt_dir is not None:
            import os
            os.makedirs(ckpt_dir, exist_ok=True)
            ckpt_path = os.path.join(ckpt_dir, "layer.npz")
            if os.path.exists(ckpt_path):
                z = np.load(ckpt_path)
                resume_li = int(z["li"])
                resume_ct = Ciphertext(
                    jnp.asarray(z["c0"]), jnp.asarray(z["c1"]),
                    level=int(z["level"]), scale=float(z["scale"]))
                print(f"  resuming after layer {resume_li} "
                      f"(level {resume_ct.level})", flush=True)

        def layer(ct, li, in_idx, kind, pow_, maps, ls, real_ib, real_ob,
                  norm, n_iter=2):
            if li <= resume_li:
                return resume_ct if li == resume_li else ct
            t = time.perf_counter()
            out = eval_conv_bn_relu(
                ctx, self.btps, ct, w.convs[li].ravel(), w.bn_a[li],
                w.bn_b[li], cfg.alpha, pow_, cfg.in_wids[in_idx],
                raw[in_idx if kind != "StrConv_sparse" else in_idx + 1],
                w.convs[li].shape[0], real_ib, real_ob, norm, 0, 1, n_iter,
                ls, kind, maps)
            print(f"  layer {li} ({kind}, ls={ls}) done in "
                  f"{time.perf_counter() - t:.1f}s", flush=True)
            if ckpt_path is not None:
                np.savez(ckpt_path, c0=np.asarray(out.c0),
                         c1=np.asarray(out.c1), level=out.level,
                         scale=out.scale, li=li)
            # release the layer's intermediate device buffers NOW — at
            # logN=16 the chip runs within ~1 GB of full at layer
            # boundaries, and buffers waiting on a later GC tip the next
            # layer's first allocation into RESOURCE_EXHAUSTED
            import gc
            gc.collect()
            import os as _os
            if _os.environ.get("OPTCONV_HBM_STATS") == "1":
                # leak curve for the cross-layer HBM accumulation
                # (round-4 hbm_findings): print device stats per layer
                try:
                    import jax
                    ms = jax.devices()[0].memory_stats() or {}
                    print("    [hbm "
                          + " ".join(f"{k}={v}" for k, v in sorted(ms.items())
                                     if "bytes" in k or "size" in k)
                          + "]", flush=True)
                except Exception as e:       # backend may not support it
                    print(f"    [hbm stats unavailable: {e}]", flush=True)
            if _os.environ.get("OPTCONV_CLEAR_CACHES") == "1":
                # mitigation experiment: drop live executables (and their
                # baked-in device constants) between layers — costs a
                # re-trace/lowering per kernel on the next layer
                import jax
                jax.clear_caches()
            return out

        pow_ = cfg.init_pow
        for i in range(n1):
            real_ib = w.convs[li].shape[2]
            real_ob = w.convs[li].shape[3]
            ct = layer(ct, li, 0, "Conv_sparse", pow_, self.keep_maps[0],
                       self.log_sparse[0], real_ib, real_ob, self.norm[0])
            pow_ = cfg.mid_pow
            li += 1
        tm["blc1"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        if cfg.wide == 3:
            # full-pack transition: two StrConv_sparse_full halves on the
            # even/odd out-channels, second shifted by X^{norm[1]/4}, added
            # (/root/reference/test.go:797-818)
            ker = w.convs[li]
            c1 = eval_conv_bn_relu(
                ctx, self.btps, ct, ker[:, :, :, 0::2].ravel(),
                w.bn_a[li][0::2], w.bn_b[li][0::2], cfg.alpha, pow_,
                cfg.in_wids[0], raw[1], ker.shape[0], rb[0], rb[1] // 2,
                self.norm[0], 0, 1, 2, 0, "StrConv_sparse_full",
                self.str_maps[0])
            c2 = eval_conv_bn_relu(
                ctx, self.btps, ct, ker[:, :, :, 1::2].ravel(),
                w.bn_a[li][1::2], w.bn_b[li][1::2], cfg.alpha, pow_,
                cfg.in_wids[0], raw[1], ker.shape[0], rb[0], rb[1] // 2,
                self.norm[0], 0, 1, 2, 0, "StrConv_sparse_full",
                self.str_maps[0])
            # odd half shifted by X^norm[1] (reference hardcodes xi[2] with
            # norm[1]=2, /root/reference/test.go:812)
            ct = ctx.add(c1, ctx.mul_monomial(c2, self.norm[1]))
        else:
            ct = layer(ct, li, 0, "StrConv_sparse", pow_, self.str_maps[0],
                       self.str_ls[0], rb[0], rb[1], self.norm[1])
        li += 1
        tm["blc1to2"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        for _ in range(n2):
            ct = layer(ct, li, 1, "Conv_sparse", pow_, self.keep_maps[1],
                       self.log_sparse[1], rb[1], rb[1], self.norm[1])
            li += 1
        tm["blc2"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        ct = layer(ct, li, 1, "StrConv_sparse", pow_, self.str_maps[1],
                   self.str_ls[1], rb[1], rb[2], self.norm[2])
        li += 1
        tm["blc2to3"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        for j in range(n3):
            if j == n3 - 1:
                pow_ = cfg.final_pow
            ct = layer(ct, li, 2, "Conv_sparse", pow_, self.keep_maps[2],
                       self.log_sparse[2], rb[2], rb[2], self.norm[2])
            li += 1
        tm["blc3"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        logits = self._fc_head(ct, w)
        tm["fc"] = time.perf_counter() - t0
        if ckpt_path is not None and os.path.exists(ckpt_path):
            # inference complete — a stale layer-18 ckpt would make the
            # NEXT sample resume from this sample's activations
            os.remove(ckpt_path)
        return logits

    def _fc_head(self, ct, w: ResNetWeights) -> np.ndarray:
        """Reduce-mean + FC as one conv with replicated taps; for
        fc_out > real_batch[2] (CIFAR-100) the head splits into two
        half-width convs exactly like the reference
        (/root/reference/test.go:281-338, 291-317)."""
        cfg = self.cfg
        b3 = cfg.real_batch[2]
        fc_out = cfg.fc_out
        if fc_out <= b3:
            return self._fc_conv(ct, w.fc_w, w.fc_b)
        assert fc_out % 2 == 0 and fc_out // 2 <= b3
        lo = self._fc_conv(ct, w.fc_w[:, : fc_out // 2], w.fc_b[: fc_out // 2])
        hi = self._fc_conv(ct, w.fc_w[:, fc_out // 2:], w.fc_b[fc_out // 2:])
        return np.concatenate([lo, hi])

    def _fc_conv(self, ct, fc_w: np.ndarray, fc_b: np.ndarray) -> np.ndarray:
        from ..ckks.bootstrap import _phase_t0, _phase_mark
        ctx, cfg = self.ctx, self.cfg
        raw2 = cfg.raw_in_wids[2]
        kw = raw2 if raw2 % 2 == 1 else raw2 + 1
        b3 = cfg.real_batch[2]
        n_out = fc_w.shape[1]
        # kernel [kw, kw, b3, n_out], every tap = fc weight
        ker = np.broadcast_to(fc_w[None, None], (kw, kw, b3, n_out)).copy()
        bn_a = np.full(n_out, 1.0 / (raw2 * raw2))
        t0 = _phase_t0()
        out = convops.eval_conv_bn(ctx, ct, ker.ravel(), bn_a,
                                   np.asarray(fc_b), cfg.in_wids[2], kw, b3,
                                   n_out, self.norm[2], float(1 << 30))
        t0 = _phase_mark("fc.conv", t0, out.c0)
        cfs = ctx.decrypt_decode_coeffs(out)
        _phase_mark("fc.dec", t0)
        # logits at spatial position (kw/2+1, kw/2+1), channel stride norm
        mb = self.max_batch[2]
        ctr = (kw // 2) * cfg.in_wids[2] * mb + (kw // 2) * mb
        return cfs[ctr: ctr + self.norm[2] * n_out: self.norm[2]]


class WideFastResNetRunner:
    """The wide fast-regime drivers ``Resnet_crop_fast_wide2/3``
    (testResNet_crop_fast_wide_in, /root/reference/test.go:914-1207;
    newContext branches /root/reference/main.go:264-345).

    Geometry (reference values at logN=16 in parens):
      block 1    plain full-pack "Conv" on the in_wids[0] grid (32),
                 kp = raw[0], channels at stride norm[0]; opens
                 3→init_batch→real_batch[0] (16→32 wide2 / 16→48 wide3)
      blc1→2     "StrConv_odd" landing on the in_wids[1] grid (16) via
                 gen_comprs_fast maps with kp = 2·raw[1]; wide2 = ONE
                 conv with input-interleaved kernels at norm[0]/2,
                 wide3 = even/odd out-channel halves at pack_pos 0 and
                 2, summed (test.go:1060-1100)
      block 2    "Conv_inside" on the in_wids[1] grid, step 1,
                 keep_vec_stride(kp=raw[1]) masks, norm[1]
      blc2→3     "StrConv_inside" step 2 with input-interleaved kernels
                 (2·real_batch[1] → real_batch[2]), norm[2]
      block 3    "Conv_inside" step 2, keep_vec_stride(kp=raw[2])
      head       one (raw[1]|1)-wide replicated-tap conv on the
                 in_wids[1] grid; logits at 1-based (kw/2+1, kw/2+1)
                 stride norm[2] (prt_mat_one_norm, test.go:1195)

    norm is fixed by the wide case — wide2: (2,4,2), wide3: (1,2,1) —
    independent of real_batch (wide3 leaves max_batch−real_batch·norm
    channel slots empty, test.go:958-971)."""

    NORMS = {2: (2, 4, 2), 3: (1, 2, 1)}

    def __init__(self, ctx: CkksContext, cfg: ResNetConfig,
                 boot_kwargs: dict | None = None):
        assert cfg.wide in (2, 3), "WideFastResNetRunner needs wide 2 or 3"
        self.ctx = ctx
        self.cfg = cfg
        p = ctx.params
        n = p.n
        w0, w1 = cfg.in_wids[0], cfg.in_wids[1]
        self.max_batch = [n // (w * w) for w in (w0, w1, w1)]
        self.norm = list(self.NORMS[cfg.wide])
        rb = cfg.real_batch
        assert all(b * nm <= mb for b, nm, mb
                   in zip(rb, self.norm, self.max_batch))
        raw = cfg.raw_in_wids
        self.steps = (1, 1, 2)
        vec = n // 2

        # block 1: full-pack keep masks on the w0 grid
        self.keep_maps = [LayerMaps(ext_idx=[
            rp.gen_keep_vec(vec, w0, raw[0], 0),
            rp.gen_keep_vec(vec, w0, raw[0], 1)])]
        # blocks 2/3: stride-step keep masks on the w1 grid
        for i in (1, 2):
            odd = raw[i] % 2 == 1
            self.keep_maps.append(LayerMaps(ext_idx=[
                rp.gen_keep_vec_stride(vec, w1, raw[i], self.steps[i], 0, odd),
                rp.gen_keep_vec_stride(vec, w1, raw[i], self.steps[i], 1,
                                       odd)]))
        # blc1→2 StrConv_odd maps (pos 0; wide3 also pos 2)
        self.str_maps = {}
        for pos in (0,) if cfg.wide == 2 else (0, 2):
            m0, r0 = rp.gen_comprs_fast(vec, w0, 2 * raw[1], pos, 0)
            m1, r1 = rp.gen_comprs_fast(vec, w0, 2 * raw[1], pos, 1)
            self.str_maps[pos] = LayerMaps(m_idx=m0, r_idx=r0,
                                           m_idx_l=m1, r_idx_l=r1)
        self.btps = BootstrapperFamily(ctx, boot_kwargs)

    def encrypt_image(self, image: np.ndarray):
        cfg, p = self.cfg, self.ctx.params
        w0, mb = cfg.in_wids[0], self.max_batch[0]
        raw0 = cfg.raw_in_wids[0]
        inp = np.zeros(p.n)
        for b in range(image.shape[-1]):
            blk = np.zeros((w0, w0))
            blk[:raw0, :raw0] = image[..., b]
            inp[b * self.norm[0]::mb] = blk.ravel()
        pt = self.ctx.encoder.encode_coeffs(inp, p.scale, 1)
        return self.ctx.encrypt(pt)

    def infer(self, image: np.ndarray, w: ResNetWeights,
              timings: dict | None = None) -> np.ndarray:
        ctx, cfg = self.ctx, self.cfg
        n1, n2, n3 = NUM_BLOCKS[cfg.depth]
        raw = cfg.raw_in_wids
        rb = cfg.real_batch
        w0, w1 = cfg.in_wids[0], cfg.in_wids[1]
        interleave = FastResNetRunner._interleave_ker
        ct = self.encrypt_image(image)
        li = 0
        tm = timings if timings is not None else {}
        t0 = time.perf_counter()

        def layer(ct, li, kind, pow_, ker, bn_a, bn_b, in_wid, kp, real_ib,
                  real_ob, norm, step, maps):
            t = time.perf_counter()
            out = eval_conv_bn_relu(
                ctx, self.btps, ct, ker.ravel(), bn_a, bn_b, cfg.alpha, pow_,
                in_wid, kp, cfg.ker_wid, real_ib, real_ob, norm, 0, step, 2,
                0, kind, maps)
            print(f"  wide{cfg.wide} layer {li} ({kind}) done in "
                  f"{time.perf_counter() - t:.1f}s", flush=True)
            return out

        pow_ = cfg.init_pow
        for _ in range(n1):
            ct = layer(ct, li, "Conv", pow_, w.convs[li], w.bn_a[li],
                       w.bn_b[li], w0, raw[0], w.convs[li].shape[2],
                       w.convs[li].shape[3], self.norm[0], 1,
                       self.keep_maps[0])
            pow_ = cfg.mid_pow
            li += 1
        tm["blc1"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        ker = w.convs[li]
        if cfg.wide == 2:
            # one conv over interleaved inputs (i → 2i) at norm[0]/2
            ct = layer(ct, li, "StrConv_odd", pow_, interleave(ker),
                       w.bn_a[li], w.bn_b[li], w0, 2 * raw[1], rb[1], rb[1],
                       self.norm[0] // 2, 1, self.str_maps[0])
        else:
            # even/odd out-channel halves at pack_pos 0 / 2, summed
            c1 = layer(ct, li, "StrConv_odd", pow_, ker[:, :, :, 0::2],
                       w.bn_a[li][0::2], w.bn_b[li][0::2], w0, 2 * raw[1],
                       rb[0], rb[1] // 2, self.norm[0], 1, self.str_maps[0])
            c2 = layer(ct, li, "StrConv_odd", pow_, ker[:, :, :, 1::2],
                       w.bn_a[li][1::2], w.bn_b[li][1::2], w0, 2 * raw[1],
                       rb[0], rb[1] // 2, self.norm[0], 1, self.str_maps[2])
            ct = ctx.add(c1, c2)
        li += 1
        tm["blc1to2"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        for _ in range(n2):
            ct = layer(ct, li, "Conv_inside", pow_, w.convs[li], w.bn_a[li],
                       w.bn_b[li], w1, raw[1], rb[1], rb[1], self.norm[1], 1,
                       self.keep_maps[1])
            li += 1
        tm["blc2"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        ct = layer(ct, li, "StrConv_inside", pow_, interleave(w.convs[li]),
                   w.bn_a[li], w.bn_b[li], w1, raw[2], rb[2], rb[2],
                   self.norm[2], 2, self.keep_maps[2])
        li += 1
        tm["blc2to3"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        for j in range(n3):
            if j == n3 - 1:
                pow_ = cfg.final_pow
            ct = layer(ct, li, "Conv_inside", pow_, w.convs[li], w.bn_a[li],
                       w.bn_b[li], w1, raw[2], rb[2], rb[2], self.norm[2], 2,
                       self.keep_maps[2])
            li += 1
        tm["blc3"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        logits = self._fc_head(ct, w)
        tm["fc"] = time.perf_counter() - t0
        return logits

    def _fc_head(self, ct, w: ResNetWeights) -> np.ndarray:
        cfg = self.cfg
        b3 = cfg.real_batch[2]
        fc_out = cfg.fc_out
        if fc_out <= b3:
            return self._fc_conv(ct, w.fc_w, w.fc_b)
        assert fc_out % 2 == 0 and fc_out // 2 <= b3
        lo = self._fc_conv(ct, w.fc_w[:, : fc_out // 2], w.fc_b[: fc_out // 2])
        hi = self._fc_conv(ct, w.fc_w[:, fc_out // 2:], w.fc_b[fc_out // 2:])
        return np.concatenate([lo, hi])

    def _fc_conv(self, ct, fc_w: np.ndarray, fc_b: np.ndarray) -> np.ndarray:
        ctx, cfg = self.ctx, self.cfg
        w1 = cfg.in_wids[1]
        raw1, raw2 = cfg.raw_in_wids[1], cfg.raw_in_wids[2]
        kw = raw1 if raw1 % 2 == 1 else raw1 + 1
        b3 = cfg.real_batch[2]
        n_out = fc_w.shape[1]
        ker = np.broadcast_to(fc_w[None, None], (kw, kw, b3, n_out)).copy()
        bn_a = np.full(n_out, 1.0 / (raw2 * raw2))
        out = convops.eval_conv_bn(ctx, ct, ker.ravel(), bn_a,
                                   np.asarray(fc_b), w1, kw, b3, n_out,
                                   self.norm[2], float(1 << 30))
        cfs = ctx.decrypt_decode_coeffs(out)
        mb = self.max_batch[1]
        ctr = (kw // 2) * w1 * mb + (kw // 2) * mb
        return cfs[ctr: ctr + self.norm[2] * n_out: self.norm[2]]


class FastResNetRunner:
    """The "crop_fast" packing regime (testResNet_crop_fast_in,
    /root/reference/test.go:372-636): every layer stays on the
    in_wids[0] grid at log_sparse=0; strided transitions double the
    dilation step (1 → 2 → 4) via StrConv_inside with interleaved
    kernels, and the repack is a keep_vec_stride mask per (step, ul)
    (newContext "Resnet_crop_fast", /root/reference/main.go:123-137).
    The FC head is one in-grid conv with replicated taps; logits live at
    grid position (kw/2+1, kw/2+1) stride norm[2]
    (/root/reference/test.go:556-636)."""

    def __init__(self, ctx: CkksContext, cfg: ResNetConfig,
                 boot_kwargs: dict | None = None):
        self.ctx = ctx
        self.cfg = cfg
        p = ctx.params
        n = p.n
        w0 = cfg.in_wids[0]
        self.w0 = w0
        self.max_batch = n // (w0 * w0)
        self.norm = [self.max_batch // rb for rb in cfg.real_batch]
        self.steps = (1, 2, 4)
        raw = cfg.raw_in_wids
        vec = n // 2
        self.keep_maps = []
        for i in range(3):
            step = self.steps[i]
            odd = raw[i] % 2 == 1
            self.keep_maps.append(LayerMaps(ext_idx=[
                rp.gen_keep_vec_stride(vec, w0, raw[i], step, 0, odd),
                rp.gen_keep_vec_stride(vec, w0, raw[i], step, 1, odd)]))
        self.btps = BootstrapperFamily(ctx, boot_kwargs)

    def encrypt_image(self, image: np.ndarray):
        cfg, p = self.cfg, self.ctx.params
        w0, mb = self.w0, self.max_batch
        raw0 = cfg.raw_in_wids[0]
        nch = image.shape[-1]
        inp = np.zeros(p.n)
        for b in range(nch):
            blk = np.zeros((w0, w0))
            blk[:raw0, :raw0] = image[..., b]
            inp[b * self.norm[0]::mb] = blk.ravel()
        pt = self.ctx.encoder.encode_coeffs(inp, p.scale, 1)
        return self.ctx.encrypt(pt)

    @staticmethod
    def _interleave_ker(ker: np.ndarray) -> np.ndarray:
        """[kw, kw, ib, ob] → [kw, kw, 2·ib, ob] with the real input
        channels at even slots (the transitions' doubled-batch layout,
        /root/reference/test.go:485-493)."""
        kw, _, ib, ob = ker.shape
        out = np.zeros((kw, kw, 2 * ib, ob))
        out[:, :, 0::2] = ker
        return out

    def infer(self, image: np.ndarray, w: ResNetWeights,
              timings: dict | None = None) -> np.ndarray:
        ctx, cfg = self.ctx, self.cfg
        n1, n2, n3 = NUM_BLOCKS[cfg.depth]
        raw = cfg.raw_in_wids
        rb = cfg.real_batch
        w0 = self.w0
        ct = self.encrypt_image(image)
        li = 0
        tm = timings if timings is not None else {}
        t0 = time.perf_counter()

        def layer(ct, li, kind, pow_, blk, ker, real_ib, real_ob, norm):
            t = time.perf_counter()
            step = self.steps[blk]
            out = eval_conv_bn_relu(
                ctx, self.btps, ct, ker.ravel(), w.bn_a[li], w.bn_b[li],
                cfg.alpha, pow_, w0, raw[blk], cfg.ker_wid, real_ib,
                real_ob, norm, 0, step, 2, 0, kind, self.keep_maps[blk])
            print(f"  fast layer {li} ({kind}, step={step}) done in "
                  f"{time.perf_counter() - t:.1f}s", flush=True)
            return out

        pow_ = cfg.init_pow
        for _ in range(n1):
            ct = layer(ct, li, "Conv_inside", pow_, 0, w.convs[li],
                       w.convs[li].shape[2], rb[0], self.norm[0])
            pow_ = cfg.mid_pow
            li += 1
        tm["blc1"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        ct = layer(ct, li, "StrConv_inside", pow_, 1,
                   self._interleave_ker(w.convs[li]), rb[1], rb[1],
                   self.norm[1])
        li += 1
        tm["blc1to2"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        for _ in range(n2):
            ct = layer(ct, li, "Conv_inside", pow_, 1, w.convs[li],
                       rb[1], rb[1], self.norm[1])
            li += 1
        tm["blc2"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        ct = layer(ct, li, "StrConv_inside", pow_, 2,
                   self._interleave_ker(w.convs[li]), rb[2], rb[2],
                   self.norm[2])
        li += 1
        tm["blc2to3"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        for j in range(n3):
            if j == n3 - 1:
                pow_ = cfg.final_pow
            ct = layer(ct, li, "Conv_inside", pow_, 2, w.convs[li],
                       rb[2], rb[2], self.norm[2])
            li += 1
        tm["blc3"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        logits = self._fc_head(ct, w)
        tm["fc"] = time.perf_counter() - t0
        return logits

    def _fc_head(self, ct, w: ResNetWeights) -> np.ndarray:
        cfg = self.cfg
        b3 = cfg.real_batch[2]
        fc_out = cfg.fc_out
        if fc_out <= b3:
            return self._fc_conv(ct, w.fc_w, w.fc_b)
        assert fc_out % 2 == 0 and fc_out // 2 <= b3
        lo = self._fc_conv(ct, w.fc_w[:, : fc_out // 2], w.fc_b[: fc_out // 2])
        hi = self._fc_conv(ct, w.fc_w[:, fc_out // 2:], w.fc_b[fc_out // 2:])
        return np.concatenate([lo, hi])

    def _fc_conv(self, ct, fc_w: np.ndarray, fc_b: np.ndarray) -> np.ndarray:
        ctx, cfg = self.ctx, self.cfg
        raw0, raw2 = cfg.raw_in_wids[0], cfg.raw_in_wids[2]
        kw = raw0 if raw0 % 2 == 1 else raw0 + 1
        b3 = cfg.real_batch[2]
        n_out = fc_w.shape[1]
        ker = np.broadcast_to(fc_w[None, None], (kw, kw, b3, n_out)).copy()
        bn_a = np.full(n_out, 1.0 / (raw2 * raw2))
        out = convops.eval_conv_bn(ctx, ct, ker.ravel(), bn_a,
                                   np.asarray(fc_b), self.w0, kw, b3,
                                   n_out, self.norm[2], float(1 << 30))
        cfs = ctx.decrypt_decode_coeffs(out)
        mb = self.max_batch
        # logits at grid position (kw/2+1, kw/2+1) in the reference's
        # 1-BASED prt_mat_one_norm indexing (/root/reference/main.go:920)
        # = 0-based (kw//2, kw//2): the all-ones window centered there
        # covers exactly the phase-0 step-grid features {0, s, 2s, ...}
        ctr = (kw // 2) * self.w0 * mb + (kw // 2) * mb
        return cfs[ctr: ctr + self.norm[2] * n_out: self.norm[2]]
