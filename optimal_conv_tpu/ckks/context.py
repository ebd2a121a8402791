"""CKKS scheme context: keys + evaluator.

Replaces the fork's ``rlwe/{keygen,keys,keyswitch,encryptor,decryptor}.go``
and ``ckks/evaluator.go`` (SURVEY.md C4–C8, C11, C13): sparse-ternary
keygen, symmetric encryption, hybrid RNS key-switching with special
primes P, Galois rotations (plus hoisted multi-rotation), relinearization,
rescaling, and the Lattigo scale-management semantics the reference
depends on (SetScale / MulByPow2 / AddConst / DropLevel — see
/root/reference/conv.go:473-528).

Design notes (TPU-first):
* All polynomials are [l+1, N] uint64, NTT(bit-rev) domain, standard
  form; level ℓ ciphertexts carry exactly ℓ+1 limbs → static shapes.
* Switching keys are generated *at the level where they are used*
  (cache key (tag, level)); the reference instead materializes every key
  at full level, which is where its ~100 GB footprint comes from
  (/root/reference/README.md:67).
* Key-switch inner product and NTTs are the hot path; they are pure
  jnp on purpose — XLA fuses the elementwise chains; Pallas variants
  can swap in underneath without changing this layer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import modmath as mm
from ..core import ntt as nttmod
from .params import CkksParams
from .types import Ciphertext, Plaintext
from .encoding import Encoder


@dataclass
class SwitchingKey:
    d0: jnp.ndarray          # [beta, l+1+P, N]  NTT + Montgomery
    d1: jnp.ndarray | None   # None when seed-compressed (public uniform
    level: int               # half regenerated on demand from `seed`)
    seed: int | None = None
    # memoized expansion of the compressed half: regenerating d1 per
    # keyswitch costs ~as much as the keyswitch itself, so hot keys keep
    # it materialized; the LRU cache drops it first under memory pressure
    d1_cache: jnp.ndarray | None = None
    # pre-permuted key (the hoisted-rotation fast path): d0/d1 carry
    # φ_g^{-1} applied in the NTT domain; `perm` is that inverse
    # permutation, re-applied when d1 regenerates from the seed
    perm: jnp.ndarray | None = None


class _KeyCache:
    """LRU switching-key cache with a device-memory budget.

    High-level keys at logN=16 are ~100-400 MB each (beta·(l+1+P)·N·8·2
    bytes); a full bootstrapping rotation set exceeds the 16 GB HBM of
    one v5e chip (the Go reference instead keeps ~100 GB of keys
    resident in host RAM — /root/reference/README.md:67).  Keys here
    are (re)generatable from a deterministic per-key seed, so eviction
    is transparent: a miss regenerates the identical key.
    """

    def __init__(self, max_bytes: int, expand_bytes: int | None = None,
                 policy: str | None = None):
        from collections import OrderedDict
        import os
        # two tiers: `max_bytes` bounds the RESIDENT halves (d0 + any
        # stored d1 of uncompressed keys); `expand_bytes` separately
        # bounds the d1_cache memos of compressed keys.  The memos are
        # pure re-derivable data, but regenerating one is a ~0.1 s fused
        # kernel — a single budget made key eviction pressure drop every
        # memo, and CtoS paid the regen on nearly every rotation.
        self.max_bytes = max_bytes
        self.expand_bytes = max_bytes if expand_bytes is None else expand_bytes
        self.d = OrderedDict()
        self.d0_bytes = 0
        self.d1_bytes = 0
        # eviction policy: a fused layer touches its key set CYCLICALLY
        # (CtoS stages → relu → repack → StoC, repeated every layer);
        # when the working set exceeds the budget, LRU evicts every key
        # right before its next use (0% hit — the flagship's measured
        # 4-6 s/stage "churn" regime, BENCH_DETAIL bsgs_stride_fix).
        # "mru" evicts the most-recently-used entry instead, which under
        # a cyclic scan pins the first ~budget's-worth of keys resident
        # (hit rate (C-1)/W instead of 0).  Every 8th eviction still
        # takes the LRU end so a pinned-but-stale set (e.g. after a
        # log_sparse family switch changes the key tags) drains instead
        # of starving the new working set forever.
        if policy is None:
            policy = os.environ.get("OPTCONV_KEY_EVICT", "mru")
        self.evict_mru = policy == "mru"
        self._evict_n = 0

    @property
    def nbytes(self) -> int:
        return self.d0_bytes + self.d1_bytes

    @staticmethod
    def _size0(swk: SwitchingKey) -> int:
        b = swk.d0.size * 8
        if swk.d1 is not None:
            b *= 2
        return b

    def get(self, key):
        got = self.d.get(key)
        if got is not None:
            self.d.move_to_end(key)
        return got

    def put(self, key, swk: SwitchingKey):
        self.d[key] = swk
        self.d0_bytes += self._size0(swk)
        if swk.d1_cache is not None:
            self.d1_bytes += swk.d0.size * 8
        self._trim()

    def note_expand(self, swk: SwitchingKey):
        """A compressed key materialized its d1_cache — charge the budget."""
        self.d1_bytes += swk.d0.size * 8
        self._trim()

    def _trim(self):
        # memo tier: drop coldest d1_cache first.  NEVER touch the
        # most-recent entry — it may be the key being expanded right now
        # (its caller holds no other reference).
        if self.d1_bytes > self.expand_bytes:
            vals = list(self.d.values())
            for swk in vals[:-1]:
                if self.d1_bytes <= self.expand_bytes:
                    break
                if swk.d1 is None and swk.d1_cache is not None:
                    swk.d1_cache = None
                    self.d1_bytes -= swk.d0.size * 8
        # resident tier: evict whole keys.  mru: drop the SECOND-most-
        # recent entry (the most recent is the key just inserted/fetched
        # — its caller may hold no other reference); lru: drop coldest.
        while self.d0_bytes > self.max_bytes and len(self.d) > 1:
            self._evict_n += 1
            if self.evict_mru and (self._evict_n % 8 or len(self.d) == 2):
                it = reversed(self.d)
                next(it)
                k = next(it)
                old = self.d.pop(k)
            else:
                _, old = self.d.popitem(last=False)
            self.d0_bytes -= self._size0(old)
            if old.d1_cache is not None:
                self.d1_bytes -= old.d0.size * 8


class CkksContext:
    def __init__(self, params: CkksParams, seed: int = 0):
        self.params = params
        self.encoder = Encoder(params)
        self.rng = np.random.default_rng(seed)
        p = params

        # ---- secret key: sparse ternary, h nonzeros ---------------------
        n = p.n
        s = np.zeros(n, dtype=np.int64)
        support = self.rng.choice(n, size=p.h, replace=False)
        signs = self.rng.integers(0, 2, size=p.h) * 2 - 1
        s[support] = signs
        self._sk_ints = s
        all_idx = tuple(range(len(p.moduli)))
        sk_res = mm.centered_to_residues(s, p.moduli)
        self.sk_ntt = p.ntt.ntt(jnp.asarray(sk_res), all_idx)     # [LQP, N]

        # s^2 (for relinearization): pointwise square in the NTT domain —
        # exact, the negacyclic ring product is the NTT pointwise product
        q, qinv, r2, _, _, _, _ = p.ntt.tabs(all_idx)
        self.sk2_ntt = mm.mul_mod(self.sk_ntt, self.sk_ntt, q, qinv, r2)

        import os
        self._seed = seed
        # seed-compressed keys (store d0 + seed, regenerate the uniform
        # d1 on use) default ON at logN ≥ 14 where key residency binds.
        comp = os.environ.get("OPTCONV_COMPRESS_KEYS", "auto")
        self._compress_keys = (p.log_n >= 14 if comp == "auto"
                               else comp not in ("0", "off", "false"))
        budget_gb = float(os.environ.get("OPTCONV_KEY_CACHE_GB", "8"))
        expand_gb = float(os.environ.get("OPTCONV_KEY_EXPAND_GB",
                                         str(min(budget_gb, 3.0))))
        self._swk_cache = _KeyCache(int(budget_gb * (1 << 30)),
                                    int(expand_gb * (1 << 30)))
        self._jit_cache: dict = {}
        self._pt_cache: dict = {}
        # exec-cache salt: kernels bake the moduli tables in as
        # constants — and the conv-pack kernel even bakes its Galois
        # switching keys (secret-key-derived) — so the serialized-
        # executable digest must carry the full chain identity AND the
        # context seed (utils/exec_cache.JitProxy)
        self._params_fp = repr((p.log_n, tuple(p.moduli), p.log_scale,
                                p.h, p.num_p, seed))

    def _key_seed(self, tag) -> int:
        """Deterministic per-key seed: eviction + regeneration yields the
        bit-identical key."""
        import hashlib
        h = hashlib.sha256(repr((self._seed, tag)).encode()).digest()
        return int.from_bytes(h[:8], "little")

    def _jitted(self, key, builder, donate_argnums=()):
        """Per-(name, level) compiled kernels; tables are captured as
        constants at trace time, key data (swk digits, permutations)
        stay runtime args so one compilation serves every key.

        Backed by the serialized-executable disk cache (utils/
        exec_cache): on the TPU platform a process restart deserializes
        the compiled kernel in ~60 ms instead of re-tracing + re-lowering
        it (30-100 s per logN=16 kernel — the flagship legs' measured
        ~1700-2400 s first-layer tax)."""
        f = self._jit_cache.get(key)
        if f is None:
            from ..utils.exec_cache import JitProxy
            f = JitProxy(key, builder(), donate_argnums=donate_argnums,
                         salt=self._params_fp)
            self._jit_cache[key] = f
        return f

    # ------------------------------------------------------------------
    # sampling helpers
    # ------------------------------------------------------------------

    def _gauss_ints(self) -> np.ndarray:
        return np.round(self.rng.normal(0.0, self.params.sigma, self.params.n)
                        ).astype(np.int64)

    def _uniform_poly(self, idx: tuple[int, ...]) -> jnp.ndarray:
        """Uniform element of the RNS ring on limbs idx (NTT domain)."""
        p = self.params
        rows = [self.rng.integers(0, p.moduli[i], size=p.n, dtype=np.uint64)
                for i in idx]
        return jnp.asarray(np.stack(rows))

    # ------------------------------------------------------------------
    # encryption / decryption (symmetric; reference uses sk-encryption)
    # ------------------------------------------------------------------

    def encrypt(self, pt: Plaintext) -> Ciphertext:
        p = self.params
        level = pt.level
        idx = p.q_idx(level)
        q, qinv, r2, _, _, _, _ = p.ntt.tabs(idx)
        c1 = self._uniform_poly(idx)
        e = mm.centered_to_residues(self._gauss_ints(), p.q_moduli[: level + 1])
        e_ntt = p.ntt.ntt(jnp.asarray(e), idx)
        sk = self.sk_ntt[np.asarray(idx)]
        m = pt.poly
        if pt.is_mont:
            m = mm.from_mont(m, q, qinv)
        c1s = mm.mul_mod(c1, sk, q, qinv, r2)
        c0 = mm.add_mod(mm.sub_mod(e_ntt, c1s, q), m, q)
        return Ciphertext(c0, c1, level=level, scale=pt.scale)

    def decrypt_to_coeffs(self, ct: Ciphertext) -> np.ndarray:
        """→ [l+1, N] coefficient-domain residues of m + noise."""
        p = self.params
        idx = p.q_idx(ct.level)
        q, qinv, r2, _, _, _, _ = p.ntt.tabs(idx)
        sk = self.sk_ntt[np.asarray(idx)]
        m = mm.add_mod(ct.c0, mm.mul_mod(ct.c1, sk, q, qinv, r2), q)
        return np.asarray(p.ntt.intt(m, idx))

    def decrypt_decode_coeffs(self, ct: Ciphertext) -> np.ndarray:
        return self.encoder.decode_coeffs(self.decrypt_to_coeffs(ct), ct.scale)

    def decrypt_decode_slots(self, ct: Ciphertext, log_slots=None) -> np.ndarray:
        return self.encoder.decode_slots(self.decrypt_to_coeffs(ct), ct.scale,
                                         log_slots)

    # ------------------------------------------------------------------
    # switching keys
    # ------------------------------------------------------------------

    def _uniform_mont_jax(self, seed: int, beta: int,
                          qp: tuple[int, ...]) -> jnp.ndarray:
        """Deterministic uniform [beta, |qp|, N] residues from `seed`,
        interpreted directly as the Montgomery form of the public key
        half a (uniform ↔ uniform).  128 bits per residue → modulo bias
        ≤ 2^-67."""
        import jax
        p = self.params
        q, qinv, r2, r1, _, _, _ = p.ntt.tabs(qp)
        kk = jax.random.PRNGKey(seed & 0xFFFFFFFF)
        bits = jax.random.bits(kk, (4, beta, len(qp), p.n), dtype=jnp.uint32)
        b64 = bits.astype(jnp.uint64)
        hi = (b64[0] << jnp.uint64(32)) | b64[1]
        lo = (b64[2] << jnp.uint64(32)) | b64[3]
        # (hi·2^64 + lo) mod q  =  hi·r2·2^-64 + lo·r1·2^-64  (mod q)
        return mm.add_mod(mm.mont_mul(hi, r2, q, qinv),
                          mm.mont_mul(lo, r1, q, qinv), q)

    def _d1_regen_builder(self, beta: int, qp: tuple[int, ...],
                          with_perm: bool):
        """Fused d1 regeneration: the _uniform_mont_jax math (+ the
        pre-permuted "galh" keys' galois permutation) as one kernel."""
        p = self.params
        q, qinv, r2, r1, _, _, _ = p.ntt.tabs(qp)
        n = p.n
        nqp = len(qp)

        def f(kk, perm=None):
            bits = jax.random.bits(kk, (4, beta, nqp, n), dtype=jnp.uint32)
            b64 = bits.astype(jnp.uint64)
            hi = (b64[0] << jnp.uint64(32)) | b64[1]
            lo = (b64[2] << jnp.uint64(32)) | b64[3]
            d1 = mm.add_mod(mm.mont_mul(hi, r2, q, qinv),
                            mm.mont_mul(lo, r1, q, qinv), q)
            if with_perm:
                d1 = nttmod.apply_galois_ntt(d1, perm)
            return d1

        return f

    def gen_switching_key(self, s_from_ntt: jnp.ndarray, level: int,
                          seed: int | None = None) -> SwitchingKey:
        """Key switching s_from → s, generated at `level` (hybrid, P primes).

        d0_d = -a_d·s + e_d + P·w_d·s_from  (w_d = CRT indicator of digit
        d), stored NTT+Montgomery.  All beta digits are generated in ONE
        batched pass; with a seed, generation is fully deterministic
        (d1 = a is then regeneratable and not stored when
        `_compress_keys` is on)."""
        p = self.params
        qp = p.qp_idx(level)
        q, qinv, r2, _, _, _, _ = p.ntt.tabs(qp)
        digits = p.digits(level)
        beta = len(digits)
        if seed is None:
            seed = int(self.rng.integers(0, 1 << 62))
        a_mont = self._uniform_mont_jax(seed, beta, qp)
        # error noise ON DEVICE: the host-side path built [β, L, N]
        # residues (~100 MB) in numpy and uploaded them through the
        # ~40 MB/s tunnel — ~2.5 s per key, the dominant keygen cost at
        # logN=16.  jax PRNG (threefry) is deterministic per seed, so
        # eviction-regeneration still reproduces d0 bit-identically.
        ek = jax.random.PRNGKey((seed ^ 0x9E3779B97F4A7C15)
                                & ((1 << 63) - 1))
        e_i = jnp.round(jax.random.normal(ek, (beta, p.n),
                                          dtype=jnp.float32) * p.sigma
                        ).astype(jnp.int64)
        pos = e_i.astype(jnp.uint64)[:, None, :]
        neg = (-e_i).astype(jnp.uint64)[:, None, :]
        e_res = jnp.where(e_i[:, None, :] >= 0, pos, q[None] - neg)
        e_ntt = p.ntt.ntt(e_res, qp)
        sk = self.sk_ntt[np.asarray(qp)]
        a_s = mm.mont_mul(a_mont, sk, q, qinv)            # a·s (standard)
        # P·w_d·s_from: Montgomery-form P on the digit's Q-limb rows
        pw = np.zeros((beta, len(qp), 1), dtype=np.uint64)
        for d, digit in enumerate(digits):
            for i in digit:
                pw[d, qp.index(i), 0] = (p.big_p % p.moduli[i]) \
                    * ((1 << 64) % p.moduli[i]) % p.moduli[i]
        ps = mm.mont_mul(s_from_ntt[np.asarray(qp)][None], jnp.asarray(pw),
                         q, qinv)
        b = mm.add_mod(mm.sub_mod(e_ntt, a_s, q), ps, q)
        d0 = mm.to_mont(b, q, qinv, r2)
        if self._compress_keys:
            return SwitchingKey(d0, None, level, seed=seed)
        return SwitchingKey(d0, a_mont, level, seed=seed)

    def swk_d1(self, swk: SwitchingKey) -> jnp.ndarray:
        """Materialize the public uniform half (regenerates if compressed;
        memoized on the key — the LRU cache may drop the memo under
        memory pressure and it regenerates bit-identically)."""
        if swk.d1 is not None:
            return swk.d1
        if swk.d1_cache is None:
            beta = swk.d0.shape[0]
            # ensure_compile_time_eval: this may run inside a jit trace
            # (fused kernels close over keys); the memo must hold a
            # concrete array, never a tracer.  The regeneration itself is
            # ONE fused kernel (RNG + Montgomery folds + optional galois
            # permutation) — the eager chain cost ~0.2-0.9 s per key and
            # dominated CtoS whenever LRU pressure dropped d1 caches.
            qp = self.params.qp_idx(swk.level)
            with jax.ensure_compile_time_eval():
                fn = self._jitted(
                    ("d1regen", beta, qp, swk.perm is not None),
                    lambda: self._d1_regen_builder(beta, qp,
                                                   swk.perm is not None))
                kk = jax.random.PRNGKey(swk.seed & 0xFFFFFFFF)
                d1 = fn(kk, swk.perm) if swk.perm is not None else fn(kk)
                swk.d1_cache = d1
            self._swk_cache.note_expand(swk)
            # return the LOCAL reference: under extreme memory pressure
            # _trim may immediately re-compress this key (d1_cache→None)
            return d1
        return swk.d1_cache

    def relin_key(self, level: int) -> SwitchingKey:
        key = ("rlk", level)
        swk = self._swk_cache.get(key)
        if swk is None:
            swk = self.gen_switching_key(self.sk2_ntt, level,
                                         seed=self._key_seed(key))
            self._swk_cache.put(key, swk)
        return swk

    def galois_key(self, g: int, level: int) -> SwitchingKey:
        p = self.params
        g = g % (2 * p.n)
        key = ("gal", g, level)
        swk = self._swk_cache.get(key)
        if swk is None:
            src, flip = nttmod.galois_perm_coeff(p.log_n, g)
            # φ_g(s) in NTT form on all limbs
            all_idx = tuple(range(len(p.moduli)))
            s_coeff = p.ntt.intt(self.sk_ntt, all_idx)
            qall = p.ntt.q
            s_g = nttmod.apply_galois_coeff(
                s_coeff, jnp.asarray(src), jnp.asarray(flip), qall)
            s_g_ntt = p.ntt.ntt(s_g, all_idx)
            swk = self.gen_switching_key(s_g_ntt, level,
                                         seed=self._key_seed(key))
            self._swk_cache.put(key, swk)
        return swk

    def rot_key(self, k: int, level: int) -> SwitchingKey:
        return self.galois_key(nttmod.rot_to_galois(k, self.params.log_n), level)

    def galois_key_hoisted(self, g: int, level: int) -> SwitchingKey:
        """φ_g's switching key PRE-PERMUTED by φ_g^{-1} in the NTT domain.

        Exact pointwise identity: φ(d)·k = φ(d · φ^{-1}(k)).  The hoisted
        inner product then reads the SHARED unpermuted digit tensor and
        only the [2, l+1+P, N] accumulator pair is permuted per rotation
        — ~β× less gather traffic than permuting the digits
        (PLAN_R2 §7; reference RotateHoisted, /root/reference/conv.go:133).
        """
        p = self.params
        g = g % (2 * p.n)
        key = ("galh", g, level)
        swk = self._swk_cache.get(key)
        if swk is None:
            base = self.galois_key(g, level)
            g_inv = pow(g, -1, 2 * p.n)
            perm_inv = jnp.asarray(nttmod.galois_perm_ntt(p.log_n, g_inv))
            d0p = nttmod.apply_galois_ntt(base.d0, perm_inv)
            d1p = None if base.d1 is None \
                else nttmod.apply_galois_ntt(base.d1, perm_inv)
            swk = SwitchingKey(d0p, d1p, level, seed=base.seed,
                               perm=perm_inv)
            self._swk_cache.put(key, swk)
        return swk

    # ------------------------------------------------------------------
    # key switching core
    # ------------------------------------------------------------------

    def _build_decompose(self, level: int):
        """[l+1, N] NTT → [beta, l+1+P, N] coeff-domain decomposed digits.

        Uses the batched DigitExtender: ONE vectorized extension chain
        for all beta digits (graph size independent of beta — the
        per-digit unroll was the dominant XLA compile cost per level)."""
        p = self.params
        idx = p.q_idx(level)
        ext = p.digit_extender(level)
        ntt = p.ntt

        def f(c1):
            c1c = ntt.intt(c1, idx)
            return ext.extend_digits(c1c)

        return f

    def _mod_down_builder(self, level: int):
        """[l+1+P, N] QP accumulator → [l+1, N] on Q_level (÷P, rounded)."""
        p = self.params
        idx = p.q_idx(level)
        nq = level + 1
        qq, qqinv, _, _, _, _, _ = p.ntt.tabs(idx)
        pidx = p.p_idx()
        ext_p = p.extender(pidx, idx)
        pinv = p.p_inv_mont(level)
        ntt = p.ntt

        def mod_down(acc):
            acc_p = ntt.intt(acc[nq:], pidx)
            ext = ext_p.extend(acc_p)
            diff = mm.sub_mod(acc[:nq], ntt.ntt(ext, idx), qq)
            return mm.mont_mul(diff, pinv, qq, qqinv)

        return mod_down

    def _ks_core_builder(self, level: int, input_ntt: bool = False,
                         lazy: bool = False):
        """digits [beta, l+1+P, N] × key → (ks0, ks1) on Q_level.

        input_ntt=False: digits arrive coefficient-domain (the plain
        keyswitch path) and are NTT'd here.  input_ntt=True: digits are
        already NTT-domain (the hoisted-rotation path, where the beta
        digit NTTs are paid ONCE per ciphertext, not once per rotation —
        reference RotateHoisted semantics, /root/reference/conv.go:133).
        lazy=True: skip the final mod-down and return the [l+1+P, N]
        QP-basis accumulators — callers summing several keyswitch
        results (BSGS giant steps) divide by P ONCE at the end."""
        p = self.params
        qp = p.qp_idx(level)
        q, qinv, _, _, _, _, _ = p.ntt.tabs(qp)
        ntt = p.ntt
        mod_down = None if lazy else self._mod_down_builder(level)

        def core(ext_in, d0, d1):
            ext_ntt = ext_in if input_ntt else ntt.ntt(ext_in, qp)
            t0 = mm.mont_mul(ext_ntt, d0, q, qinv)
            t1 = mm.mont_mul(ext_ntt, d1, q, qinv)
            acc0, acc1 = t0[0], t1[0]
            for d in range(1, d0.shape[0]):
                acc0 = mm.add_mod(acc0, t0[d], q)
                acc1 = mm.add_mod(acc1, t1[d], q)
            if lazy:
                return acc0, acc1
            return mod_down(acc0), mod_down(acc1)

        return core

    def _ks_f(self, level: int):
        dec = self._build_decompose(level)
        core = self._ks_core_builder(level)

        def f(c1, d0, d1):
            return core(dec(c1), d0, d1)

        return f

    def keyswitch(self, c1: jnp.ndarray, level: int, swk: SwitchingKey):
        assert swk.level == level
        return self._jitted(("ks", level),
                            lambda: self._ks_f(level))(c1, swk.d0,
                                                       self.swk_d1(swk))

    # ------------------------------------------------------------------
    # evaluator: arithmetic
    # ------------------------------------------------------------------

    def _qtabs(self, level: int):
        return self.params.ntt.tabs(self.params.q_idx(level))

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.level == b.level, (a.level, b.level)
        assert abs(a.scale / b.scale - 1) < 1e-9, (a.scale, b.scale)
        q = self._qtabs(a.level)[0]
        return Ciphertext(mm.add_mod(a.c0, b.c0, q), mm.add_mod(a.c1, b.c1, q),
                          level=a.level, scale=a.scale)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.level == b.level and abs(a.scale / b.scale - 1) < 1e-9
        q = self._qtabs(a.level)[0]
        return Ciphertext(mm.sub_mod(a.c0, b.c0, q), mm.sub_mod(a.c1, b.c1, q),
                          level=a.level, scale=a.scale)

    def neg(self, a: Ciphertext) -> Ciphertext:
        q = self._qtabs(a.level)[0]
        return Ciphertext(mm.neg_mod(a.c0, q), mm.neg_mod(a.c1, q),
                          level=a.level, scale=a.scale)

    def add_plain(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        """pt must be NTT + standard form (is_mont=False) at same level/scale."""
        assert not pt.is_mont and pt.level == a.level
        assert abs(a.scale / pt.scale - 1) < 1e-9, (a.scale, pt.scale)
        q = self._qtabs(a.level)[0]
        return Ciphertext(mm.add_mod(a.c0, pt.poly, q), a.c1,
                          level=a.level, scale=a.scale)

    def add_const(self, a: Ciphertext, const: float) -> Ciphertext:
        """AddConstNew: add a scalar at the ciphertext's own scale."""
        p = self.params
        mods = p.q_moduli[: a.level + 1]
        c = int(round(const * a.scale))
        vals = np.array([c % q for q in mods], dtype=np.uint64)[:, None]
        q = self._qtabs(a.level)[0]
        return Ciphertext(mm.add_mod(a.c0, jnp.asarray(vals), q), a.c1,
                          level=a.level, scale=a.scale)

    def mul_plain(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        """ct × pt (pt NTT+Montgomery).  Scale multiplies; no rescale."""
        assert pt.is_mont and pt.level == a.level, (pt.level, a.level)
        q, qinv, _, _, _, _, _ = self._qtabs(a.level)
        return Ciphertext(mm.mont_mul(a.c0, pt.poly, q, qinv),
                          mm.mont_mul(a.c1, pt.poly, q, qinv),
                          level=a.level, scale=a.scale * pt.scale)

    def mul_scalar_int(self, a: Ciphertext, c: int) -> Ciphertext:
        """Multiply values by an exact integer (scale unchanged) — MulByPow2."""
        p = self.params
        key = ("scl", c, a.level)
        cm = self._pt_cache.get(key)
        if cm is None:
            mods = p.q_moduli[: a.level + 1]
            vals = np.array([c % q for q in mods], dtype=np.uint64)[:, None]
            q, qinv, r2, _, _, _, _ = self._qtabs(a.level)
            cm = mm.to_mont(jnp.asarray(vals), q, qinv, r2)
            self._pt_cache[key] = cm
        q, qinv, _, _, _, _, _ = self._qtabs(a.level)
        return Ciphertext(mm.mont_mul(a.c0, cm, q, qinv),
                          mm.mont_mul(a.c1, cm, q, qinv),
                          level=a.level, scale=a.scale)

    def mul_const(self, a: Ciphertext, const: float, const_scale: float) -> Ciphertext:
        """Multiply by round(const·const_scale)/const_scale; scale *= const_scale."""
        c = int(round(const * const_scale))
        out = self.mul_scalar_int(a, c)
        return out.with_scale(a.scale * const_scale)

    def mul_ct(self, a: Ciphertext, b: Ciphertext, relin: bool = True) -> Ciphertext:
        """ct × ct with immediate relinearization (one fused kernel)."""
        assert a.level == b.level
        if not relin:
            raise NotImplementedError("degree-2 ciphertexts are always relinearized")
        lvl = a.level
        rlk = self.relin_key(lvl)
        c0, c1 = self._jitted(("mulct", lvl), lambda: self._mulct_f(lvl))(
            a.c0, a.c1, b.c0, b.c1, rlk.d0, self.swk_d1(rlk))
        return Ciphertext(c0, c1, level=lvl, scale=a.scale * b.scale)

    def _mulct_f(self, lvl: int):
        q, qinv, r2, _, _, _, _ = self._qtabs(lvl)
        dec = self._build_decompose(lvl)
        core = self._ks_core_builder(lvl)

        def f(a0, a1, b0, b1, d0k, d1k):
            d0 = mm.mul_mod(a0, b0, q, qinv, r2)
            d1 = mm.add_mod(mm.mul_mod(a0, b1, q, qinv, r2),
                            mm.mul_mod(a1, b0, q, qinv, r2), q)
            d2 = mm.mul_mod(a1, b1, q, qinv, r2)
            ks0, ks1 = core(dec(d2), d0k, d1k)
            return mm.add_mod(d0, ks0, q), mm.add_mod(d1, ks1, q)

        return f

    def square(self, a: Ciphertext) -> Ciphertext:
        return self.mul_ct(a, a)

    # ------------------------------------------------------------------
    # evaluator: level / scale management (Lattigo semantics)
    # ------------------------------------------------------------------

    def rescale(self, a: Ciphertext) -> Ciphertext:
        """Divide by q_level and round; level-1, scale /= q_level."""
        p = self.params
        lvl = a.level
        assert lvl >= 1
        q_top = p.q_moduli[lvl]
        c0, c1 = self._jitted(("rescale", lvl),
                              lambda: self._rescale_f(lvl))(a.c0, a.c1)
        return Ciphertext(c0, c1, level=lvl - 1, scale=a.scale / q_top)

    def _rescale_f(self, lvl: int):
        p = self.params
        q_top = p.q_moduli[lvl]
        idx = p.q_idx(lvl)
        sub_idx = idx[:-1]
        q, qinv, _, r1, _, _, _ = p.ntt.tabs(sub_idx)
        half = jnp.uint64(q_top // 2)
        qtop_mod = jnp.asarray(np.array(
            [q_top % qi for qi in p.q_moduli[:lvl]], dtype=np.uint64)[:, None])
        qinv_last = p.qlast_inv_mont(lvl)
        ntt = p.ntt

        def dive(c):
            t = ntt.intt(c[lvl:], (idx[-1],))        # [1, N] coeff
            red = mm.mont_mul(t, r1, q, qinv)        # t mod q_i, [lvl, N]
            red = jnp.where(t > half, mm.sub_mod(red, qtop_mod, q), red)
            red_ntt = ntt.ntt(red, sub_idx)
            return mm.mont_mul(mm.sub_mod(c[:lvl], red_ntt, q), qinv_last,
                               q, qinv)

        def f(c0, c1):
            return dive(c0), dive(c1)

        return f

    def drop_level(self, a: Ciphertext, levels: int) -> Ciphertext:
        if levels <= 0:
            return a
        nl = a.level - levels
        return Ciphertext(a.c0[: nl + 1], a.c1[: nl + 1], level=nl, scale=a.scale)

    def set_scale(self, a: Ciphertext, target: float) -> Ciphertext:
        """Multiply by a constant then rescale so scale == target exactly.

        Mirrors Lattigo evaluator.SetScale as used by conv_then_pack
        (/root/reference/conv.go:528); consumes one level.
        """
        p = self.params
        q_top = p.q_moduli[a.level]
        ratio = target * q_top / a.scale
        c = int(round(ratio))
        assert c >= 1, (a.scale, target)
        out = self.mul_scalar_int(a, c)
        out = out.with_scale(a.scale * c)
        out = self.rescale(out)
        # absorb float epsilon exactly (Lattigo does the same)
        return out.with_scale(target)

    # ------------------------------------------------------------------
    # evaluator: automorphisms
    # ------------------------------------------------------------------

    def apply_galois(self, a: Ciphertext, g: int) -> Ciphertext:
        """φ_g + key-switch back to s (one fused kernel, perm as arg)."""
        p = self.params
        g = g % (2 * p.n)
        if g == 1:
            return a
        lvl = a.level
        swk = self.galois_key(g, lvl)
        perm = jnp.asarray(nttmod.galois_perm_ntt(p.log_n, g))
        c0, c1 = self._jitted(("galois", lvl), lambda: self._galois_f(lvl))(
            a.c0, a.c1, perm, swk.d0, self.swk_d1(swk))
        return Ciphertext(c0, c1, level=lvl, scale=a.scale)

    def _galois_f(self, lvl: int):
        q = self._qtabs(lvl)[0]
        dec = self._build_decompose(lvl)
        core = self._ks_core_builder(lvl)

        def f(c0, c1, perm, d0, d1):
            c0p = nttmod.apply_galois_ntt(c0, perm)
            c1p = nttmod.apply_galois_ntt(c1, perm)
            ks0, ks1 = core(dec(c1p), d0, d1)
            return mm.add_mod(c0p, ks0, q), ks1

        return f

    def _galois_qp_acc_f(self, lvl: int):
        """φ_g + keyswitch with LAZY mod-down, folded into running sums.

        (aq0 on Q, ap0/ap1 on QP) ← (aq0 + φc0, ap0 + acc0, ap1 + acc1).
        Used by the BSGS giant loop: G giant rotations then cost ONE
        mod-down (in _ks_finish_f) instead of 2G — and the single
        deferred basis-extension rounds once instead of G times."""
        p = self.params
        q = self._qtabs(lvl)[0]
        qp_q = p.ntt.tabs(p.qp_idx(lvl))[0]
        dec = self._build_decompose(lvl)
        core = self._ks_core_builder(lvl, lazy=True)

        def f(c0, c1, perm, d0, d1, aq0, ap0, ap1):
            c0p = nttmod.apply_galois_ntt(c0, perm)
            c1p = nttmod.apply_galois_ntt(c1, perm)
            a0, a1 = core(dec(c1p), d0, d1)
            return (mm.add_mod(aq0, c0p, q),
                    mm.add_mod(ap0, a0, qp_q),
                    mm.add_mod(ap1, a1, qp_q))

        return f

    def _ks_finish_f(self, lvl: int):
        """(g0c0, g0c1, aq0, ap0, ap1) → ciphertext polys on Q_level."""
        q = self._qtabs(lvl)[0]
        md = self._mod_down_builder(lvl)

        def f(g0c0, g0c1, aq0, ap0, ap1):
            o0 = mm.add_mod(mm.add_mod(aq0, md(ap0), q), g0c0, q)
            o1 = mm.add_mod(md(ap1), g0c1, q)
            return o0, o1

        return f

    def galois_acc(self, c0, c1, g: int, lvl: int, aq0, ap0, ap1):
        """Accumulate φ_g(ct)'s keyswitch into lazy QP sums (one kernel)."""
        p = self.params
        swk = self.galois_key(g % (2 * p.n), lvl)
        perm = jnp.asarray(nttmod.galois_perm_ntt(p.log_n, g % (2 * p.n)))
        # the accumulators are dead after each call — donating them lets
        # XLA update the [nqp, N] running sums in place (~15 MB × 3 per
        # giant at logN=16) instead of copying
        f = self._jitted(("galqpacc", lvl), lambda: self._galois_qp_acc_f(lvl),
                         donate_argnums=(5, 6, 7))
        return f(c0, c1, perm, swk.d0, self.swk_d1(swk), aq0, ap0, ap1)

    def ks_finish(self, g0c0, g0c1, aq0, ap0, ap1, lvl: int):
        f = self._jitted(("ksfin", lvl), lambda: self._ks_finish_f(lvl))
        return f(g0c0, g0c1, aq0, ap0, ap1)

    def rotate(self, a: Ciphertext, k: int) -> Ciphertext:
        """Left-rotate slots by k (reference lRot / evaluator.Rotate)."""
        if k % self.params.slots == 0:
            return a
        return self.apply_galois(a, nttmod.rot_to_galois(k, self.params.log_n))

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        return self.apply_galois(a, 2 * self.params.n - 1)

    def rotate_hoisted(self, a: Ciphertext, rots: list[int]) -> dict:
        """Decompose once, rotate many (reference RotateHoisted,
        /root/reference/conv.go:133)."""
        p = self.params
        lvl = a.level
        dec = self._jitted(("decntt", lvl), lambda: self._dec_ntt_f(lvl))
        digits_ntt = dec(a.c1)
        froth = self._jitted(("hoistrot", lvl),
                             lambda: self._hoistrot_f(lvl))
        out = {}
        for k in rots:
            if k % p.slots == 0:
                out[k] = a
                continue
            g = nttmod.rot_to_galois(k, p.log_n)
            swk = self.galois_key_hoisted(g, lvl)
            perm_ntt = jnp.asarray(nttmod.galois_perm_ntt(p.log_n, g))
            c0, c1 = froth(a.c0, digits_ntt, perm_ntt,
                           swk.d0, self.swk_d1(swk))
            out[k] = Ciphertext(c0, c1, level=lvl, scale=a.scale)
        return out

    def _dec_ntt_f(self, lvl: int):
        """c1 [l+1,N] NTT → decomposed digits in NTT form [beta, l+1+P, N].

        The beta digit NTTs are paid here, ONCE per hoisted ciphertext;
        each rotation then only permutes the NTT-domain digits (a pure
        gather — the negacyclic NTT evaluates at the odd roots, where
        φ_g is a point permutation) and runs the key inner product.
        φ_g commutes with digit decomposition (both are coefficient-wise
        in RNS), so this is bit-identical to permute-then-NTT."""
        p = self.params
        dec = self._build_decompose(lvl)
        qp = p.qp_idx(lvl)

        def f(c1):
            return p.ntt.ntt(dec(c1), qp)

        return f

    def _hoistrot_f(self, lvl: int):
        """Hoisted rotation with a PRE-PERMUTED key (galois_key_hoisted):
        the inner product runs on the shared unpermuted digits, and only
        the Q-basis result pair is permuted — φ(d)·k = φ(d·φ^{-1}(k)),
        and the exact mod-down commutes with the automorphism up to ±1
        per coefficient (≪ the keyswitch noise e)."""
        q = self._qtabs(lvl)[0]
        core = self._ks_core_builder(lvl, input_ntt=True)

        def f(c0, digs_ntt, perm_ntt, d0, d1):
            ks0, ks1 = core(digs_ntt, d0, d1)
            o0 = nttmod.apply_galois_ntt(mm.add_mod(c0, ks0, q), perm_ntt)
            o1 = nttmod.apply_galois_ntt(ks1, perm_ntt)
            return o0, o1

        return f

    def rotate_hoisted_lazy(self, a: Ciphertext, rots: list[int]) -> dict:
        """DOUBLE-hoisted baby rotations (Bossuat et al. 2021, as in
        Lattigo's LinearTransform): decompose once, and per rotation skip
        the mod-down entirely, returning the raw triple

            (φ_k(c0) on Q_lvl,  acc0 on Q_lvl·P,  acc1 on Q_lvl·P)

        BSGS callers multiply the triples by QP-encoded plaintexts, sum
        per giant step, and divide by P ONCE per giant (2 mod-downs per
        GIANT instead of 2 per BABY — the dominant per-rotation cost
        after hoisting, ~half of the 50 ms hoisted rotate at logN=16)."""
        p = self.params
        lvl = a.level
        dec = self._jitted(("decntt", lvl), lambda: self._dec_ntt_f(lvl))
        digits_ntt = dec(a.c1)
        froth = self._jitted(("hoistrotlz", lvl),
                             lambda: self._hoistrot_lazy_f(lvl))
        out = {}
        for k in rots:
            if k % p.slots == 0:
                out[k] = self._jitted(
                    ("hoistid", lvl),
                    lambda: self._hoist_identity_f(lvl))(a.c0, a.c1)
                continue
            g = nttmod.rot_to_galois(k, p.log_n)
            swk = self.galois_key_hoisted(g, lvl)
            perm_ntt = jnp.asarray(nttmod.galois_perm_ntt(p.log_n, g))
            out[k] = froth(a.c0, digits_ntt, perm_ntt,
                           swk.d0, self.swk_d1(swk))
        return out

    def _hoistrot_lazy_f(self, lvl: int):
        """Lazy hoisted rotation: pre-permuted key inner product on the
        shared digits, NO mod-down; all three outputs permuted."""
        core = self._ks_core_builder(lvl, input_ntt=True, lazy=True)

        def f(c0, digs_ntt, perm_ntt, d0, d1):
            a0, a1 = core(digs_ntt, d0, d1)
            return (nttmod.apply_galois_ntt(c0, perm_ntt),
                    nttmod.apply_galois_ntt(a0, perm_ntt),
                    nttmod.apply_galois_ntt(a1, perm_ntt))

        return f

    def _hoist_identity_f(self, lvl: int):
        """(c0, c1) → the lazy-triple form of the identity rotation:
        a1 carries P·c1 on the Q rows and 0 on the P rows, so the
        per-giant mod-down recovers c1 EXACTLY ((P·c1 − ext(0))·P⁻¹);
        a0 = 0 (no keyswitch happened)."""
        p = self.params
        nq = lvl + 1
        nqp = nq + p.num_p
        q, qinv = self._qtabs(lvl)[:2]
        # Montgomery form of the scalar P on each Q limb: P·R mod q_i
        pm = jnp.asarray(np.array(
            [(p.big_p % m) * ((1 << 64) % m) % m
             for m in p.q_moduli[:nq]], dtype=np.uint64)[:, None])

        def f(c0, c1):
            top = mm.mont_mul(c1, pm, q, qinv)
            a1 = jnp.concatenate(
                [top, jnp.zeros((nqp - nq, p.n), jnp.uint64)], axis=0)
            return c0, jnp.zeros((nqp, p.n), jnp.uint64), a1

        return f

    # ------------------------------------------------------------------
    # AOT cache warming (compile-only, zero device memory)
    # ------------------------------------------------------------------

    def aot_warm(self, level: int,
                 ops: tuple[str, ...] = ("decntt", "ks", "galois", "hoistrot",
                                         "galqpacc", "ksfin",
                                         "rescale", "mulct"),
                 lt_babies: tuple[int, ...] = ()) -> dict:
        """Compile the per-level kernel family against ShapeDtypeStructs.

        Lowering + compiling (never executing) populates the persistent
        XLA compilation cache with the exact graphs the evaluator jits at
        runtime, with ZERO device-memory footprint — so a side process
        can pre-warm a cold model run without competing for HBM (the
        reference has no analog; its keys alone are ~100 GB resident,
        /root/reference/README.md:67).  Returns {op: compile_seconds}.
        """
        import time
        import jax
        p = self.params
        n = p.n
        nq = level + 1
        nqp = nq + p.num_p
        beta = len(p.digits(level))

        def u64(*s):
            return jax.ShapeDtypeStruct(s, jnp.uint64)

        ct = u64(nq, n)
        key = u64(beta, nqp, n)
        dig = u64(beta, nqp, n)
        i64 = jax.ShapeDtypeStruct((n,), jnp.int64)
        i32b = lambda nb: jax.ShapeDtypeStruct((nb,), jnp.int32)  # noqa: E731
        # donate_argnums must match the runtime jit exactly — aliasing is
        # part of the compiled executable, so a donation mismatch would
        # miss the persistent cache
        specs = {
            "dec": (self._build_decompose, (ct,), ()),
            "decntt": (self._dec_ntt_f, (ct,), ()),
            "ks": (self._ks_f, (ct, key, key), ()),
            "galois": (self._galois_f, (ct, ct, i64, key, key), ()),
            "hoistrot": (self._hoistrot_f, (ct, dig, i64, key, key), ()),
            "galqpacc": (self._galois_qp_acc_f,
                         (ct, ct, i64, key, key, ct, u64(nqp, n), u64(nqp, n)),
                         (5, 6, 7)),
            "ksfin": (self._ks_finish_f,
                      (ct, ct, ct, u64(nqp, n), u64(nqp, n)), ()),
            "rescale": (self._rescale_f, (ct, ct), ()),
            "mulct": (self._mulct_f, (ct, ct, ct, ct, key, key), ()),
            "hoistrotlz": (self._hoistrot_lazy_f, (ct, dig, i64, key, key),
                           ()),
            "hoistid": (self._hoist_identity_f, (ct, ct), ()),
        }
        out = {}
        for op in ops:
            if op == "rescale" and level < 1:
                continue
            build, args, don = specs[op]
            t0 = time.perf_counter()
            jax.jit(build(level), donate_argnums=don).lower(*args).compile()
            out[op] = time.perf_counter() - t0
        # LinearTransform inner kernels: one per distinct
        # (n_babies, sel_len, identity) shape (the formerly-unwarmed
        # dominant kernel — ADVICE r1).  Entries may be bare ints
        # (dense identity selection) or (nb, sel_len, ident) tuples as
        # produced by bootstrap.plan_lt_shapes.
        from .bootstrap import _build_inner, _build_inner_dh, dh_default
        dh = dh_default()
        if lt_babies and dh:
            # the babies feeding lt_inner_dh come from the lazy hoisted
            # path — warm its kernels too (they replace "hoistrot")
            for op in ("hoistrotlz", "hoistid"):
                if op not in ops:
                    build, args, don = specs[op]
                    t0 = time.perf_counter()
                    jax.jit(build(level)).lower(*args).compile()
                    out[op] = time.perf_counter() - t0
        for spec in lt_babies:
            nb, sl, ident = (spec if isinstance(spec, tuple)
                             else (spec, spec, True))
            t0 = time.perf_counter()
            if dh:
                jax.jit(_build_inner_dh(self, level, ident)).lower(
                    u64(nb, nq, n), u64(nb, nqp, n), u64(nb, nqp, n),
                    i32b(sl), u64(sl, nqp, n)).compile()
            else:
                cta = u64(nb, nq, n)
                jax.jit(_build_inner(self, level, ident)).lower(
                    cta, cta, i32b(sl), u64(sl, nq, n)).compile()
            out[f"lt_inner{nb}_{sl}{'i' if ident else ''}"] = (
                time.perf_counter() - t0)
        return out

    # ------------------------------------------------------------------
    # monomial multiplication (exact, scale-free): ct × X^k
    # ------------------------------------------------------------------

    def mul_monomial(self, a: Ciphertext, k: int) -> Ciphertext:
        """Multiply by X^k (k may be negative).  Exact in RNS; used by the
        packing butterfly (/root/reference/conv.go:288) and MultByi."""
        p = self.params
        k = k % (2 * p.n)
        if k == 0:
            return a
        mono_ntt = self.monomial_pt(k, a.level)
        q, qinv, _, _, _, _, _ = self._qtabs(a.level)
        return Ciphertext(mm.mont_mul(a.c0, mono_ntt, q, qinv),
                          mm.mont_mul(a.c1, mono_ntt, q, qinv),
                          level=a.level, scale=a.scale)

    def monomial_pt(self, k: int, level: int) -> jnp.ndarray:
        """Cached NTT+Montgomery form of X^k at `level` (the reference's
        pl_idx table, gen_idxNlogs — /root/reference/conv.go:241)."""
        p = self.params
        key = ("mono", k, level)
        mono_ntt = self._pt_cache.get(key)
        if mono_ntt is None:
            idx = p.q_idx(level)
            mono = np.zeros(p.n, dtype=np.int64)
            if k < p.n:
                mono[k] = 1
            else:
                mono[k - p.n] = -1
            res = mm.centered_to_residues(mono, p.q_moduli[: level + 1])
            q, qinv, r2, _, _, _, _ = self._qtabs(level)
            mono_ntt = mm.to_mont(p.ntt.ntt(jnp.asarray(res), idx), q, qinv, r2)
            self._pt_cache[key] = mono_ntt
        return mono_ntt

    def mul_by_i(self, a: Ciphertext) -> Ciphertext:
        return self.mul_monomial(a, self.params.n // 2)

    def div_by_i(self, a: Ciphertext) -> Ciphertext:
        return self.mul_monomial(a, 3 * self.params.n // 2)
