"""optimal_conv_tpu — a TPU-native CKKS homomorphic-encryption framework.

A from-scratch JAX/XLA/Pallas implementation of the full stack behind
"Optimized Privacy-Preserving CNN Inference with Fully Homomorphic
Encryption" (reference: dwkim606/optimal_conv, pure Go + Lattigo-v2 fork).

Layering (bottom → top), mirroring the reference's structure
(see SURVEY.md §1) but designed TPU-first:

  core/      RNS ring arithmetic: uint64 Montgomery modmul, negacyclic
             NTT/iNTT over [L, N] limb-major arrays, Galois automorphism
             permutations, fast RNS basis conversion.  All shapes are
             static; every hot loop is a fused elementwise pass over
             [num_limbs, N] arrays (VPU-bound) or a Pallas kernel.
  ckks/      Scheme layer: parameters/moduli chains, keygen (sparse
             ternary secret), encryptor/decryptor, coeff + slot encoders,
             evaluator (add/mul/rescale/rotate/relin/hoisted rotations,
             BSGS polynomial evaluation), split bootstrapping
             (ModUp → CtoS → EvalMod ∥ ReLU+repack ∥ StoC).
  ops/       The paper's packed-convolution layer: coefficient-domain
             multiplexed conv, log-depth ciphertext packing, minimax
             ReLU, strided/sparse repack index generators and their
             plaintext mirrors (executable spec, reference rot_util.go).
  models/    Encrypted model graphs: single conv, ResNet-{8,14,20}
             CIFAR-10/100 (widen 1/2/3), ImageNet tails.
  parallel/  Multi-chip sharding: jax.sharding.Mesh over (data, limb)
             axes; collectives ride ICI via pjit/shard_map.

uint64 note: TPUs have no native 64-bit integer ALU; XLA emulates u64
ops with u32 pairs.  All modular arithmetic here is written against
explicit 32-bit decompositions (see core/modmath.py) so the op mix is
what the VPU actually executes, with Pallas kernels for the hot paths.
"""

import os
import pathlib

import jax

# 64-bit integers are required package-wide (CKKS moduli are 40-61 bit).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the evaluator compiles one kernel per
# (op, level) pair (~170 for a full bootstrap pipeline); caching across
# processes turns repeat runs / test invocations from minutes of XLA
# compile time into milliseconds of cache hits.
_cache_dir = os.environ.get(
    "OPTIMAL_CONV_TPU_CACHE",
    str(pathlib.Path.home() / ".cache" / "optimal_conv_tpu_xla"))
pathlib.Path(_cache_dir).mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"
