"""tokamak_zk_evm_tpu — TPU-native Tokamak zk-SNARK proving framework.

A from-scratch JAX/XLA/Pallas reimplementation of the compute core of
tokamak-network/Tokamak-zk-EVM's backend (the Rust/ICICLE prover), designed
TPU-first: limbed Montgomery field kernels on the VPU, batched bivariate NTTs,
scan-based polynomial division, Pippenger MSM with segmented scans, and
mesh-sharded scale-out over ICI.

Subpackages:
  fields   — BLS12-381 constants, host-side exact arithmetic
  ops      — device compute: bigint limb engine, NTT, polynomial engine,
             curve ops, MSM
  models   — the protocol layer: setup / preprocess / prover (rounds 0-4) /
             verifier / transcript
  host     — host-side exact oracle: keccak, pairing, reference EC
  parallel — device-mesh sharding for multi-chip NTT / MSM
  io       — artifact (de)serialization compatible with the reference's JSON
             file contract
"""

__version__ = "0.1.0"

# Persistent compile cache: force-enabled (the axon TPU plugin's platform name
# fails JAX's allowlist check even though serialization works — see
# utils/compile_cache.py).  Must run before the first jit compile.
from .utils import compile_cache as _compile_cache

_compile_cache.enable()
