"""TPU-native Groth-Sahai proof framework (SXDH, BLS12-381).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`groth-sahai-rs` reference library: limb-sliced field towers, batched curve
and pairing kernels, Pippenger MSM, and the full GS commit/prove/verify
pipeline, batched across equations and shardable across a TPU mesh.
"""

__version__ = "0.1.0"
