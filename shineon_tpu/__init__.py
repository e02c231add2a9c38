"""ShineOn-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video virtual try-on framework.

A from-scratch re-design of the capabilities of andrewjong/ShineOn-Virtual-Tryon
(CP-VTON GMM warp, U-Net try-on, SAMS video GAN) for TPU hardware:

- compute path: JAX + Flax Linen modules, bf16-friendly, static shapes, `lax.scan`
  frame loops, Pallas kernels for the flow-warp / correlation hot ops,
- parallelism: a single `jax.sharding.Mesh` with batch ("data") sharding; gradient
  all-reduce and cross-replica batch-norm statistics are compiler-inserted
  collectives rather than NCCL calls,
- runtime: an explicit jitted train step + small Python callback loop (checkpoint
  every-N-steps, top-k on val loss, save-on-interrupt) backed by Orbax.

Layout convention is NHWC (channels-last) everywhere on device; the reference's
NCHW tensors map to NHWC with frames folded into the trailing channel axis.
"""

__version__ = "0.1.0"
