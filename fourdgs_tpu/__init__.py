"""fourdgs_tpu — a TPU-native 4D Gaussian Splatting framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of
fudan-zvg/4d-gaussian-splatting ("Real-time Photorealistic Dynamic Scene
Representation and Rendering with 4D Gaussian Splatting", ICLR 2024).

Layer map (TPU-first, not a port):

  ops/       pure-JAX + Pallas compute: 4D gaussian math, spherindrical
             harmonics, EWA projection, tile binning (lexicographic
             on-device sort), matmul-structured alpha blending.
  models/    the padded-capacity gaussian parameter pytree, functional
             adaptive density control, env map.
  data/      Blender-JSON / COLMAP scene readers, camera math, samplers.
  parallel/  device-mesh sharding of the camera batch (data parallel over
             ICI), gradient psum, multi-host input pipeline helpers.
  utils/     losses (SSIM / MS-SSIM), metrics, LR schedules, PLY io,
             checkpointing.

The reference implementation is a single-GPU CUDA/torch trainer; here the
compute path is XLA/Pallas with static shapes, reductions instead of
atomics, and an SPMD camera/ray batch axis.
"""

__version__ = "0.1.0"
