"""fourdgs_tpu — a TPU-native 4D Gaussian Splatting framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of
fudan-zvg/4d-gaussian-splatting ("Real-time Photorealistic Dynamic Scene
Representation and Rendering with 4D Gaussian Splatting", ICLR 2024).

Layer map (TPU-first, not a port):

  ops/       pure-JAX + Pallas compute: 4D gaussian math, spherindrical
             harmonics, EWA projection, one-sort K-aligned tile binning,
             Pallas tile-blend kernels (fwd + analytic bwd, no atomics).
  models/    padded-capacity gaussian parameter pytree, functional
             adaptive density control, env map, PLY cloud I/O.
  data/      Blender-JSON / COLMAP / N3V readers, camera math, samplers.
  engine/    jitted train step, host trainer, checkpointing.
  parallel/  device-mesh camera-batch sharding, multi-host input helpers,
             single-frame strip sharding.
  utils/     losses (SSIM / MS-SSIM / LPIPS), metrics logging.
  native.py  ctypes bindings for the C++ helpers in native/.

Public API shortcuts below; see README.md for the full map.
"""

__version__ = "0.1.0"

from .config import TrainConfig, load_config               # noqa: F401
from .ops.preprocess import CameraArrays, RenderOptions    # noqa: F401
from .render import RenderOutputs, render                  # noqa: F401


def __getattr__(name):
    # Lazy heavyweight imports (Trainer pulls in the whole stack).
    if name == "Trainer":
        from .engine.trainer import Trainer
        return Trainer
    raise AttributeError(name)
