"""mslesions3d_tpu — a TPU-native 3D lesion-detection framework (JAX/XLA/Pallas).

Rebuilds the capabilities of MSLesions3D (PyTorch/Lightning/MONAI, single-GPU)
as an idiomatic JAX stack: static-shape vectorized box ops, flax models with
channels-last (NDHWC) layout, pjit/shard_map data parallelism over device
meshes, Pallas kernels for the hot paths, and host-side NIfTI I/O with no
external medical-imaging dependencies.

Layer map (mirrors SURVEY.md §1):
  L1 ops/        geometry + metrics kernel library (pure jnp / numpy)
  L2 data/       NIfTI I/O, transforms, datamodules, synthetic generator
  L3 models/     backbones, SSD3D head, priors, multibox loss
  L4 train/      train state, pjit train/eval steps, checkpoints, loop
  L5 cli/        train / predict / eval / generate entry points
  L6 utils/      labels, analysis & visualization helpers
"""

__version__ = "0.2.0"
