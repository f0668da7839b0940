"""kiss_icp_tpu: a TPU-native LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the KISS-ICP pipeline
("In Defense of Point-to-Point ICP", RA-L 2023): motion deskewing, double voxel
downsampling, a fixed-capacity voxel hash map, adaptive-threshold correspondence
search, and robust point-to-point ICP — all compiled into a single XLA program per
frame, scaling over TPU meshes via jax.sharding.
"""

import jax as _jax

# This framework computes geometry, not neural nets: every matmul is a small
# SE(3) transform or a 6x6 normal-equation contraction whose f32 accuracy is
# the product. TPUs lower f32 matmuls to bfloat16 MXU passes by default, which
# perturbs 50 m point coordinates by ~0.2 m per transform and makes ICP diverge
# (observed on v5e). Force full f32 matmul precision for everything.
_jax.config.update("jax_default_matmul_precision", "highest")

from kiss_icp_tpu.version import __version__  # noqa: E402

__all__ = ["__version__"]
