"""kiss_icp_tpu: a TPU-native LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the KISS-ICP pipeline
("In Defense of Point-to-Point ICP", RA-L 2023): motion deskewing, double voxel
downsampling, a fixed-capacity voxel hash map, adaptive-threshold correspondence
search, and robust point-to-point ICP — all compiled into a single XLA program per
frame, scaling over TPU meshes via jax.sharding.
"""

from kiss_icp_tpu.version import __version__

__all__ = ["__version__"]
