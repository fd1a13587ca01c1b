"""sonar_slam_tpu — a TPU-native underwater sonar SLAM framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of jake3991/sonar-SLAM ("bruce_slam"):
CFAR sonar feature extraction, DVL/IMU/depth dead reckoning (plus Kalman and
FOG-gyro alternates), Sobol-initialized trimmed ICP scan matching, an SE(2)
factor-graph smoother with PCM-vetted loop closures, and log-odds occupancy
mapping — all expressed as pure, jittable functions over fixed-capacity padded
tensors so the whole pipeline runs as batched XLA programs on TPU.

Layer map (mirrors SURVEY.md §7):
  kernels/     L0 — Pallas/JAX compute kernels (CFAR variants, polar ops)
  geometry/    L1 — SE(2)/SE(3) pose algebra (replaces gtsam pose types)
  cloud/       L2 — masked point-cloud ops + batched trimmed ICP (replaces pcl.cpp)
  estimators/  L3 — dead reckoning / Kalman / gyro integrators
  graph/       L4 — SE(2) factor-graph Gauss-Newton smoother + PCM (replaces ISAM2)
  slam/        L5 — keyframe gating, SSM/NSSM scan matching, fused SLAM scan
  mapping/     L6 — log-odds occupancy grids with loop-closure repaint
  io/          L7 — config YAML semantics, datasets, simulator, state export
  parallel/    sharded sweeps and multi-chip helpers (jax.sharding / shard_map)
"""

__version__ = "0.1.0"
