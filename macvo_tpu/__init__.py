"""macvo_tpu — TPU-native stereo visual odometry framework.

A from-scratch JAX/XLA/Pallas rebuild of the MAC-VO (ICRA 2025) pipeline:
metrics-aware covariance stereo VO with a transformer flow/stereo frontend, a
covariance-weighted two-frame pose-graph backend, and multi-host scaling via
``jax.sharding``. See SURVEY.md for the blueprint and the reference map.
"""

__version__ = "0.1.0"
