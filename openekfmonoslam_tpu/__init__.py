"""openekfmonoslam_tpu: a TPU-native monocular EKF-SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
segeschecho/OpenEKFMonoSLAM (1-Point RANSAC inverse-depth EKF MonoSLAM,
reference at /root/reference): the full pipeline -- corner detection,
binary-descriptor active-search matching with uncertainty-ellipse gating,
inverse-depth feature initialization, EKF predict/update with 1-point
RANSAC low/high-innovation split, and map management -- expressed as
statically-shaped, branch-free JAX suitable for `jit`/`vmap`/`pjit`.

Key architectural departures from the reference (see SURVEY.md section 7):
  * slot-based state: a fixed number of feature slots with active masks
    instead of a dynamically growing covariance (ref AddMapFeature.cpp:221,
    MapManagement.cpp:168);
  * one jitted function per frame step; `lax.scan` over frames;
  * batched RANSAC hypotheses via `vmap` instead of the sequential loop at
    1PointRansac.cpp:125;
  * analytic ellipse (Mahalanobis) gating instead of mask rasterization
    (Matching.cpp:193, Gui/Draw.cpp:42);
  * multi-device scaling via `jax.sharding.Mesh` + collectives.
"""

__version__ = "0.1.0"

from openekfmonoslam_tpu.config import (  # noqa: F401
    CameraCalibration,
    EKFParams,
    SlamConfig,
    load_config,
)
