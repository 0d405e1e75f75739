from openekfmonoslam_tpu.core import camera, quaternion  # noqa: F401
