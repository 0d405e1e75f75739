"""Keyframe pose-graph layer (no reference counterpart; BASELINE north
star).  See openekfmonoslam_tpu.graph.pose_graph."""

from openekfmonoslam_tpu.graph.pose_graph import (  # noqa: F401
    PoseGraph,
    add_keyframe,
    add_loop_edge,
    make_pose_graph,
    optimize,
    relative_pose,
)
