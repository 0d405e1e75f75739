"""resultReader-compatible post-processing: MATLAB .m series emission.

Reference: kalmanFilter/resultReader/ -- reads output.yml, extracts
per-frame camera positions / velocities / Euler orientations / counts /
phase times, recovers metric scale, and writes each series as a MATLAB
function file (Points3d.cpp:44-66, Points1d, TimesCpu, ScaleFactor.cpp:
91-109).  This module produces the same artifact set from this engine's
records (list of dicts from SlamEngine, or a stacked StepRecord pytree).
"""

from __future__ import annotations

import os

import numpy as np

from openekfmonoslam_tpu.eval.trajectory import (
    EXABOT_VELOCITY,
    scale_factor,
)


def _quat_to_euler(q: np.ndarray) -> np.ndarray:
    """(T, 4) -> (T, 3) roll/pitch/yaw (quaterionToAngles, EKFMath.cpp:355-365)."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.stack([
        np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y)),
        np.arcsin(np.clip(2 * (w * y - z * x), -1, 1)),
        np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z)),
    ], axis=-1)


def write_points3d(path: str, name: str, pts: np.ndarray) -> None:
    """A MATLAB function returning 3 column vectors (Points3d.cpp:44-66)."""
    with open(path, "w") as f:
        f.write(f"function [x, y, z] = {name}()\n")
        for dim, label in enumerate("xyz"):
            vals = " ".join(f"{v:.17g}" for v in pts[:, dim])
            f.write(f"{label} = [{vals}];\n")
        f.write("end\n")


def write_points1d(path: str, name: str, vals: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(f"function [x] = {name}()\n")
        body = " ".join(f"{v:.17g}" for v in np.asarray(vals).ravel())
        f.write(f"x = [{body}];\nend\n")


def write_scale_factor(path: str, name: str, factor: float) -> None:
    """(ScaleFactor::save, ScaleFactor.cpp:91-109)."""
    with open(path, "w") as f:
        f.write(f"function [x] = {name}()\nx = [{factor:.17g}];\nend\n")


def records_to_dicts(records) -> list:
    """Stacked StepRecord pytree (scan runner output) -> per-frame dicts
    in the engine's record format."""
    x = np.asarray(records.x_cam, np.float64)
    tm = np.asarray(records.total_matches)
    li = np.asarray(records.li_inliers)
    hi = np.asarray(records.hi_inliers)
    na = np.asarray(records.n_active)
    out = []
    for i in range(len(x)):
        out.append({
            "frame": i + 1,
            "position": x[i, 0:3].tolist(),
            "orientation": x[i, 3:7].tolist(),
            "linear_velocity": x[i, 7:10].tolist(),
            "angular_velocity": x[i, 10:13].tolist(),
            "total_matches": int(tm[i]),
            "li_inliers": int(li[i]),
            "hi_inliers": int(hi[i]),
            "n_active": int(na[i]),
            "wall_time_s": 0.0,
        })
    return out


def write_output_yml(records, path: str) -> str:
    """output.yml dump (EKF.cpp:614-629 layout) from record dicts or a
    stacked StepRecord pytree."""
    if not isinstance(records, list):
        records = records_to_dicts(records)
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        for r in records:
            f.write(f'"Frame {r["frame"]}":\n')
            f.write(f"  totalMatches: {r['total_matches']}\n")
            f.write(f"  liInliers: {r['li_inliers']}\n")
            f.write(f"  hiInliers: {r['hi_inliers']}\n")
            f.write("  StateEstimation:\n")
            f.write(f"    position: {r['position']}\n")
            f.write(f"    orientation: {r['orientation']}\n")
            f.write(f"    linearVelocity: {r['linear_velocity']}\n")
            f.write(f"    angularVelocity: {r['angular_velocity']}\n")
    return path


def read_output_yml(path: str) -> list:
    """Parse an output.yml (ours or reference-shaped) back into records.

    The reference's resultReader consumes output.yml frame nodes
    (resultReader/main.cpp:82-150); this is the matching input side so the
    report/trajectory tooling runs on dumped files, not only live runs.
    """
    import re
    records: list[dict] = []
    cur: dict | None = None
    vec = re.compile(r"\[([^\]]*)\]")

    def parse_vec(line):
        m = vec.search(line)
        return [float(v) for v in m.group(1).split(",")] if m else []

    with open(path) as f:
        for line in f:
            s = line.strip()
            if s.startswith('"Frame'):
                if cur:
                    records.append(cur)
                cur = {"frame": int(s.split()[1].rstrip('":'))}
            elif cur is not None:
                if s.startswith("totalMatches:"):
                    cur["total_matches"] = int(s.split(":")[1])
                elif s.startswith("liInliers:"):
                    cur["li_inliers"] = int(s.split(":")[1])
                elif s.startswith("hiInliers:"):
                    cur["hi_inliers"] = int(s.split(":")[1])
                elif s.startswith("position:"):
                    cur["position"] = parse_vec(s)
                elif s.startswith("orientation:"):
                    cur["orientation"] = parse_vec(s)
                elif s.startswith("linearVelocity:"):
                    cur["linear_velocity"] = parse_vec(s)
                elif s.startswith("angularVelocity:"):
                    cur["angular_velocity"] = parse_vec(s)
    if cur:
        records.append(cur)
    for r in records:
        r.setdefault("wall_time_s", 0.0)
        r.setdefault("hi_inliers", 0)
        r.setdefault("li_inliers", 0)
        r.setdefault("total_matches", 0)
    return records


def _extract(records):
    if isinstance(records, list):
        pos = np.asarray([r["position"] for r in records])
        quat = np.asarray([r["orientation"] for r in records])
        vel = np.asarray([r["linear_velocity"] for r in records])
        avel = np.asarray([r["angular_velocity"] for r in records])
        matches = np.asarray([r["total_matches"] for r in records])
        li = np.asarray([r["li_inliers"] for r in records])
        hi = np.asarray([r["hi_inliers"] for r in records])
        times = np.asarray([r.get("wall_time_s", 0.0) for r in records])
    else:
        x = np.asarray(records.x_cam)
        pos, quat, vel, avel = x[:, 0:3], x[:, 3:7], x[:, 7:10], x[:, 10:13]
        matches = np.asarray(records.total_matches)
        li = np.asarray(records.li_inliers)
        hi = np.asarray(records.hi_inliers)
        times = np.zeros(len(x))
    return pos, quat, vel, avel, matches, li, hi, times


def emit_matlab_report(records, output_dir: str,
                       robot_velocity: float = EXABOT_VELOCITY) -> dict:
    """Write the full resultReader artifact set (resultReader/main.cpp:152-163)."""
    os.makedirs(output_dir, exist_ok=True)
    pos, quat, vel, avel, matches, li, hi, times = _extract(records)

    write_points3d(os.path.join(output_dir, "cameraPositions.m"),
                   "cameraPositions", pos)
    write_points3d(os.path.join(output_dir, "cameraLinearVelocities.m"),
                   "cameraLinearVelocities", vel)
    write_points3d(os.path.join(output_dir, "cameraAngularVelocities.m"),
                   "cameraAngularVelocities", avel)
    write_points3d(os.path.join(output_dir, "cameraOrientations.m"),
                   "cameraOrientations", _quat_to_euler(quat))
    write_points1d(os.path.join(output_dir, "matches.m"), "matches", matches)
    write_points1d(os.path.join(output_dir, "inliers.m"), "inliers", li)
    write_points1d(os.path.join(output_dir, "rescued.m"), "rescued", hi)
    write_points1d(os.path.join(output_dir, "timesCpu.m"), "timesCpu", times)

    sf = scale_factor(vel, robot_velocity)
    write_scale_factor(os.path.join(output_dir, "scaleFactor.m"),
                       "scaleFactor", sf)
    return {"scale_factor": sf, "n_frames": len(pos)}
