"""Loop-closure evidence on a CLI-driven run (VERDICT r2 #6).

Builds a genuine-revisit sequence as an on-disk frame directory (the s3
forward segment, an 8-frame blackout, then the same segment reversed --
real pixels, the camera provably ends where it started), drives the
ORDINARY CLI on it with the keyframe pose-graph enabled, and writes
runs/loop_closure/summary.json with raw vs drift-corrected endpoint
error.  Everything regenerates with:

    python tools/run_loop_closure.py

The CLI artifacts (output.yml, cameraPositionsCorrected.m, loop edge
list) land in runs/loop_closure/out/.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, ".")

import numpy as np

FRAMES_DIR = "/root/reference/experiments/s3/costado_recto1"
CONFIG = "/root/reference/experiments/s3/config.yml"
N_FWD = 46
N_BLACK = 8


def build_sequence(seq_dir: str) -> int:
    from PIL import Image

    os.makedirs(seq_dir, exist_ok=True)
    order = (list(range(1, N_FWD + 1)) + [0] * N_BLACK
             + list(range(N_FWD - 1, 0, -1)))
    black = None
    for i, src_idx in enumerate(order, start=1):
        dst = os.path.join(seq_dir, f"{i:05d}.png")
        if os.path.exists(dst):
            continue
        if src_idx == 0:
            if black is None:
                w, h = Image.open(
                    os.path.join(FRAMES_DIR, "00001.png")).size
                black = Image.new("L", (w, h), 0)
            black.save(dst)
        else:
            shutil.copyfile(
                os.path.join(FRAMES_DIR, f"{src_idx:05d}.png"), dst)
    return len(order)


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "runs/loop_closure"
    seq_dir = os.path.join(out_root, "sequence")
    out_dir = os.path.join(out_root, "out")
    n = build_sequence(seq_dir)
    print(f"sequence: {n} frames at {seq_dir}")

    from openekfmonoslam_tpu.cli import main as cli_main

    cli_main([CONFIG, seq_dir, out_dir,
              "--begin", "1", "--end", str(n),
              "--keyframe-every", "6", "--relocalize-after", "3"])

    records = [json.loads(line) for line in
               open(os.path.join(out_dir, "records.jsonl"))]
    raw = np.asarray([r["position"] for r in records])
    corr_path = os.path.join(out_dir, "trajectory_corrected.npy")
    assert os.path.exists(corr_path), "no loop closure fired"
    corrected = np.load(corr_path)

    raw_err = float(np.linalg.norm(raw[-1] - raw[0]))
    corr_err = float(np.linalg.norm(corrected[-1] - corrected[0]))
    path = float(np.sum(np.linalg.norm(np.diff(raw, axis=0), axis=1)))
    closures = json.load(open(os.path.join(out_dir, "loop_closures.json")))
    reloc = sum(1 for r in records if r.get("relocalized"))
    summary = {
        "n_frames": int(len(raw)),
        "path_length": path,
        "endpoint_error_raw": raw_err,
        "endpoint_error_corrected": corr_err,
        "improvement": 1.0 - corr_err / max(raw_err, 1e-12),
        "relocalizations": int(reloc),
        "loop_closures": len(closures),
        "closure_edges": [
            {"i": c["i"], "j": c["j"], "matches": c["matches"],
             "rms_px": round(float(c["rms_px"]), 3)} for c in closures],
        "command": ("python -m openekfmonoslam_tpu.cli <s3 config> "
                    f"{seq_dir} --keyframe-every 6 --relocalize-after 3"),
    }
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    # keep the repo light: the sequence dir is regenerable, drop frames
    shutil.rmtree(seq_dir)


if __name__ == "__main__":
    main()
