"""Run the engine on the bundled s3 experiment sequence.

Usage: python tools/run_s3.py [n_frames] [output_dir]
Mirrors samples/EKF/main.cpp driving kalmanFilter on
experiments/s3/costado_recto1 with experiments/s3/config.yml.
"""

import sys
import time

sys.path.insert(0, ".")

from openekfmonoslam_tpu.engine.engine import SlamEngine, run_sequence
from openekfmonoslam_tpu.io.sources import FileSequenceSource

CONFIG = "/root/reference/experiments/s3/config.yml"
FRAMES = "/root/reference/experiments/s3/costado_recto1"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    out = sys.argv[2] if len(sys.argv) > 2 else None

    src = FileSequenceSource(FRAMES, begin=1, end=1 + n)
    engine = SlamEngine(CONFIG, output_path=out)
    print(f"state_dim={engine.config.state_dim} "
          f"max_features={engine.config.max_features} "
          f"dtype={engine.config.dtype}")

    t0 = time.perf_counter()
    run_sequence(engine, src, progress_every=10)
    total = time.perf_counter() - t0

    n_steps = len(engine.records)
    # skip the first two frames (jit compile) for steady-state fps
    steady = [r["wall_time_s"] for r in engine.records[2:]]
    if steady:
        import numpy as np
        print(f"\n{n_steps} frames in {total:.1f}s; steady-state "
              f"{1.0 / np.mean(steady):.1f} fps "
              f"(median {1.0 / np.median(steady):.1f} fps)")
    engine.close()


if __name__ == "__main__":
    main()
