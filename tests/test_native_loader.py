"""Native C++ frame loader: correctness vs the PIL path."""

import os

import numpy as np
import pytest

from openekfmonoslam_tpu.io import native_loader
from openekfmonoslam_tpu.io.sources import FileSequenceSource

FRAMES = "/root/reference/experiments/s3/costado_recto1"

pytestmark = pytest.mark.skipif(
    not (native_loader.available() and os.path.isdir(FRAMES)),
    reason="native loader not built or dataset missing")


def test_matches_pil_decode():
    paths = native_loader.file_sequence_paths(FRAMES, 1, 8)
    ld = native_loader.NativeFrameLoader(paths, n_threads=2)
    native = np.stack([ld.get(i) for i in range(8)])
    ld.close()
    pil = np.stack(list(FileSequenceSource(FRAMES, 1, 8)))
    assert native.shape == pil.shape
    # identical fixed-point vs float luma rounding can differ by 1
    assert np.abs(native.astype(int) - pil.astype(int)).max() <= 1


def test_missing_file_returns_none(tmp_path):
    ld = native_loader.NativeFrameLoader([str(tmp_path / "nope.png")])
    assert ld.get(0) is None
    ld.close()


def test_out_of_range():
    paths = native_loader.file_sequence_paths(FRAMES, 1, 2)
    ld = native_loader.NativeFrameLoader(paths)
    assert ld.get(5) is None
    assert len(ld) == 2
    ld.close()
