"""VideoFileSource coverage on a tiny generated clip (cv2-gated).

The reference's VideoFileImageGenerator wraps cv::VideoCapture
(VideoFileImageGenerator.cpp:76-113); our VideoFileSource does the same
through cv2.  This test closes the "cv2-gated, untested in CI" gap by
encoding a small synthetic clip with cv2.VideoWriter and reading it back
through the source.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from openekfmonoslam_tpu.io.sources import VideoFileSource  # noqa: E402


def _write_clip(path, n_frames=12, w=96, h=64):
    """Moving-gradient clip; returns the per-frame mean gray levels."""
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, 10.0, (w, h))
    assert vw.isOpened(), "cv2.VideoWriter could not open (codec missing)"
    means = []
    for t in range(n_frames):
        xs = np.arange(w, dtype=np.float32)
        row = ((xs + 8 * t) % w) / w * 200.0 + 20.0
        gray = np.repeat(row[None, :], h, axis=0).astype(np.uint8)
        means.append(float(gray.mean()))
        vw.write(cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR))
    vw.release()
    return means


class TestVideoFileSource:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "clip.mp4")
        means = _write_clip(path)

        frames = list(VideoFileSource(path))
        assert len(frames) == len(means)
        for f in frames:
            assert f.dtype == np.uint8
            assert f.shape == (64, 96)
        # lossy codec: require per-frame means to track the written clip
        got = [float(f.mean()) for f in frames]
        np.testing.assert_allclose(got, means, atol=6.0)
        # frames must actually differ (the gradient moves)
        assert np.abs(frames[0].astype(int) - frames[5].astype(int)).max() > 20

    def test_missing_file_yields_nothing(self, tmp_path):
        assert list(VideoFileSource(str(tmp_path / "nope.mp4"))) == []

    def test_cli_source_spec(self, tmp_path):
        """A non-directory path resolves to VideoFileSource in the CLI."""
        from openekfmonoslam_tpu.cli import build_source
        path = str(tmp_path / "clip.mp4")
        _write_clip(path, n_frames=4)
        src = build_source(path, begin=1, end=4)
        assert isinstance(src, VideoFileSource)
        assert len(list(src)) == 4
