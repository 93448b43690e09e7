"""Native C++ runtime tests: frame feeder + native normalize."""

import numpy as np
import pytest

from canny_edge_tpu import runtime

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime not built")


def test_feeder_synthetic_deterministic():
    with runtime.FrameFeeder(64, 128, count=10, seed=42) as f:
        frames = [frame.copy() for frame in f]
    assert len(frames) == 10
    assert frames[0].shape == (64, 128) and frames[0].dtype == np.uint8
    # deterministic: same seed -> same frames
    with runtime.FrameFeeder(64, 128, count=10, seed=42) as f2:
        frames2 = [frame.copy() for frame in f2]
    for a, b in zip(frames, frames2):
        np.testing.assert_array_equal(a, b)
    # different seed differs
    with runtime.FrameFeeder(64, 128, count=1, seed=7) as f3:
        other = next(iter(f3)).copy()
    assert not np.array_equal(frames[0], other)


def test_feeder_raw8_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(5, 32, 64), dtype=np.uint8)
    raw = tmp_path / "stream.y8"
    raw.write_bytes(frames.tobytes())
    with runtime.FrameFeeder(32, 64, mode=runtime.MODE_RAW8,
                             path=str(raw)) as f:
        got = [frame.copy() for frame in f]
    assert len(got) == 5
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_feeder_stats_and_backpressure():
    with runtime.FrameFeeder(16, 16, capacity=2, count=100) as f:
        n = sum(1 for _ in f)
        stats = f.stats()
    assert n == 100
    assert stats["produced"] == 100
    assert stats["consumed"] >= 99  # last slot released on close/iteration end


def _write_pgm(path, img, comments=False):
    hdr = b"P5\n"
    if comments:
        hdr += b"# created by a third-party writer\n"
    hdr += b"%d " % img.shape[1]
    if comments:
        hdr += b"# width then height\n"
    hdr += b"%d\n255\n" % img.shape[0]
    path.write_bytes(hdr + img.tobytes())


def test_feeder_pgm_dir_with_comment_headers(tmp_path):
    """P5 files with '#' comment lines between header tokens must load
    (common third-party writer output)."""
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(3, 16, 32), dtype=np.uint8)
    for i, fr in enumerate(frames):
        _write_pgm(tmp_path / f"frame_{i:06d}.pgm", fr, comments=(i % 2 == 0))
    with runtime.FrameFeeder(16, 32, mode=runtime.MODE_PGM_DIR,
                             path=str(tmp_path)) as f:
        got = [frame.copy() for frame in f]
        stats = f.stats()
    assert len(got) == 3
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    assert stats["read_errors"] == 0


def test_feeder_pgm_corrupt_file_reports_read_error(tmp_path):
    """A present-but-unparsable frame ends the stream with read_errors=1,
    distinguishable from normal end-of-stream."""
    rng = np.random.default_rng(3)
    _write_pgm(tmp_path / "frame_000000.pgm",
               rng.integers(0, 256, size=(16, 32), dtype=np.uint8))
    (tmp_path / "frame_000001.pgm").write_bytes(b"P6 garbage not a pgm")
    with runtime.FrameFeeder(16, 32, mode=runtime.MODE_PGM_DIR,
                             path=str(tmp_path)) as f:
        got = [frame.copy() for frame in f]
        stats = f.stats()
    assert len(got) == 1
    assert stats["read_errors"] == 1


def test_native_normalize_matches_python():
    from canny_edge_tpu.io.imageio import minmax_normalize_u8

    rng = np.random.default_rng(1)
    img = rng.integers(-500, 1500, size=(64, 64)).astype(np.int16)
    np.testing.assert_array_equal(
        runtime.minmax_normalize_u8_native(img), minmax_normalize_u8(img))
    const = np.full((8, 8), 42, np.int16)
    np.testing.assert_array_equal(
        runtime.minmax_normalize_u8_native(const), np.zeros((8, 8), np.uint8))


def test_feeder_drives_pipeline():
    from canny_edge_tpu.models import CannyTPU

    model = CannyTPU(sigma=1.0)
    with runtime.FrameFeeder(64, 128, count=3, seed=1) as f:
        outs = [np.asarray(model(frame, 30, 90)) for frame in f]
    assert len(outs) == 3
    for o in outs:
        assert set(np.unique(o)) <= {0, 255}
