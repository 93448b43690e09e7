"""CLI + IO layer tests (reference app-layer parity, SURVEY components 1-3)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from canny_edge_tpu import golden
from canny_edge_tpu.cli import main as cli_main
from canny_edge_tpu.io import imageio, video


def test_bgr_to_gray_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    ours = imageio.bgr_to_gray(bgr)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(ours, ref)


def test_minmax_normalize():
    img = np.array([[-100, 0], [100, 300]], np.int16)
    out = imageio.minmax_normalize_u8(img)
    assert out.dtype == np.uint8
    assert out[0, 0] == 0 and out[1, 1] == 255
    assert np.all(imageio.minmax_normalize_u8(np.full((4, 4), 7)) == 0)


def test_open_source_synthetic_and_batched():
    frames = list(video.open_source("synthetic:32x48x5"))
    assert len(frames) == 5 and frames[0].shape == (32, 48)
    batches = list(video.batched(iter(frames), 2))
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    padded = list(video.batched(iter(frames), 2, pad_to_full=True))
    assert [b.shape[0] for b in padded] == [2, 2, 2]


def test_cli_single_image(tmp_path, test_image):
    import cv2

    src = str(tmp_path / "in.png")
    cv2.imwrite(src, test_image)
    out = str(tmp_path / "edges.png")
    rc = cli_main([src, "1.0", "50", "150", "-o", out,
                   "--out-dir", str(tmp_path)])
    assert rc == 0
    edges = imageio.load_grayscale(out)
    ref = golden.canny(test_image, 1.0, 50, 150).astype(np.uint8)
    np.testing.assert_array_equal(edges, ref)


def test_cli_save_steps(tmp_path, test_image):
    import cv2

    src = str(tmp_path / "in.png")
    cv2.imwrite(src, test_image)
    rc = cli_main([src, "1.0", "50", "150", "-s",
                   "--out-dir", str(tmp_path / "steps"),
                   "-o", str(tmp_path / "e.png")])
    assert rc == 0
    for name in ("smoothed", "magnitude", "nonmax"):
        assert os.path.exists(tmp_path / "steps" / f"step_{name}.png")


def test_cli_golden_backend_video_batches(tmp_path):
    rc = cli_main(["synthetic:32x48x5", "1.0", "30", "90",
                   "--backend", "golden", "--batch", "2",
                   "--out-dir", str(tmp_path / "out"), "--json"])
    assert rc == 0
    outs = sorted(os.listdir(tmp_path / "out"))
    assert len(outs) == 5


@pytest.mark.parametrize("argv,msg", [
    (["x.png", "1.0", "150", "50"], "minVal must be less than maxVal"),
    (["x.png", "1.0", "-1", "50"], "minVal must be in the range"),
    (["x.png", "1.0", "0", "256"], "maxVal must be in the range"),
    (["x.png", "-1.0", "0", "255"], "sigma must be positive"),
])
def test_cli_validation(argv, msg):
    with pytest.raises(SystemExit) as exc:
        cli_main(argv)
    assert msg in str(exc.value)


def test_cli_subprocess_entrypoint(tmp_path, test_image):
    """python -m canny_edge_tpu.cli works as an executable."""
    import cv2

    src = str(tmp_path / "in.png")
    cv2.imwrite(src, test_image)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "canny_edge_tpu.cli", src, "1.0", "50", "150",
         "-o", str(tmp_path / "out.png")],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    assert "Execution time:" in r.stdout


def test_cli_sharded_backend(tmp_path):
    """End-to-end CLI with the sharded backend on the CPU mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices for the 1x2x4 mesh")
    rc = cli_main(["synthetic:64x128x2", "1.0", "30", "90",
                   "--backend", "sharded", "--mesh", "1x2x4", "--batch", "2",
                   "--out-dir", str(tmp_path / "out"), "--json"])
    assert rc == 0
    outs = sorted(os.listdir(tmp_path / "out"))
    assert len(outs) == 2
    from canny_edge_tpu.io import imageio, synthetic_image as _syn
    edges = imageio.load_grayscale(str(tmp_path / "out" / outs[0]))
    ref = golden.canny(_syn(64, 128, seed=0), 1.0, 30, 90).astype(np.uint8)
    np.testing.assert_array_equal(edges, ref)


def test_cli_resume_skips_completed_batches(tmp_path):
    """VERDICT r2 item 5: a killed-and-restarted CLI streaming run resumes
    from the cursor and skips completed batches.

    Run 1 processes the first 6 frames (3 batches) with --resume; run 2
    sees the full 12-frame stream and must skip those 3 batches, producing
    only the remaining outputs at the correct global indices."""
    import json as _json

    out_dir = str(tmp_path / "out")
    base = ["synthetic:24x32x12", "1.0", "40", "160", "--backend", "golden",
            "--batch", "2", "--out-dir", out_dir, "--resume", "--json"]
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(base[:1] + ["--max-frames", "6"] + base[1:])
    assert rc == 0
    s1 = _json.loads(buf.getvalue())
    assert s1["frames"] == 6 and s1["skipped_batches"] == 0
    done = sorted(os.listdir(out_dir))
    assert [f for f in done if f.endswith(".png")] == [
        f"edges_{i:06d}.png" for i in range(6)]

    # "restart": same command, full stream
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(base)
    assert rc == 0
    s2 = _json.loads(buf.getvalue())
    assert s2["skipped_batches"] == 3
    assert s2["frames"] == 6  # only the remaining frames were processed
    pngs = sorted(f for f in os.listdir(out_dir) if f.endswith(".png"))
    assert pngs == [f"edges_{i:06d}.png" for i in range(12)]


def test_cli_prefetch_and_config(tmp_path):
    """--prefetch threads through CannyConfig into the streaming engine;
    the config block is embedded in --json output."""
    import contextlib
    import io as _io
    import json as _json

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["synthetic:24x32x4", "1.0", "40", "160",
                       "--backend", "golden", "--batch", "2",
                       "--prefetch", "3", "--out-dir",
                       str(tmp_path / "o"), "--json"])
    assert rc == 0
    stats = _json.loads(buf.getvalue())
    assert stats["config"]["prefetch_depth"] == 3
    assert stats["config"]["backend"] == "golden"
    assert stats["frames"] == 4


def test_cli_raw8_native_feeder(tmp_path):
    """raw8:PATH:HxW input sources frames through the C++ feeder."""
    from canny_edge_tpu import runtime

    if not runtime.available():
        pytest.skip("native feeder unavailable")
    h, w, n = 16, 24, 5
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    raw = str(tmp_path / "frames.raw")
    frames.tofile(raw)
    out_dir = str(tmp_path / "out")
    rc = cli_main([f"raw8:{raw}:{h}x{w}x{n}", "1.0", "40", "160",
                   "--backend", "golden", "--batch", "2",
                   "--out-dir", out_dir])
    assert rc == 0
    pngs = sorted(f for f in os.listdir(out_dir) if f.endswith(".png"))
    assert len(pngs) == n
    # bit-exact vs golden on the first frame
    sm = golden.gaussian_blur(frames[0], 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    ref = golden.hysteresis(nm, 40, 160)
    got = imageio.load_grayscale(os.path.join(out_dir, pngs[0]))
    np.testing.assert_array_equal(got.astype(np.int16), ref)


def test_cli_pgm_dir_native_feeder(tmp_path):
    """A directory of PGMs with --native-feeder streams through the C++
    feeder (MODE_PGM_DIR)."""
    from canny_edge_tpu import runtime

    if not runtime.available():
        pytest.skip("native feeder unavailable")
    h, w, n = 16, 24, 3
    rng = np.random.default_rng(1)
    src = tmp_path / "pgms"
    src.mkdir()
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    for i, f in enumerate(frames):
        with open(src / f"frame_{i:06d}.pgm", "wb") as fh:
            fh.write(f"P5\n{w} {h}\n255\n".encode())
            fh.write(f.tobytes())
    out_dir = str(tmp_path / "out")
    rc = cli_main([str(src), "1.0", "40", "160", "--backend", "golden",
                   "--native-feeder", "--out-dir", out_dir])
    assert rc == 0
    pngs = sorted(f for f in os.listdir(out_dir) if f.endswith(".png"))
    assert len(pngs) == n
    sm = golden.gaussian_blur(frames[0], 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    got = imageio.load_grayscale(os.path.join(out_dir, pngs[0]))
    np.testing.assert_array_equal(got.astype(np.int16),
                                  golden.hysteresis(nm, 40, 160))


def test_cli_pgm_dir_corrupt_frame_exits_nonzero(tmp_path, capsys):
    """A corrupt PGM mid-sequence must NOT look like a complete run: the
    CLI exits nonzero, reports the unreadable-frame count on stderr, and
    surfaces the feeder counters in --json (VERDICT r3 missing #3)."""
    from canny_edge_tpu import runtime

    if not runtime.available():
        pytest.skip("native feeder unavailable")
    h, w = 16, 24
    rng = np.random.default_rng(2)
    src = tmp_path / "pgms"
    src.mkdir()
    with open(src / "frame_000000.pgm", "wb") as fh:
        fh.write(f"P5\n{w} {h}\n255\n".encode())
        fh.write(rng.integers(0, 256, size=(h, w), dtype=np.uint8).tobytes())
    (src / "frame_000001.pgm").write_bytes(b"P6 not actually a pgm")
    out_dir = str(tmp_path / "out")
    rc = cli_main([str(src), "1.0", "40", "160", "--backend", "golden",
                   "--native-feeder", "--out-dir", out_dir, "--json"])
    assert rc == 3
    captured = capsys.readouterr()
    stats = json.loads(captured.out)
    assert stats["feeder"]["read_errors"] == 1
    assert stats["frames"] == 1
    assert "1 unreadable frame(s)" in captured.err


def test_cli_raw8_truncated_exits_nonzero(tmp_path, capsys):
    """A raw8 stream ending mid-frame is a truncated source, not a clean
    EOF: read_errors counts it and the CLI fails loudly."""
    from canny_edge_tpu import runtime

    if not runtime.available():
        pytest.skip("native feeder unavailable")
    h, w = 16, 24
    rng = np.random.default_rng(3)
    raw = tmp_path / "frames.raw8"
    data = rng.integers(0, 256, size=(2, h, w), dtype=np.uint8).tobytes()
    raw.write_bytes(data[:len(data) - 100])  # second frame truncated
    out_dir = str(tmp_path / "out")
    rc = cli_main([f"raw8:{raw}:{h}x{w}", "1.0", "40", "160",
                   "--backend", "golden", "--out-dir", out_dir, "--json"])
    assert rc == 3
    captured = capsys.readouterr()
    stats = json.loads(captured.out)
    assert stats["feeder"]["read_errors"] == 1
    assert stats["frames"] == 1


def test_cli_native_feeder_stats_in_json(tmp_path, capsys):
    """A clean native-feeder run reports its counters in --json."""
    from canny_edge_tpu import runtime

    if not runtime.available():
        pytest.skip("native feeder unavailable")
    out_dir = str(tmp_path / "out")
    rc = cli_main(["synthetic:16x24x3", "1.0", "40", "160",
                   "--backend", "golden", "--native-feeder",
                   "--out-dir", out_dir, "--json"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["feeder"]["read_errors"] == 0
    assert stats["feeder"]["produced"] == 3


def test_cli_packed_transfer(tmp_path, test_image):
    """--packed-transfer: device returns bitmasks, host expands; output
    PNGs are identical to the default path."""
    import cv2

    src = str(tmp_path / "in.png")
    cv2.imwrite(src, test_image)
    out = str(tmp_path / "edges_packed.png")
    rc = cli_main([src, "1.0", "50", "150", "-o", out,
                   "--out-dir", str(tmp_path), "--packed-transfer"])
    assert rc == 0
    edges = imageio.load_grayscale(out)
    ref = golden.canny(test_image, 1.0, 50, 150).astype(np.uint8)
    np.testing.assert_array_equal(edges, ref)


@pytest.mark.parametrize("argv,msg", [
    (["synthetic:16x16", "1.0", "50", "150", "--packed-transfer",
      "--backend", "golden"], "packed-transfer"),
    (["synthetic:16x16", "1.0", "50", "150", "--packed-transfer",
      "--backend", "sharded"], "packed-transfer"),
])
def test_cli_packed_transfer_validation(argv, msg):
    with pytest.raises(SystemExit) as e:
        cli_main(argv)
    assert msg in str(e.value)
