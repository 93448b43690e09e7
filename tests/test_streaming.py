"""Streaming executor tests: prefetch overlap, cursor resume, host sharding."""

import numpy as np
import pytest

from canny_edge_tpu import golden
from canny_edge_tpu.config import CannyConfig
from canny_edge_tpu.io.video import frames_synthetic
from canny_edge_tpu.models import CannyTPU
from canny_edge_tpu.parallel.streaming import (StreamCursor, StreamingRunner)


def make_runner(model, mn, mx, **kw):
    import jax.numpy as jnp

    return StreamingRunner(
        lambda b: model._batched(b, jnp.int32(mn), jnp.int32(mx)), **kw)


def test_stream_end_to_end_matches_golden():
    model = CannyTPU(sigma=1.0)
    frames = list(frames_synthetic(64, 128, 7, seed=3))
    results = {}
    runner = make_runner(model, 30, 90, batch_size=2)
    stats = runner.run(iter(frames), lambda bi, r: results.update({bi: r}))
    assert stats.batches == 4 and stats.frames == 7  # padding not counted
    got = np.concatenate([results[i] for i in range(4)])[:7]
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(got[i], golden.canny(f, 1.0, 30, 90))


def test_cursor_resume(tmp_path):
    model = CannyTPU(sigma=1.0)
    cpath = str(tmp_path / "cursor.json")
    frames = list(frames_synthetic(32, 128, 8, seed=1))

    seen_first = []
    r1 = make_runner(model, 30, 90, batch_size=2,
                     cursor=StreamCursor(cpath))
    r1.run(iter(frames[:4]), lambda bi, r: seen_first.append(bi))
    assert seen_first == [0, 1]

    # restart: same stream, cursor skips completed batches
    seen_second = []
    r2 = make_runner(model, 30, 90, batch_size=2,
                     cursor=StreamCursor(cpath))
    stats = r2.run(iter(frames), lambda bi, r: seen_second.append(bi))
    assert seen_second == [2, 3]
    assert stats.skipped_batches == 2


def test_host_sharding_partitions_stream():
    model = CannyTPU(sigma=1.0)
    frames = list(frames_synthetic(32, 128, 10, seed=2))
    per_host = {}
    for host in range(2):
        outs = []
        runner = make_runner(model, 30, 90, batch_size=1,
                             host_id=host, num_hosts=2)
        runner.run(iter(frames), lambda bi, r: outs.append(r[0]))
        per_host[host] = outs
    assert len(per_host[0]) == 5 and len(per_host[1]) == 5
    # host 0 got even frames, host 1 odd
    np.testing.assert_array_equal(
        per_host[1][0], np.asarray(golden.canny(frames[1], 1.0, 30, 90)))


def test_config_validation():
    CannyConfig()
    with pytest.raises(ValueError):
        CannyConfig(min_val=200, max_val=100)
    with pytest.raises(ValueError):
        CannyConfig(backend="cuda")
    with pytest.raises(ValueError):
        CannyConfig(sigma=0)
    d = CannyConfig(sigma=2.0).to_dict()
    assert d["sigma"] == 2.0


def test_multihost_single_process_degenerate():
    """Single-host: initialize is a no-op, mesh covers local devices,
    stats aggregation returns the local dict."""
    import jax

    from canny_edge_tpu.parallel import multihost
    from canny_edge_tpu.parallel.streaming import StreamStats

    pid, n = multihost.initialize()
    assert (pid, n) == (0, 1)
    ndev = len(jax.devices())
    y = 2 if ndev >= 8 else 1
    x = ndev // y
    mesh = multihost.global_mesh(data=1, y=y, x=x)
    assert dict(mesh.shape) == {"data": 1, "y": y, "x": x}
    cfg = multihost.host_local_stream_config(8)
    assert cfg.num_hosts == 1 and cfg.batch_size == 8
    s = StreamStats(frames=10, batches=5, seconds=2.0, mp=1.0)
    agg = multihost.aggregate_stats(s)
    assert agg["frames"] == 10


def test_stream_failure_mid_batch_leaves_resumable_cursor(tmp_path):
    """A crash mid-stream must leave the cursor at the last completed batch
    so a restart reprocesses only unfinished work."""
    import jax.numpy as jnp

    model = CannyTPU(sigma=1.0)
    cpath = str(tmp_path / "cursor.json")
    frames = list(frames_synthetic(32, 128, 8, seed=4))

    boom = {"count": 0}

    def exploding_sink(bi, r):
        boom["count"] += 1
        if boom["count"] == 2:
            raise RuntimeError("injected failure")

    r1 = make_runner(model, 30, 90, batch_size=2,
                     cursor=StreamCursor(cpath))
    with pytest.raises(RuntimeError):
        r1.run(iter(frames), exploding_sink)
    # batch 0 completed; batch 1's sink failed before cursor advance
    assert StreamCursor(cpath).completed == 0

    done = []
    r2 = make_runner(model, 30, 90, batch_size=2,
                     cursor=StreamCursor(cpath))
    r2.run(iter(frames), lambda bi, r: done.append(bi))
    assert done == [1, 2, 3]
