"""Worker process for the real 2-process DCN test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; together they form a
("data"=2, "y"=2, "x"=2) global mesh whose data axis crosses the process
boundary (the DCN analog).  The worker builds its host-local batch shard,
assembles the global array, runs the sharded pipeline, verifies its
addressable output shards bit-exactly against the golden oracle, and
exercises aggregate_stats across processes.

Usage: multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

import numpy as np


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    from canny_edge_tpu import golden
    from canny_edge_tpu.io.imageio import synthetic_image
    from canny_edge_tpu.parallel import multihost
    from canny_edge_tpu.parallel.sharded import ShardedCanny
    from canny_edge_tpu.parallel.streaming import StreamStats

    mesh = multihost.global_mesh(data=nproc, y=2, x=2)
    assert mesh.shape["data"] == nproc

    # deterministic global batch, known to every process; odd dims exercise
    # the pad+mask path across the process boundary too
    H, W = 66, 98
    B = 2 * nproc
    imgs = np.stack([synthetic_image(H, W, seed=i) for i in range(B)])

    model = ShardedCanny(mesh, sigma=1.0, image_shape=(H, W))
    padded = np.pad(imgs, ((0, 0), (0, model.Hp - H), (0, model.Wp - W)))
    local = padded[pid * 2:(pid + 1) * 2]   # this host's batch rows
    garr = jax.make_array_from_process_local_data(model._in_sharding, local,
                                                  padded.shape)
    out = model(garr, 30, 90)
    assert out.shape == (B, H, W)

    refs = {}
    checked = 0
    for shard in out.addressable_shards:
        data = np.asarray(shard.data)
        bsl, hsl, wsl = shard.index
        for bi in range(bsl.start or 0, bsl.stop or B):
            if bi not in refs:
                refs[bi] = golden.canny(imgs[bi], 1.0, 30, 90)
            np.testing.assert_array_equal(
                data[bi - (bsl.start or 0)], refs[bi][hsl, wsl])
            checked += 1
    assert checked >= 2, checked

    # cross-host metric aggregation over DCN
    stats = StreamStats(frames=2, batches=1, mp=2 * H * W / 1e6, seconds=1.0)
    agg = multihost.aggregate_stats(stats)
    assert agg["frames"] == 2 * nproc, agg
    assert agg["hosts"] == nproc, agg
    assert abs(agg["mp"] - nproc * 2 * H * W / 1e6) < 1e-9, agg

    print(f"MULTIHOST OK pid={pid} shards_checked={checked} "
          f"agg_frames={agg['frames']}", flush=True)


if __name__ == "__main__":
    main()
