"""utils: roofline model, stage profiling, trace helper."""

import numpy as np

from canny_edge_tpu.utils import roofline
from canny_edge_tpu.utils.timing import profile_stages


def test_roofline_report():
    rep = roofline.report(
        pixels=2_073_600,
        measured_seconds={"frontend": 1e-3, "hysteresis": 5e-4},
        device_kind="TPU v5 lite",
    )
    assert "819" in rep and "frontend" in rep
    assert roofline.chip_bandwidth_gbps("TPU v4") == 1200.0
    assert roofline.chip_bandwidth_gbps("unknown") == roofline.DEFAULT_BW
    st = roofline.StageTraffic("x", 10.0, 100.0)
    assert np.isclose(st.mem_seconds(1e6, 1000.0), 1e-5)
    assert np.isclose(st.compute_seconds(1e6, 1e12), 1e-4)


def test_roofline_stage_rows():
    rows = roofline.stage_rooflines(
        2_073_600, {"frontend": 1e-3, "hysteresis": 5e-4},
        "TPU v5 lite", backend="pallas")
    assert {r["stage"] for r in rows} == {"frontend", "hysteresis"}
    for r in rows:
        assert 0 < r["pct_of_sol"] <= 100
        assert r["sol_ms"] < r["ms"] * 1.001
        assert r["bound"] in ("alu", "hbm")
        assert r["sol_ms"] == max(r["mem_sol_ms"], r["compute_sol_ms"])


def test_profile_stages_runs():
    """Default protocol is the checksum-slope marginal-prefix timing (the
    only protocol DESIGN.md §4 trusts — VERDICT r3 weak #7); the legacy
    wall path stays available but self-labels as untrusted."""
    img = np.random.default_rng(0).integers(
        0, 256, (64, 128), dtype=np.uint8)
    rep = profile_stages(img, 1.0, 30, 90)
    names = [s.name for s in rep.stages]
    assert names == ["gaussian", "sobel", "nms", "hysteresis"]
    assert rep.total_ms > 0
    assert rep.protocol == "slope"
    j = rep.json()
    assert j["image_shape"] == [64, 128]
    assert j["protocol"] == "slope"
    assert len(j["prefix_ms"]) == 4
    # prefix times are cumulative; total equals the full-pipeline prefix
    assert abs(rep.total_ms - j["prefix_ms"][-1]) < 1e-3  # prefix_ms rounded
    assert "slope" in rep.table()

    wall = profile_stages(img, 1.0, 30, 90, iters=2, protocol="wall")
    assert wall.protocol == "wall-untrusted"
    assert "untrusted" in wall.table()


def test_trace_helper(tmp_path):
    """Captured-artifact check: the profiler must write a non-empty XPlane
    protobuf (the Perfetto/TensorBoard source format), not just create the
    directory.  Runs on whatever platform the session uses — CPU in CI,
    the real chip under CANNY_TPU_TEST_PLATFORM=tpu."""
    import pathlib

    import jax.numpy as jnp

    from canny_edge_tpu.utils.trace import annotate, trace

    with trace(str(tmp_path / "tr")):
        with annotate("op"):
            jnp.ones(8).sum().block_until_ready()
    planes = list(pathlib.Path(tmp_path / "tr").rglob("*.xplane.pb"))
    assert planes, "no .xplane.pb artifact captured"
    assert all(p.stat().st_size > 0 for p in planes)


def test_hlo_opcount_audit():
    """utils.opcount buckets per-pixel op counts from compiled HLO."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.utils.opcount import audit_compiled

    def f(x):
        return jnp.maximum(x * np.float32(2) + np.float32(1), np.float32(0))

    x = np.zeros((8, 128), np.float32)
    rep = audit_compiled(f, x, pixels=8 * 128)
    alu = rep["buckets"].get("alu", 0)
    # multiply + add + maximum = 3 elementwise ops/px (XLA may fold some,
    # never expand into data movement for this program)
    assert 1 <= alu <= 6, rep
    # the three scalar-constant broadcasts count as movement (they are
    # free in practice, which is why movement is reported, not added to
    # the ALU floor)
    assert rep["buckets"].get("movement", 0) <= 4, rep


def test_roofline_audited_override():
    """stage_rooflines derives the compute floor from the HLO-audited op
    mix when provided — as the two-bucket floor (measured alu + movement
    element rates, exp_opcost_results.json) on chips with measured rates,
    as audited-alu at the paper VPU rate otherwise — and embeds the bucket
    breakdown in the row."""
    from canny_edge_tpu.utils.roofline import (MEASURED_ELEM_RATES,
                                               stage_rooflines)

    audited = {"frontend": {"buckets": {"alu": 140.0, "movement": 90.0}}}
    rows = stage_rooflines(1_000_000, {"frontend": 1e-3}, "TPU v5 lite",
                           backend="fused", audited_ops=audited)
    (row,) = rows
    assert row["floor_model"] == "two_bucket_measured_rates"
    assert row["hlo_audit"]["alu"] == 140.0
    rates = MEASURED_ELEM_RATES["TPU v5 lite"]
    expect_ms = (140.0 * 1_000_000 / rates["alu"]
                 + 90.0 * 1_000_000 / rates["movement"]) * 1e3
    assert abs(row["compute_sol_ms"] - round(expect_ms, 4)) < 1e-6
    assert row["elem_rates_TopsS"]["alu"] == round(rates["alu"] / 1e12, 3)
    # chip with no measured rates: audited-alu floor at the paper VPU rate
    (rowv4,) = stage_rooflines(1_000_000, {"frontend": 1e-3}, "TPU v4",
                               backend="fused", audited_ops=audited)
    assert rowv4["floor_model"] == "hlo_audit_alu"
    expect_v4 = 140.0 * 1_000_000 / 4.3e12 * 1e3
    assert abs(rowv4["compute_sol_ms"] - round(expect_v4, 4)) < 1e-6
    # without the audit the hand model is used and no audit block appears
    (row2,) = stage_rooflines(1_000_000, {"frontend": 1e-3}, "TPU v5 lite",
                              backend="fused")
    assert "hlo_audit" not in row2 and row2["est_ops_per_px"] == 110
    assert row2["floor_model"] == "hand_modeled_alu"


def test_bench_hysteresis_audit_composition():
    """bench._audit_hysteresis: the flood kernel's round body audits
    standalone and composes with a runtime-measured trip count — the
    machinery that replaced the hand-modeled hysteresis floor
    (VERDICT r4 weak #6).  Small shape, CPU."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    from bench import _audit_hysteresis, make_image
    from canny_edge_tpu.golden.reference import gaussian_kernel

    kv = tuple(float(v) for v in gaussian_kernel(1.4))
    img = jax.device_put(make_image(128, 256))
    aud = _audit_hysteresis(img, kv, 128, 256)
    # a synthetic textured frame reaches its fixed point in >= 2 trips,
    # and the composed buckets must contain real alu + movement work
    assert aud["while_trips"] >= 2
    assert aud["buckets"]["alu"] > 1.0
    assert aud["buckets"]["movement"] > 0.5
    assert aud["composition"].startswith("trips*")
    # and it must plug into the two-bucket roofline
    from canny_edge_tpu.utils.roofline import stage_rooflines

    (row,) = stage_rooflines(128 * 256, {"hysteresis": 1e-5},
                             "TPU v5 lite", backend="fused",
                             audited_ops={"hysteresis": aud})
    assert row["floor_model"] == "two_bucket_measured_rates"
    assert row["sol_ms"] > 0
