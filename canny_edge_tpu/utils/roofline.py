"""Per-stage roofline model: bytes moved vs achieved throughput.

The Canny stages are stencils — essentially zero arithmetic intensity — so
the speed-of-light on TPU is HBM bandwidth (the nvprof screenshots the
reference publishes, README.md:50-71, measure exactly this on an RTX 2070).
This module computes each stage's minimum HBM traffic and reports achieved
fraction of the bandwidth roofline.
"""

from __future__ import annotations

from dataclasses import dataclass

# Published peak HBM bandwidth per chip generation (GB/s)
HBM_BW_GBPS = {
    "TPU v4": 1200.0,
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5": 2765.0,       # v5p
    "TPU v6 lite": 1640.0,  # v6e (Trillium)
}
DEFAULT_BW = 819.0


def chip_bandwidth_gbps(device_kind: str) -> float:
    for k, v in HBM_BW_GBPS.items():
        if device_kind.startswith(k):
            return v
    return DEFAULT_BW


@dataclass
class StageTraffic:
    """Minimum HBM bytes per pixel for each stage (read + write)."""
    name: str
    bytes_per_pixel: float

    def min_seconds(self, pixels: int, bw_gbps: float) -> float:
        return self.bytes_per_pixel * pixels / (bw_gbps * 1e9)


# XLA path: each stage materializes its outputs to HBM
XLA_STAGES = [
    StageTraffic("gaussian", 1 + 4 + 4 + 2),       # u8 in, f32 temp rw, i16 out
    StageTraffic("sobel", 2 + 4 + 2),              # i16 in, i32 mag, i16 ang
    StageTraffic("nms", 4 + 2 + 2),                # mag+ang in, i16 out
    StageTraffic("hysteresis", 1 + 1),             # i8 state rw per sweep
]

# Pallas fused path: one read + one write per pixel for the front end
PALLAS_STAGES = [
    StageTraffic("frontend(fused)", 1 + 2),        # u8 in, i16 nm out
    StageTraffic("hysteresis/sweep", 1 + 1 + 1),   # weak + state in, state out
]


def report(pixels: int, measured_seconds: dict[str, float],
           device_kind: str, stages=None) -> str:
    """Text roofline report: stage, achieved GB/s-equivalent, % of peak."""
    bw = chip_bandwidth_gbps(device_kind)
    stages = stages if stages is not None else XLA_STAGES
    by_name = {s.name: s for s in stages}
    lines = [f"roofline vs {device_kind} @ {bw:.0f} GB/s HBM",
             f"{'stage':<18}{'ms':>9}{'min ms':>9}{'% of SoL':>10}"]
    for name, sec in measured_seconds.items():
        s = by_name.get(name)
        if s is None:
            continue
        floor = s.min_seconds(pixels, bw)
        pct = 100.0 * floor / sec if sec > 0 else 0.0
        lines.append(f"{name:<18}{sec * 1e3:>9.3f}{floor * 1e3:>9.3f}"
                     f"{pct:>9.1f}%")
    return "\n".join(lines)
