"""Per-stage roofline model: minimum HBM bytes vs achieved throughput.

The Canny stages are stencils — near-zero arithmetic intensity — so the
memory-side speed-of-light on TPU is HBM bandwidth (the reference's nvprof
screenshots, README.md:50-71, measure the same thing on an RTX 2070).  This
module computes each stage's *minimum* HBM traffic (one read of every input
byte + one write of every output byte, assuming perfect fusion of everything
else) and reports the achieved fraction of the bandwidth roofline.

A LOW % of SoL here does not necessarily mean wasted bandwidth: the
bit-exact pipeline is VPU-compute-bound (exact renormalization division,
isqrt and angle predicates cost ~200 integer ops/pixel), so the bandwidth
roofline is an upper bound, not the binding constraint.  The report makes
the gap visible either way, per BASELINE.json's north star.
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
    """Minimum HBM bytes per pixel (read + write) for one stage."""
    name: str
    bytes_per_pixel: float

    def min_seconds(self, pixels: int, bw_gbps: float) -> float:
        return self.bytes_per_pixel * pixels / (bw_gbps * 1e9)


# ---------------------------------------------------------------------------
# Stage traffic models for the production pipelines (round-2 architecture)
# ---------------------------------------------------------------------------
# xla backend: banded XLA front end writes int32 NMS magnitude; bit-packed
# hysteresis reads it once for thresholding and writes int16 output; the
# packed flood state is 1/8 byte/pixel/round (uint32 per 32 pixels, r+w).
XLA_STAGES = [
    StageTraffic("frontend", 1 + 4),          # u8 in, i32 nm out
    StageTraffic("hysteresis", 4 + 2 + 0.5),  # nm in, i16 out, ~2 packed rounds
]

# pallas backend: fused front-end kernel (u8 in, i16 nm out, one pass);
# VMEM-resident packed hysteresis touches HBM only for pack + unpack.
PALLAS_STAGES = [
    StageTraffic("frontend", 1 + 2),          # u8 in, i16 nm out
    StageTraffic("hysteresis", 2 + 2 + 0.25),  # nm in, i16 out, packed masks
]

# fused backend: XLA front end (u8 in, i32 nm out) + Pallas VMEM-resident
# packed hysteresis (nm in for thresholding/packing, i16 out, packed masks
# r+w once around the in-VMEM fixed point).
FUSED_STAGES = [
    StageTraffic("frontend", 1 + 4),
    StageTraffic("hysteresis", 4 + 2 + 0.25),
]

STAGES_BY_BACKEND = {"xla": XLA_STAGES, "pallas": PALLAS_STAGES,
                     "fused": FUSED_STAGES}


def stage_rooflines(pixels: int, measured_seconds: dict[str, float],
                    device_kind: str, backend: str = "xla") -> list[dict]:
    """Machine-readable roofline rows: one dict per measured stage."""
    bw = chip_bandwidth_gbps(device_kind)
    by_name = {s.name: s for s in STAGES_BY_BACKEND.get(backend, XLA_STAGES)}
    rows = []
    for name, sec in measured_seconds.items():
        s = by_name.get(name)
        if s is None or sec <= 0:
            continue
        floor = s.min_seconds(pixels, bw)
        rows.append({
            "stage": name,
            "ms": round(sec * 1e3, 4),
            "min_hbm_bytes_per_px": s.bytes_per_pixel,
            "sol_ms": round(floor * 1e3, 4),
            "pct_of_sol": round(100.0 * floor / sec, 1),
        })
    return rows


def report(pixels: int, measured_seconds: dict[str, float],
           device_kind: str, stages=None, backend: str = "xla") -> str:
    """Text roofline report: stage, min-traffic floor, % of speed-of-light."""
    bw = chip_bandwidth_gbps(device_kind)
    if stages is not None:
        by_name = {s.name: s for s in stages}
    else:
        by_name = {s.name: s
                   for s in STAGES_BY_BACKEND.get(backend, XLA_STAGES)}
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
