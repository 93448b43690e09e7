"""HLO op-count audit of the production frontend vs the roofline model.

VERDICT r2 weak #1: the fused frontend measures ~34% of its modeled
compute speed-of-light (110 ops/px at peak VPU issue).  Before trusting
either number, count what the compiler actually emits: walk the
*optimized* HLO of the compiled frontend program and bucket every
instruction's per-pixel op count.

    python benchmarks/exp_hlo_audit.py            # 1080p sigma=1.4

Buckets:
  * alu        — elementwise arithmetic/logic/compare/select (the roofline
                 model's currency)
  * convert    — dtype converts + bitcasts (often free or cheap)
  * movement   — copy / transpose / reshape / slice / pad / concatenate /
                 dynamic-update-slice: relayout + materialization traffic
                 the op model does NOT count
  * reduce     — reductions (packing's 32->1 sum, checksums)
  * other      — everything else with nontrivial element counts

The per-pixel ALU count vs the 110-op model gives the real multiplier;
the movement bucket quantifies how much of the "3x above floor" is data
motion rather than missing ALU work.
"""

from __future__ import annotations

import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
for p in (_here, os.path.dirname(_here)):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np

from profile_components import enable_compile_cache, make_image  # noqa: E402

from canny_edge_tpu.utils.opcount import audit_hlo_text  # noqa: E402

def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops.window import frontend_nm_xla
    from canny_edge_tpu.utils.roofline import STAGES_BY_BACKEND

    H = int(os.environ.get("AUDIT_H", "1080"))
    W = int(os.environ.get("AUDIT_W", "1920"))
    sigma = 1.4
    kv = tuple(float(v) for v in gaussian_kernel(sigma))
    img = make_image(H, W)

    def fe(x, mn, mx):
        w, s = frontend_nm_xla(x, kv, thresholds=(mn, mx))
        return w + s

    lowered = jax.jit(fe).lower(img, jnp.int32(30), jnp.int32(90))
    compiled = lowered.compile()
    txt = compiled.as_text()
    report = audit_hlo_text(txt, H * W)
    model = [s for s in STAGES_BY_BACKEND["fused"] if s.name == "frontend"][0]
    report["model_ops_per_px"] = model.ops_per_pixel
    report["alu_vs_model"] = round(report["buckets"].get("alu", 0)
                                   / model.ops_per_pixel, 2)
    report["shape"] = [H, W]
    report["device"] = jax.devices()[0].device_kind
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
