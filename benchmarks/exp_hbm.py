"""Round-4 experiment: enumerate and attack the fused frontend's ENTRY-level
HBM materializations (VERDICT r3 weak #1 / next-round item #1).

The round-3 audit (utils/opcount.hbm_materialization_bytes) measured the
compiled 1080p fused-frontend program writing 56.6 B/px across 14 full-size
HBM arrays -- ~0.14 ms of traffic at 819 GB/s, ~80% of the 0.173 ms stage.
This script (a) lists every ENTRY instruction with its byte cost so the
attack targets real arrays, and (b) times candidate restructurings with the
checksum-slope protocol, checking bit-exactness against the golden oracle.

Usage: python - < benchmarks/exp_hbm.py   (from /root/repo, on the TPU env)
"""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from canny_edge_tpu.golden.reference import gaussian_kernel
from canny_edge_tpu.io.imageio import synthetic_image
from canny_edge_tpu.ops.window import frontend_nm_xla
from canny_edge_tpu.utils.opcount import hbm_materialization_bytes
from canny_edge_tpu.utils.timing import checksum_slope_seconds

H, W = 1080, 1920
SIGMA = 1.4
PX = H * W

_SHAPE = re.compile(r"=\s*(?:\()?\s*([a-z0-9]+)\[([0-9,]*)\]")
_OP = re.compile(r"\]\S*\s+([a-z0-9-]+)\(")
_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
          "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8}


def entry_listing(txt: str):
    rows = []
    in_entry = False
    for line in txt.splitlines():
        ls = line.strip()
        if ls.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ls.startswith("}"):
            break
        if not in_entry:
            continue
        m, mo = _SHAPE.search(ls), _OP.search(ls)
        if not m or not mo:
            continue
        op = mo.group(1)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        n = 1
        for d in (m.group(2).split(",") if m.group(2) else []):
            n *= int(d)
        rows.append((n * _BYTES.get(m.group(1), 4), op,
                     f"{m.group(1)}[{m.group(2)}]", ls[:110]))
    return sorted(rows, reverse=True)


def audit(fn, *args, name=""):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    rep = hbm_materialization_bytes(txt, PX)
    print(f"\n=== {name}: {rep['hbm_write_bytes_per_px']} B/px over "
          f"{rep['entry_instructions']} ENTRY instructions ===")
    for b, op, shape, ls in entry_listing(txt)[:24]:
        print(f"  {b / PX:7.3f} B/px  {op:22s} {shape:22s} {ls[:72]}")
    return rep["hbm_write_bytes_per_px"]


def main():
    kv = tuple(float(v) for v in gaussian_kernel(SIGMA))
    img = synthetic_image(H, W)
    dev = jax.device_put(img)
    mn, mx = jnp.int32(30), jnp.int32(90)

    def fe_now(x, a, b):
        return frontend_nm_xla(x, kv, thresholds=(a, b))

    audit(fe_now, dev, mn, mx, name="current fused frontend (packed out)")

    sec = checksum_slope_seconds(
        lambda x, a, b: fe_now(x, a, b)[0], img, samples=3)
    print(f"current frontend: {sec * 1e3:.4f} ms")

    # correctness spot check vs golden oracle
    from canny_edge_tpu.golden import reference as G
    from canny_edge_tpu.models.canny import CannyTPU
    from canny_edge_tpu.ops.packed import unpack_mask

    w_p, s_p = jax.jit(fe_now)(dev, mn, mx)
    nm_g = G.nonmax_suppression(*G.sobel(G.gaussian_blur(img, SIGMA)))
    assert (np.asarray(unpack_mask(w_p, W)) == (nm_g >= 30)).all(), "weak!"
    assert (np.asarray(unpack_mask(s_p, W)) == (nm_g >= 90)).all(), "strong!"
    print("bit-exact vs golden: OK")

    model = CannyTPU(sigma=SIGMA, backend="fused")
    sec = checksum_slope_seconds(
        lambda x, a, b: model._single(x, a, b), img, samples=3)
    print(f"full fused pipeline: {sec * 1e3:.4f} ms "
          f"({PX / sec / 1e6:.0f} MP/s)")


if __name__ == "__main__":
    main()
