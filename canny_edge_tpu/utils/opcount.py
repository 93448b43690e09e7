"""Op counting from compiled HLO — the roofline's source of truth.

Round 2's roofline carried hand-counted ops/px constants that drifted from
the code (VERDICT r2 weak #7).  This module counts what the compiler
actually emits: walk the optimized HLO of a compiled program and bucket
every instruction's per-pixel element count.

Buckets:
  * alu      — elementwise arithmetic/logic/compare/select: the compute
               floor's currency
  * convert  — dtype converts + bitcasts (cheap, often free)
  * movement — copy/transpose/reshape/slice/pad/broadcast/...: relayout
               and materialization work a pure-ALU model ignores (much of
               it fuses into addressing, so it is reported separately,
               not added to the ALU floor)
  * reduce   — reductions (bit-packing's 32->1 sums, stats)

Used by bench.py to derive the frontend's compute floor from the very
program being measured (benchmarks/exp_hlo_audit.py is the standalone
version with commentary).
"""

from __future__ import annotations

import re
from collections import defaultdict

ALU = {
    "add", "subtract", "multiply", "divide", "maximum", "minimum",
    "and", "or", "xor", "not", "select", "compare", "abs", "negate",
    "floor", "ceil", "round-nearest-afz", "round-nearest-even", "sqrt",
    "rsqrt", "power", "shift-left", "shift-right-logical",
    "shift-right-arithmetic", "clamp", "sign", "remainder", "exponential",
}
CONVERT = {"convert", "bitcast-convert", "bitcast"}
MOVEMENT = {"copy", "transpose", "reshape", "slice", "pad", "concatenate",
            "dynamic-update-slice", "dynamic-slice", "reverse",
            "gather", "scatter", "broadcast", "iota"}
REDUCE = {"reduce", "reduce-window"}
SKIP = {"parameter", "constant", "get-tuple-element", "tuple", "fusion",
        "call", "while", "conditional", "custom-call"}

_SHAPE = re.compile(r"=\s*(?:\()?\s*([a-z0-9]+)\[([0-9,]*)\]")
_OP = re.compile(r"\]\S*\s+([a-z0-9-]+)\(")


def audit_hlo_text(txt: str, pixels: int) -> dict:
    """Bucketed per-pixel op counts from optimized HLO text."""
    per = defaultdict(float)
    by_op = defaultdict(float)
    for line in txt.splitlines():
        m = _SHAPE.search(line)
        if not m:
            continue
        dims = m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        mo = _OP.search(line)
        if not mo:
            continue
        op = mo.group(1)
        if op in SKIP:
            continue
        opp = n / pixels
        by_op[op] += opp
        if op in ALU:
            per["alu"] += opp
        elif op in CONVERT:
            per["convert"] += opp
        elif op in MOVEMENT:
            per["movement"] += opp
        elif op in REDUCE:
            per["reduce"] += opp
        else:
            per["other"] += opp
    return {"buckets": {k: round(v, 2) for k, v in sorted(per.items())},
            "top_ops": dict(sorted(((k, round(v, 2))
                                    for k, v in by_op.items()),
                                   key=lambda kv: -kv[1])[:20])}


_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8}


def hbm_materialization_bytes(txt: str, pixels: int) -> dict:
    """Actual HBM write traffic per pixel: bytes produced by every
    top-level (ENTRY) instruction of the optimized HLO.

    Each ENTRY-computation instruction that is not a parameter/constant
    materializes its result in HBM (fusion internals stay in registers /
    VMEM).  The roofline's memory floor assumes perfect fusion (inputs
    read once + outputs written once); this measures how far the actual
    fusion decomposition is from that — if materialized bytes dominate,
    the stage is HBM-bound in practice regardless of its ALU count.
    """
    in_entry = False
    write_b = 0.0
    n_insts = 0
    for line in txt.splitlines():
        ls = line.strip()
        if ls.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ls.startswith("}"):
            in_entry = False
            continue
        if not in_entry:
            continue
        m = _SHAPE.search(ls)
        mo = _OP.search(ls)
        if not m or not mo:
            continue
        if mo.group(1) in ("parameter", "constant", "get-tuple-element",
                          "tuple", "bitcast"):
            continue
        n = 1
        if m.group(2):
            for d in m.group(2).split(","):
                n *= int(d)
        write_b += n * _DTYPE_BYTES.get(m.group(1), 4)
        n_insts += 1
    return {"hbm_write_bytes_per_px": round(write_b / pixels, 2),
            "entry_instructions": n_insts}


def audit_compiled(fn, *args, pixels: int) -> dict:
    """Audit a jittable fn's optimized HLO (compiles it if not cached)."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    txt = compiled.as_text()
    rep = audit_hlo_text(txt, pixels)
    rep.update(hbm_materialization_bytes(txt, pixels))
    return rep
