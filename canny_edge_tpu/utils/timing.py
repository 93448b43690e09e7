"""Per-stage timing + throughput instrumentation.

The reference's observability is a single ``chrono`` wall-clock print
(src/utils.cpp:435,488-489) and external nvprof screenshots (README.md:50-71).
Here: a proper harness — per-stage wall times via ``block_until_ready``,
steady-state chained-iteration throughput that excludes host dispatch, and
structured stats suitable for logs/JSON.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class StageStats:
    name: str
    ms: float
    mps: float  # megapixels/sec


@dataclass
class PipelineReport:
    image_shape: tuple
    stages: list[StageStats] = field(default_factory=list)
    total_ms: float = 0.0
    total_mps: float = 0.0
    protocol: str = "slope"
    prefix_ms: list[float] = field(default_factory=list)

    def table(self) -> str:
        lines = [f"{'stage':<12}{'ms':>10}{'MP/s':>12}   [{self.protocol}]"]
        for s in self.stages:
            lines.append(f"{s.name:<12}{s.ms:>10.3f}{s.mps:>12.0f}")
        lines.append(f"{'TOTAL':<12}{self.total_ms:>10.3f}{self.total_mps:>12.0f}")
        return "\n".join(lines)

    def json(self) -> dict:
        return {
            "image_shape": list(self.image_shape),
            "stages": [vars(s) for s in self.stages],
            "total_ms": self.total_ms,
            "total_mps": self.total_mps,
            "protocol": self.protocol,
            "prefix_ms": self.prefix_ms,
        }


def _time_call(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall seconds per call, post-warmup, block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile_stages(img: np.ndarray, sigma: float, min_val: int, max_val: int,
                   iters: int = 10, protocol: str = "slope") -> PipelineReport:
    """Per-stage timing of the single-chip XLA pipeline on the default device.

    ``protocol="slope"`` (default): each stage is the *marginal* cost of
    appending it to the jitted pipeline prefix — four prefix programs
    (blur / +sobel / +nms / +hysteresis), each measured with the
    checksum-slope protocol, which is the only timing DESIGN.md §4 trusts
    in this environment (``block_until_ready`` wall times suffer execution
    elision and a slow host link).  Marginal-prefix numbers also reflect
    what a stage costs *inside the fused production program*, rather than
    the cost of a stage jitted in isolation with its own HBM round trips.

    ``protocol="wall"``: the legacy per-stage ``block_until_ready`` wall
    timing (separately jitted stages); reported as ``wall-untrusted``.
    """
    from ..golden.reference import gaussian_kernel
    from ..ops import stages as S
    from ..ops.packed import hysteresis_packed

    kernel_vals = tuple(float(v) for v in gaussian_kernel(sigma))
    dev_img = jax.device_put(img)
    mp = img.shape[-2] * img.shape[-1] / 1e6
    mn, mx = jnp.int32(min_val), jnp.int32(max_val)

    if protocol == "slope":
        blur = functools.partial(S._gaussian_blur_with_kernel,
                                 kernel_vals=kernel_vals)

        def p_blur(x, a, b):
            return blur(x)

        def p_sobel(x, a, b):
            mag, ang = S.sobel(blur(x))
            return mag + ang.astype(mag.dtype)  # keep the angle path live

        def p_nms(x, a, b):
            return S.nonmax_suppression(*S.sobel(blur(x)))

        def p_full(x, a, b):
            return hysteresis_packed(
                S.nonmax_suppression(*S.sobel(blur(x))), a, b)

        # Chain sizing: on accelerators use the pixel-planned lengths
        # (wall estimates are exactly what this protocol distrusts — a
        # dispatch-dominated estimate undershoots k2 and the slope drowns
        # in jitter); on CPU wall times are honest, so size from one call
        # to keep the CLI run ~seconds.
        if jax.devices()[0].platform == "cpu":
            full_jit = jax.jit(p_full)
            jax.block_until_ready(full_jit(dev_img, mn, mx))
            t0 = time.perf_counter()
            jax.block_until_ready(full_jit(dev_img, mn, mx))
            est = max(time.perf_counter() - t0, 1e-5)
            k2 = int(min(4000, max(20, 0.5 / est)))
            k1 = max(2, k2 // 20)
        else:
            k1, k2 = auto_chain_lengths(int(np.prod(img.shape)))

        names = ("gaussian", "sobel", "nms", "hysteresis")
        prefix_sec = []
        for fn in (p_blur, p_sobel, p_nms, p_full):
            prefix_sec.append(checksum_slope_seconds(
                fn, dev_img, k1=k1, k2=k2, samples=3,
                min_val=min_val, max_val=max_val))
        report = PipelineReport(image_shape=tuple(img.shape),
                                protocol="slope",
                                prefix_ms=[round(s * 1e3, 4)
                                           for s in prefix_sec])
        prev = 0.0
        for name, sec in zip(names, prefix_sec):
            marg = max(sec - prev, 1e-9)
            report.stages.append(StageStats(name, marg * 1e3, mp / marg))
            prev = sec
        report.total_ms = prefix_sec[-1] * 1e3
        report.total_mps = mp / prefix_sec[-1]
        return report

    blur = jax.jit(functools.partial(S._gaussian_blur_with_kernel,
                                     kernel_vals=kernel_vals))
    sob = jax.jit(S.sobel)
    nms = jax.jit(S.nonmax_suppression)
    hyst = jax.jit(hysteresis_packed)  # the production hysteresis engine

    sm = blur(dev_img)
    mag, ang = sob(sm)
    nm = nms(mag, ang)

    report = PipelineReport(image_shape=tuple(img.shape),
                            protocol="wall-untrusted")
    for name, fn, args in [
        ("gaussian", blur, (dev_img,)),
        ("sobel", sob, (sm,)),
        ("nms", nms, (mag, ang)),
        ("hysteresis", hyst, (nm, mn, mx)),
    ]:
        sec = _time_call(fn, *args, iters=iters)
        report.stages.append(StageStats(name, sec * 1e3, mp / sec))

    report.total_ms = sum(s.ms for s in report.stages)
    report.total_mps = mp / (report.total_ms / 1e3)
    return report


def auto_chain_lengths(pixels: int) -> tuple[int, int]:
    """Chain lengths targeting ~1.5 s of device time for the long chain.

    Slope noise is (dispatch+readback jitter) / (k2 - k1), so long chains
    are what make sub-millisecond kernels resolvable: measured spread fell
    from +-50% at k2=20 to +-0.5% at k2=2100 for a 0.3 ms pipeline on the
    v5e tunnel.  Sized from a ~6 GP/s planning throughput; clamped so huge
    inputs (batched 4K) stay under a few seconds per call.
    """
    # ~6 GP/s planning throughput => ~1.7e-10 s/pixel.  (A round-1 typo had
    # 1.7e-13 here, which sent every input to the k2=4000 cap; for a
    # 64x1080p batch that is a single ~90 s device program, which the
    # worker watchdog kills — observed as "TPU worker process crashed".)
    per_iter = max(pixels, 1) * 1.7e-10
    k2 = int(min(4000, max(40, 1.5 / per_iter)))
    return max(4, k2 // 20), k2


def checksum_slope_seconds(pipe_fn, img: np.ndarray, *, k1: int | None = None,
                           k2: int | None = None, samples: int = 3,
                           min_val: int = 30, max_val: int = 90,
                           return_samples: bool = False):
    """Per-frame seconds via the checksum-slope protocol.

    Robust on environments where host<->device transfer is slow and
    repeated identical executions may be elided: frames are derived
    on-device in a data-dependent chain (each perturbed by the previous
    result's checksum), timing ends at np.asarray() of a 4-byte checksum,
    and the per-frame time is the slope between two chain lengths
    (cancelling fixed dispatch/readback overhead).  ``pipe_fn(img, mn, mx)``
    must map uint8 (H, W) -> int array.

    The chain length is a *traced* argument, so both lengths (and every
    sample) share one compiled program; defaults come from
    :func:`auto_chain_lengths`.

    ``img`` may be a host ndarray (device_put onto the default device) or an
    already-placed ``jax.Array`` — e.g. a mesh-sharded batch — which is used
    as-is, preserving its sharding (benchmarks/weak_scaling.py).
    """
    import jax
    import jax.numpy as jnp

    if k1 is None or k2 is None:
        a1, a2 = auto_chain_lengths(int(np.prod(img.shape)))
        k1 = a1 if k1 is None else k1
        k2 = a2 if k2 is None else k2

    @jax.jit
    def run(x0, seed, k):
        def body(i, carry):
            chk, x = carry
            x2 = jnp.roll(x, chk % 17 + i, axis=0) ^ (
                (chk + i) % 5).astype(jnp.uint8)
            out = pipe_fn(x2, jnp.int32(min_val) + (chk % 3),
                          jnp.int32(max_val))
            chk2 = (chk * jnp.int32(16777619)
                    + jnp.sum(out[..., ::97, ::89].astype(jnp.int32))
                    ) & jnp.int32(0x7FFFFFFF)
            return chk2, x
        chk, _ = jax.lax.fori_loop(0, k, body, (seed, x0))
        return chk

    dev = img if isinstance(img, jax.Array) else jax.device_put(img)
    int(np.asarray(run(dev, jnp.int32(1), jnp.int32(k1))))
    int(np.asarray(run(dev, jnp.int32(1), jnp.int32(k2))))
    slopes = []
    for s in range(2, 2 + samples):
        t0 = time.perf_counter()
        c1 = int(np.asarray(run(dev, jnp.int32(s), jnp.int32(k1))))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        c2 = int(np.asarray(run(dev, jnp.int32(s), jnp.int32(k2))))
        t2 = time.perf_counter() - t0
        assert c1 != c2
        slopes.append((t2 - t1) / (k2 - k1))
    if return_samples:
        return [max(float(s), 1e-9) for s in slopes]
    sec = float(np.median(slopes))
    return max(sec, 1e-9)


def throughput_chained(pipe_fn, img: np.ndarray, k: int = 20,
                       repeats: int = 3) -> float:
    """Steady-state frames/sec with K pipeline iterations chained inside one
    jit (host dispatch and transfer excluded; iterations serialized via a
    threshold perturbation so XLA cannot hoist the loop body)."""
    h, w = img.shape[-2], img.shape[-1]

    @jax.jit
    def run_k(x, acc):
        def body(i, carry):
            out = pipe_fn(x, jnp.int32(50) + (i % 2), jnp.int32(150))
            return carry + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, acc)

    dev = jax.device_put(img)
    run_k(dev, jnp.int32(0)).block_until_ready()
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_k(dev, jnp.int32(1)).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / k)
    return 1.0 / best
