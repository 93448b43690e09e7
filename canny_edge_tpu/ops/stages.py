"""The four Canny stages as pure jnp ops (single-chip XLA path).

Bit-exact against canny_edge_tpu.golden (and hence against the reference CPU
semantics, src/utils.cpp).  These ops are the correctness backbone; the
Pallas kernels in canny_edge_tpu.kernels are drop-in faster equivalents and
are tested against these.

Exactness notes:
* Float32 accumulation order matches the reference's sequential tap loop;
  masked out-of-bounds taps contribute +0.0 which is an IEEE no-op, so the
  vectorized sums are bit-identical to the scalar loops (verified on TPU
  hardware: XLA does not contract mul+add into FMA nor reassociate sums of
  distinct operands).
* Division/sqrt/atan2 use the exact primitives in ops.numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.reference import gaussian_kernel
from .numerics import (exact_div_by_vector, isqrt_int32, mul_const_f32,
                       quantize_angle_int)
from .shifts import (clamp_shift_cols, clamp_shift_rows, shift2d, shift_cols,
                     shift_rows)

EDGE = 255
NOEDGE = 0
_NMS_OOB = -32768  # below any magnitude: out-of-bounds neighbors never suppress


# ---------------------------------------------------------------------------
# Stage 1: separable renormalized Gaussian blur (src/utils.cpp:26-68)
# ---------------------------------------------------------------------------

def gaussian_blur(img, sigma: float):
    """uint8 (..., H, W) -> int16, bit-exact vs golden.gaussian_blur.

    ``sigma`` is static (Python float): the window size and the float32
    weights are computed on the host with the golden NumPy routine, so the
    TPU path and the oracle share identical weights by construction.
    """
    kernel = gaussian_kernel(sigma)  # host numpy float32
    return _gaussian_blur_with_kernel(img, tuple(float(v) for v in kernel))


@functools.partial(jax.jit, static_argnums=(1,))
def _gaussian_blur_with_kernel(img, kernel_vals):
    kernel = np.asarray(kernel_vals, np.float32)
    window = kernel.shape[0]
    center = window // 2
    h, w = img.shape[-2], img.shape[-1]
    x = img.astype(jnp.float32)

    # x pass: accumulate taps in ascending order; count depends only on the
    # column index, so it is computed as a (1, w) row and broadcast.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    acc = jnp.zeros_like(x)
    cnt = jnp.zeros((1, w), jnp.float32)
    for t in range(window):
        off = t - center
        # mul_const_f32: product rounding done in integer arithmetic so
        # compiler FMA contraction cannot change the accumulation (see
        # ops.numerics); the adds themselves are contraction-proof pure fadds
        acc = acc + mul_const_f32(shift_cols(x, off), kernel[t])
        m = ((col + off) >= 0) & ((col + off) < w)
        cnt = cnt + jnp.where(m, jnp.float32(kernel[t]), jnp.float32(0))
    temp = exact_div_by_vector(acc, cnt)

    # y pass
    row = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    acc = jnp.zeros_like(temp)
    cnt = jnp.zeros((h, 1), jnp.float32)
    for t in range(window):
        off = t - center
        acc = acc + mul_const_f32(shift_rows(temp, off), kernel[t])
        m = ((row + off) >= 0) & ((row + off) < h)
        cnt = cnt + jnp.where(m, jnp.float32(kernel[t]), jnp.float32(0))
    out = exact_div_by_vector(acc, cnt)
    return out.astype(jnp.int16)  # truncation cast, values >= 0


# ---------------------------------------------------------------------------
# Stage 2: Sobel gradient + magnitude + quantized angle (src/utils.cpp:106-236)
# ---------------------------------------------------------------------------

def xy_gradient(img):
    """int16 (..., H, W) -> (gx, gy) int32, reference border rules.

    grad_x: column-clamped central difference, row terms dropped off-image.
    grad_y: row-clamped central difference (below - above), column terms
    dropped off-image.  See golden.reference.xy_gradient.
    """
    x = img.astype(jnp.int32)
    d = clamp_shift_cols(x, 1) - clamp_shift_cols(x, -1)
    gx = 2 * d + shift_rows(d, 1) + shift_rows(d, -1)
    e = clamp_shift_rows(x, 1) - clamp_shift_rows(x, -1)
    gy = 2 * e + shift_cols(e, 1) + shift_cols(e, -1)
    return gx, gy


def sobel(img):
    """Fused gradient + magnitude + angle: int16 -> (mag int32, ang int16)."""
    gx, gy = xy_gradient(img)
    mag = isqrt_int32(gx * gx + gy * gy)
    ang = quantize_angle_int(gx, gy)
    return mag, ang


# ---------------------------------------------------------------------------
# Stage 3: non-max suppression (src/utils.cpp:248-308)
# ---------------------------------------------------------------------------

def nonmax_suppression(mag, ang):
    """Suppress pixels <= either in-bounds neighbor along the gradient bin."""
    m = mag.astype(jnp.int32)

    def nb(dr, dc):
        return shift2d(m, dr, dc, _NMS_OOB)

    keep0 = (m > nb(0, -1)) & (m > nb(0, 1))
    keep45 = (m > nb(-1, 1)) & (m > nb(1, -1))
    keep90 = (m > nb(-1, 0)) & (m > nb(1, 0))
    keep135 = (m > nb(-1, -1)) & (m > nb(1, 1))

    keep = jnp.where(
        ang == 0, keep0,
        jnp.where(ang == 45, keep45, jnp.where(ang == 90, keep90, keep135)))
    return jnp.where(keep, m, NOEDGE)


# ---------------------------------------------------------------------------
# Stage 4: hysteresis as a data-parallel fixed point (src/utils.cpp:322-427)
# ---------------------------------------------------------------------------

def _dilate8(e):
    """8-connected boolean dilation (separable: horizontal OR then vertical)."""
    f = jnp.asarray(False)
    h = e | shift_cols(e, 1, f) | shift_cols(e, -1, f)
    return h | shift_rows(h, 1, f) | shift_rows(h, -1, f)


def hysteresis(nm, min_val, max_val, steps_per_check: int = 4,
               mode: str = "component"):
    """EDGE(255) on 8-connected weak components containing a strong pixel.

    The reference's per-seed BFS (src/utils.cpp:360-427) is inherently
    serial; on TPU the same fixed point is reached by iterated masked
    dilation: edges_0 = strong; edges_{k+1} = weak & dilate8(edges_k),
    converged when an iteration changes nothing.  Monotone and bounded, so
    it terminates at exactly the BFS result set.  ``steps_per_check``
    dilations run between convergence reductions to amortize the reduce.

    ``mode``:
      * "component" (default) — clean 8-connected component rule.
      * "strict-reference" — reproduces the reference binary bit for bit,
        including its BFS bounds-check quirk: ``current - width > 0``
        (src/utils.cpp:378,399) means the pixel at (1, 0) never enqueues
        its top-right neighbor (0, 1), i.e. reachability is over the
        8-adjacency digraph minus the single directed edge (1,0)->(0,1).
        The fixed point drops exactly that directed promotion each step,
        so it converges to the BFS's directed-reachability set (oracle:
        golden.hysteresis_bfs).
    """
    out, _ = hysteresis_with_stats(nm, min_val, max_val, steps_per_check,
                                   mode)
    return out


def _strict_reference_fix(new, prev, weak):
    """Re-derive pixel (0, 1) excluding (1, 0) as a promotion source."""
    h, w = new.shape[-2], new.shape[-1]
    if h < 2 or w < 2:
        return new
    allowed = prev[..., 0, 0] | prev[..., 1, 1]
    if w >= 3:
        allowed = allowed | prev[..., 0, 2] | prev[..., 1, 2]
    val = prev[..., 0, 1] | (weak[..., 0, 1] & allowed)
    return new.at[..., 0, 1].set(val)


def hysteresis_with_stats(nm, min_val, max_val, steps_per_check: int = 4,
                          mode: str = "component"):
    """Like :func:`hysteresis`, also returning the number of dilation steps
    run until convergence (the "frontier iterations" observability stat)."""
    if mode not in ("component", "strict-reference"):
        raise ValueError(f"unknown hysteresis mode: {mode!r}")
    strict = mode == "strict-reference"
    weak = nm >= min_val
    strong = nm >= max_val

    def body(state):
        edges, _, rounds = state
        new = edges
        for _ in range(steps_per_check):
            stepped = weak & _dilate8(new)
            if strict:
                stepped = _strict_reference_fix(stepped, new, weak)
            new = stepped
        changed = jnp.any(new != edges)
        return new, changed, rounds + 1

    def cond(state):
        return state[1]

    edges, _, rounds = jax.lax.while_loop(
        cond, body, (strong, jnp.asarray(True), jnp.int32(0)))
    out = jnp.where(edges, jnp.int16(EDGE), jnp.int16(NOEDGE))
    return out, rounds * steps_per_check
