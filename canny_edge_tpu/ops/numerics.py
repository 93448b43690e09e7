"""Exact scalar numerics on TPU.

TPU VPU float32 division and sqrt are *not* correctly rounded (measured up to
2 ulp error on hardware), while the reference CPU pipeline's semantics
(src/utils.cpp) are defined by IEEE-754 float32/double arithmetic.  This
module provides bit-exact primitives built from integer ops (which are exact
on TPU):

* :func:`exact_div_f32` — correctly rounded (round-to-nearest-even) float32
  division for the blur's border renormalization (src/utils.cpp:47,62).
* :func:`isqrt_int32` — exact integer sqrt for the gradient magnitude
  ``(int)sqrt(gx^2+gy^2)`` (src/utils.cpp:212).
* :func:`quantize_angle_int` — exact integer-predicate angle binning
  replacing the reference's atan2-degrees chain (src/utils.cpp:215-231);
  see golden.reference.quantize_angle for the equivalence proof.

All functions are shape-polymorphic elementwise jnp ops, usable under jit,
vmap, shard_map, and inside Pallas kernel bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MANT_MASK = np.int32(0x7FFFFF)
_HIDDEN = np.int32(0x800000)


def _decompose(x):
    """Split positive normal float32 into (mantissa in [2^23,2^24), exponent).

    value = m * 2^(e - 150).
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = jax.lax.shift_right_logical(bits, 23) & np.int32(0xFF)
    m = (bits & _MANT_MASK) | _HIDDEN
    return m, e


def _approx_recip(b):
    """~1/b via the bit-trick seed + 3 Newton steps (mult/sub only).

    float32 division on the TPU backend in this environment has a pathological
    one-time compile cost (~3 min per process), so the exact divider seeds
    from a division-free reciprocal instead: magic-constant exponent flip
    (max ~4% relative error) refined by Newton y <- y*(2 - b*y), giving a
    reciprocal within ~2 ulp.
    """
    bits = jax.lax.bitcast_convert_type(b, jnp.int32)
    y = jax.lax.bitcast_convert_type(np.int32(0x7EF127EA) - bits, jnp.float32)
    for _ in range(3):
        y = y * (np.float32(2.0) - b * y)
    return y


def exact_div_f32(a, b, iters: int = 6, seed_recip=None):
    """Correctly rounded float32 ``a / b`` for ``a >= 0``, ``b`` positive
    normal.  Matches IEEE-754 round-to-nearest-even exactly (i.e. matches
    NumPy / x86 / XLA:CPU division bit for bit) — without emitting any
    hardware float division.

    Method: seed q = a * approx(1/b) (within a few ulp of a/b), then correct
    it using the *exact* integer residual.  With a = ma*2^(ea-150),
    b = mb*2^(eb-150), q = mq*2^(eq-150):

        a - q*b = 2^(eq+eb-300) * (ma*2^D - mq*mb),   D = ea - eq - eb + 150

    Since q is within a few ulp of a/b, the scaled residual
    R = ma*2^D - mq*mb satisfies |R| <= ~6*mb < 2^28, so R is computed
    exactly in *wrapping* int32 arithmetic (the true value fits in int32, so
    the low 32 bits of both terms suffice; XLA integer ops are two's
    complement).  q is correctly rounded iff

        2*|R| < mb                           (strictly inside half-ulp), or
        2*|R| == mb and mq is even           (tie -> even), with the
        half-spacing below halved when mq == 2^23 (binade boundary).

    Otherwise move q one ulp toward the true quotient (integer increment on
    the bit pattern, which handles binade crossings automatically) and
    re-check.  Seed error is <= ~5 ulp, each failed check moves exactly one
    ulp toward the correctly rounded result, so 8 iterations give margin
    (iterations are idempotent once correct).
    """
    a = a.astype(jnp.float32) if hasattr(a, "astype") else jnp.float32(a)
    b = jnp.asarray(b, jnp.float32)
    seed = _approx_recip(b) if seed_recip is None else seed_recip
    q = a * seed
    ma, ea = _decompose(a)
    mb, eb = _decompose(b)  # b may be a broadcastable row/col vector

    def fix_once(q):
        iq = jax.lax.bitcast_convert_type(q, jnp.int32)
        eq = jax.lax.shift_right_logical(iq, 23) & np.int32(0xFF)
        mq = (iq & _MANT_MASK) | _HIDDEN
        d = ea - eq - eb + np.int32(150)
        d = jnp.clip(d, 0, 31)
        r = jax.lax.shift_left(ma, d) - mq * mb  # exact (see docstring)
        two_r = jnp.abs(r) * np.int32(2)
        at_binade = mq == _HIDDEN
        # acceptance threshold: mb above / at-or-below depending on side.
        # Pure logical ops (no select-on-bool: Mosaic cannot legalize i1
        # vector selects).
        ok_above = (two_r < mb) | ((two_r == mb) & (mq % 2 == 0))
        ok_below = (at_binade & (two_r * 2 <= mb)) | (~at_binade & ok_above)
        neg = r < 0
        ok = (~neg & ok_above) | (neg & ok_below)
        step = jnp.where(r > 0, np.int32(1), np.int32(-1))
        iq_new = jnp.where(ok | (r == 0), iq, iq + step)
        return jax.lax.bitcast_convert_type(iq_new, jnp.float32)

    for _ in range(iters):
        q = fix_once(q)
    return jnp.where(a == 0, np.float32(0), q)


def exact_recip_f32(b):
    """Correctly rounded 1/b (positive normal b), division-free."""
    return exact_div_f32(jnp.ones_like(b), b)


def exact_div_by_vector(a, b, recip=None):
    """Correctly rounded a/b where ``b`` is a small broadcastable vector
    (e.g. the blur's per-column renormalization counts).

    The correctly rounded reciprocal of ``b`` is computed once on the small
    vector, giving a per-pixel seed within ~1.04 ulp of a/b (0.5 ulp from
    the reciprocal rounding scaled through the product + 0.5 ulp from the
    product rounding), so 2 fixer iterations (each moves exactly 1 ulp
    toward the correctly rounded result, which is accepted within its
    half-ulp window) make the full-size quotient exact.
    """
    b = jnp.asarray(b, jnp.float32)
    if recip is None:
        recip = exact_recip_f32(b)
    return exact_div_f32(a, b, iters=2, seed_recip=recip)


def mul_const_f32(x, w: float):
    """``round_f32(x * w)``, taking the cheap path where it is provably safe.

    On TPU, a lone f32 multiply is correctly rounded and XLA:TPU performs no
    mul+add FMA contraction (verified empirically by the bit-exactness suite
    run with CANNY_TPU_TEST_PLATFORM=tpu), so a plain multiply already
    matches the golden product.  LLVM-based CPU backends contract, so there
    the integer-exact product is used.  Backend choice happens at trace
    time.
    """
    if jax.default_backend() == "cpu":
        return exact_mul_const_f32(x, w)
    return jnp.asarray(x, jnp.float32) * np.float32(w)


def exact_mul_const_f32(x, w: float):
    """Bit-exact ``round_f32(x * w)`` for nonneg f32 ``x`` and positive
    host-constant ``w`` — immune to compiler FMA contraction.

    Compilers (XLA:CPU's LLVM backend in particular) may contract a
    ``mul`` feeding an ``add`` into an FMA, skipping the product's own
    f32 rounding and silently changing accumulation chains at the LSB.
    This helper performs the product's rounding *explicitly in integer
    arithmetic*, so downstream contraction becomes harmless: with
    x = mx*2^(ex-150) and w = mw*2^(ew-150),

        x*w = (mx*mw) * 2^(ex+ew-300)

    mx*mw is exact in int64 (<= 2^48); converting it to float32 is a
    correctly rounded 48->24-bit rounding; multiplying by the exact
    power of two 2^(ex+ew-300) (built by bit-assembling the exponent
    field) is exact.  The result equals IEEE round-to-nearest-even of
    x*w on every backend, and any later fma(p, 1.0-like, acc) contraction
    sees an already-exact product.

    Preconditions: x == 0 or x normal; the product must stay in the
    normal range (true for the blur's domain: x in {0} U [~1e-4, 256),
    w in [~1e-4, 1]).
    """
    x = jnp.asarray(x, jnp.float32)
    wbits = int(np.float32(w).view(np.int32))
    ew = (wbits >> 23) & 0xFF
    mw = (wbits & 0x7FFFFF) | 0x800000
    wh = mw >> 12
    wl = mw & 0xFFF

    mx32, ex = _decompose(x)
    mx = mx32.astype(jnp.uint32)
    xh = mx >> 12
    xl = mx & np.uint32(0xFFF)

    # exact 48-bit product P = mx*mw via 12-bit limbs, held as
    # (Phi = P >> 16, Plo = P & 0xFFFF) in uint32
    A = xh * np.uint32(wh)                       # < 2^24
    M = xh * np.uint32(wl) + xl * np.uint32(wh)  # < 2^25
    C = xl * np.uint32(wl)                       # < 2^24
    S = C + ((M & np.uint32(0xF)) << 12)         # < 2^24 + 2^16
    Phi = (A << 8) + (M >> 4) + (S >> 16)
    Plo = S & np.uint32(0xFFFF)

    # round P (in [2^46, 2^48)) to a 24-bit mantissa, nearest-even
    big = Phi >= np.uint32(0x80000000)           # P >= 2^47 -> drop 24 bits
    m24 = jnp.where(big, Phi >> 8, Phi >> 7)
    drop_hi = jnp.where(big, Phi & np.uint32(0xFF), Phi & np.uint32(0x7F))
    dropped = (drop_hi << 16) | Plo               # <= 2^24
    half = jnp.where(big, np.uint32(1 << 23), np.uint32(1 << 22))
    round_up = (dropped > half) | ((dropped == half) & ((m24 & 1) == 1))
    m24 = m24 + round_up.astype(jnp.uint32)       # 2^24 rolls into exponent

    # value = m24 * 2^(ex+ew-300+shift); assemble float bits directly
    # (int32 domain: ew - 150 may be negative; m24 < 2^24+1 fits)
    shift = jnp.where(big, np.int32(24), np.int32(23))
    ebits = ex + shift + np.int32(ew - 150)
    bits = jax.lax.shift_left(ebits, 23) + m24.astype(jnp.int32) \
        - np.int32(1 << 23)
    out = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(x == 0, np.float32(0), out)


def isqrt_int32(n):
    """Exact floor(sqrt(n)) for int32 ``0 <= n <= ~2.1e6``.

    Equals the reference's ``(int)sqrt((double)n)`` (src/utils.cpp:212): for
    n <= 2.1e6 a correctly rounded double sqrt truncates to the integer
    sqrt exactly (see golden.reference.magnitude_int for the argument).

    TPU float32 sqrt is within ~2 ulp, so the float candidate is within 1 of
    the true isqrt; two integer comparison fixes make it exact.
    """
    n = n.astype(jnp.int32)
    k = jnp.sqrt(n.astype(jnp.float32)).astype(jnp.int32)
    k = jnp.where((k + 1) * (k + 1) <= n, k + 1, k)
    k = jnp.where(k * k > n, k - 1, k)
    return k


def near_one_ulp_offset(s) -> int | None:
    """ulp offset of host float32 ``s`` from 1.0 if |offset| <= 1, else None.

    The blur's interior renormalization divisor (the full kernel weight sum,
    re-accumulated in f32 tap order) lands within 1 ulp of 1.0 for every
    practical sigma because the golden kernel is normalized to sum 1 in
    double before the f32 re-sum (src/utils.cpp:77-95): measured offsets are
    0 (sigma=1.0), +1 (sigma=1.4/2/3), -1 (sigma=0.5).
    """
    off = int(np.float32(s).view(np.int32)) - int(np.float32(1.0).view(np.int32))
    return off if -1 <= off <= 1 else None


def div_by_near_one(a, s):
    """Correctly rounded float32 ``a / s`` for nonneg ``a`` and a host
    constant ``s`` within 1 ulp of 1.0 — three integer ops, no multiplies.

    Closed forms (a = ma * 2^(ea-150), ma in [2^23, 2^24); exhaustively
    verified over every mantissa against NumPy division in
    tests/test_ops_bitexact.py):

    * s = 1.0:          a/s = a.
    * s = 1 - 2^-24 (mantissa all-ones, one ulp below 1):
          a/s = a * (1 + 1/(2^24-1)); the mantissa increment
          ma/(2^24-1) lies in [0.5, 1) with no representable tie, and
          exceeds 1/2 for every ma >= 2^23, so the quotient is always
          exactly one bit-pattern above ``a`` (binade roll-over included).
    * s = 1 + 2^-23 (one ulp above 1, B = 2^23+1):
          quotient mantissa = round_even(ma - ma/B); ma/B in [1, 2) with
          no tie (B odd), so subtract 1 bit-pattern, or 2 when
          ma/B > 3/2 (ma >= 12582914) or at the binade edge ma = 2^23
          (where round_even(2^47/B) = 2^24 - 2 in the binade below).

    The bit-pattern arithmetic handles binade crossings automatically.
    """
    off = near_one_ulp_offset(s)
    if off is None:
        raise ValueError(f"divisor {s!r} not within 1 ulp of 1.0")
    a = jnp.asarray(a, jnp.float32)
    if off == 0:
        return a
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    if off == -1:
        out = jax.lax.bitcast_convert_type(bits + np.int32(1), jnp.float32)
    else:
        ma = (bits & _MANT_MASK) | _HIDDEN
        extra = (ma >= np.int32(12582914)) | (ma == _HIDDEN)
        dec = np.int32(1) + extra.astype(jnp.int32)
        out = jax.lax.bitcast_convert_type(bits - dec, jnp.float32)
    return jnp.where(a == 0, np.float32(0), out)


def isqrt_f32(n):
    """Exact floor(sqrt(n)) for *integer-valued* float32 ``0 <= n <= ~2.1e6``,
    returned as an integer-valued float32.

    Same contract as :func:`isqrt_int32` but the candidate fixes run in
    float32: every quantity involved (n, k, (k+1)^2 <= ~2.09e6) is an
    integer below 2^24, hence exactly representable, so the f32 compares
    and products are exact.  Float32 multiplies are substantially faster
    than int32 multiplies on the TPU VPU (int32 products decompose into
    multi-op sequences), which is why the fused front end uses this
    variant.
    """
    k = jnp.floor(jnp.sqrt(n))
    k1 = k + np.float32(1)
    k = jnp.where(k1 * k1 <= n, k1, k)
    k = jnp.where(k * k > n, k - np.float32(1), k)
    return k


def nms_bin_masks_f32(gx, gy):
    """Angle-bin boolean masks (b0, b45, b90, b135) from integer-valued
    float32 gradients, |gx|,|gy| <= 2040.

    Same binning as :func:`quantize_angle_i32` (see its docstring and
    golden.reference.quantize_angle for the equivalence proof) but computed
    entirely in float32: all products ((ax-ay)^2 <= 4080^2 ~ 1.7e7 < 2^24,
    2*ay^2 <= 8.4e6 < 2^24, gx*gy <= 2040^2) are exact in f32, so every
    predicate matches the integer path bit for bit.  Returning the four
    masks directly (instead of an encoded angle that is then compared
    against four constants) saves the encode/decode select chains.

    ``b90 == high``: the spec form (quantize_angle_i32) writes
    ``((gx==0)&(gy!=0)) | ((same|opp)&high)``, but under ``high``
    (ay > ax >= 0) ``gy != 0`` always holds, so gx == 0 implies the first
    clause and gx != 0 implies sign_prod != 0 — both collapse to ``high``
    alone.  Verified exhaustively over all 4081^2 gradient pairs and
    pinned by tests/test_ops_bitexact.py::
    test_nms_bin_masks_f32_match_quantize_angle.
    """
    zero = np.float32(0)
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    diff2 = (ax - ay) * (ax - ay)   # == (ay-ax)^2, shared by both edges
    low = (ax > ay) & (np.float32(2) * ay * ay < diff2)
    high = (ay > ax) & (diff2 > np.float32(2) * ax * ax)
    mid = ~low & ~high
    sign_prod = gx * gy
    b45 = (sign_prod > zero) & mid
    b135 = (sign_prod < zero) & mid
    b90 = high
    b0 = ~(b45 | b135 | b90)
    return b0, b45, b90, b135


def quantize_angle_int(gx, gy):
    """Quantize gradient direction to {0, 45, 90, 135} exactly.

    Integer-predicate binning of atan2(gy, gx) degrees into the reference's
    bins with edges at 22.5 + k*45 (src/utils.cpp:220-231):

      slope-low  (|gy/gx| < tan 22.5 = sqrt(2)-1):  ax > ay and 2 ay^2 < (ax-ay)^2
      slope-high (|gy/gx| > tan 67.5 = sqrt(2)+1):  ay > ax and (ay-ax)^2 > 2 ax^2

    Provably identical to the C++ float path for all integer gradients
    reachable from uint8 images (|g| <= 1020); see
    golden.reference.quantize_angle.  Requires |gx|,|gy| <= 32767 to avoid
    int32 overflow in the squared terms.
    """
    return quantize_angle_i32(gx, gy).astype(jnp.int16)


def quantize_angle_i32(gx, gy):
    """int32 variant of :func:`quantize_angle_int` (all-int32 arithmetic so
    Mosaic never needs int16-layout i1 masks inside Pallas kernels)."""
    gxi = gx.astype(jnp.int32)
    gyi = gy.astype(jnp.int32)
    ax = jnp.abs(gxi)
    ay = jnp.abs(gyi)
    low = (ax > ay) & (2 * ay * ay < (ax - ay) * (ax - ay))
    high = (ay > ax) & ((ay - ax) * (ay - ax) > 2 * ax * ax)
    mid = ~low & ~high
    sign_prod = gxi * gyi
    same = sign_prod > 0
    opp = sign_prod < 0

    out = jnp.zeros(jnp.shape(gxi), jnp.int32)
    out = jnp.where((gxi == 0) & (gyi != 0), np.int32(90), out)
    out = jnp.where(same & mid, np.int32(45), out)
    out = jnp.where(opp & mid, np.int32(135), out)
    out = jnp.where((same | opp) & high, np.int32(90), out)
    return out
