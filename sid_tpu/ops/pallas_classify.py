"""Mosaic (Pallas-TPU) prototype of the DS slim local classify.

ROADMAP item 3 / VERDICT r4 next #6: the one idiomatic-TPU component still
deferred was a hand-written Mosaic kernel. This implements the ``local``
method's per-profile (log_l1, log_l2) chain (call.cpp:238-254, the math of
``ops.likelihoods_ds.local_fixed_log_likelihoods_ds`` in its gather-free
form) as ONE Pallas kernel:

- all double-single (two-f32) arithmetic inline on the VPU (ops/ds.py
  algorithms — error-free transforms, Cody-Waite log);
- ``frexp``/``ldexp`` rebuilt from integer bit operations (Mosaic has no
  f32 frexp primitive): exponent extraction and 2^k construction via
  ``pltpu.bitcast`` on the IEEE-754 representation — exactly equal to
  ``jnp.frexp``/``jnp.ldexp`` for the positive normal inputs the log sees;
- the multinomial coefficient's lgamma-table lookups stay OUTSIDE the
  kernel (an XLA gather feeding two (U,) f32 inputs): TPU gathers from a
  VMEM table need either Mosaic dynamic-gather support or a one-hot matmul,
  both of which round 4 of this kernel's measurements found slower than
  XLA's own gather lowering — the kernel fuses everything downstream of
  the gathers instead;
- the error-cap branch decisions (e1 > -E, e2 > -E) are made in DS
  arithmetic on exact integer operands — sign-accurate to ~2^-48, matching
  the f64 kernels' branch choices away from exact ties.

Layout: the (U,) profile axis is reshaped to (U/128, 128) lanes; the four
base counts, major/second indices and the multinomial hi/lo ride as eight
elementwise planes. Row blocks of 256x128 keep VMEM residency ~1.3 MB.

This is a measured prototype behind ``SIDTPU_DEVICE_IMPL=pallas`` (bench.py
microbenches it against the XLA DS kernel); correctness is pinned on CPU
via ``interpret=True`` against the XLA kernel (tests/test_pallas_classify.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sid_tpu.models.common import LONG_DOUBLE_UNDERFLOW_LOG
from sid_tpu.ops import ds

_F32 = jnp.float32
_BLOCK_ROWS = 256  # rows of 128 lanes per grid step (10 planes ~ 1.3 MB VMEM)


# ---------------------------------------------------------------------------
# bit-level frexp/ldexp (Mosaic-safe, positive normal inputs)
# ---------------------------------------------------------------------------


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, _F32)


def _frexp_pos(x):
    """(mantissa in [0.5, 1), exponent) for positive normal f32 x."""
    bits = _bitcast_i32(x)
    e = ((bits >> 23) & 0xFF) - 126
    # 0x807FFFFF as signed int32 (sign + mantissa mask)
    mask = jnp.int32(np.int32(np.uint32(0x807FFFFF)))
    m = _bitcast_f32((bits & mask) | jnp.int32(126 << 23))
    return m, e


def _ldexp(x, k):
    """x * 2^k for |k| <= 126 (the log's reduction range)."""
    two_k = _bitcast_f32((k + 127) << 23)
    return x * two_k


def _ds_log_pos(x: ds.DS) -> ds.DS:
    """ds.log for strictly-positive normal inputs, frexp/ldexp bit-rebuilt.

    Identical arithmetic to ops.ds.log (same Cody-Waite pieces, same atanh
    Horner) minus the zero/negative/inf plumbing the classify's integer
    ratios never need: callers mask n == 0 through xlogy_int.
    """
    m_hi, k = _frexp_pos(x.hi)
    adj = m_hi < jnp.float32(2.0 / 3.0)
    m_hi = jnp.where(adj, m_hi * 2, m_hi)
    k = jnp.where(adj, k - 1, k)
    m_lo = _ldexp(x.lo, -k)
    m = ds.DS(m_hi, m_lo)

    z = ds.div(ds.add_f32(m, np.float32(-1.0)), ds.add_f32(m, np.float32(1.0)))
    w = ds.sqr(z)
    acc = ds.DS(
        jnp.full_like(x.hi, ds._ATANH_COEFS[ds._ATANH_J][0]),
        jnp.full_like(x.hi, ds._ATANH_COEFS[ds._ATANH_J][1]),
    )
    for j in range(ds._ATANH_J - 1, -1, -1):
        c_hi, c_lo = ds._ATANH_COEFS[j]
        acc = ds.add(ds.mul(acc, w), ds.DS(jnp.float32(c_hi), jnp.float32(c_lo)))
    ln_m = ds.mul_pow2(ds.mul(z, acc), 2.0)

    kf = k.astype(_F32)
    res = ds.add(ln_m, ds.DS(*ds.two_prod(kf, ds._LN2_C1)))
    res = ds.add(res, ds.DS(*ds.two_prod(kf, ds._LN2_C2)))
    return ds.add_f32(res, kf * ds._LN2_C3)


def _int_ratio_log(num, den) -> ds.DS:
    """DS log(num/den) for exact-in-f32 positive integers (num > 0)."""
    safe = jnp.maximum(num, 1)  # lanes with num == 0 are masked by xlogy
    ratio = ds.div(
        ds.from_f32(safe.astype(_F32)), ds.from_f32(den.astype(_F32))
    )
    return _ds_log_pos(ratio)


def _ds_pos(x: ds.DS):
    """Sign of a DS value as a bool (hi decides except on exact hi == 0)."""
    return (x.hi > 0) | ((x.hi == 0) & (x.lo > 0))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _classify_kernel(
    caps_ref,  # SMEM (5, 2): [log1p_cap, log_t3_cap, log_match2_cap, thr, pad]
    p0, p1, p2, p3,  # (B, 128) int32 base counts
    major_ref, second_ref,  # (B, 128) int32
    mnom_hi_ref, mnom_lo_ref,  # (B, 128) f32 log-multinomial (XLA gathers)
    l1_hi_ref, l1_lo_ref, l2_hi_ref, l2_lo_ref,  # outputs
):
    c0, c1, c2, c3 = p0[:], p1[:], p2[:], p3[:]
    major = major_ref[:]
    second = second_ref[:]
    mnom = ds.DS(mnom_hi_ref[:], mnom_lo_ref[:])

    cov = c0 + c1 + c2 + c3

    def pick(idx):
        return jnp.where(
            idx == 0, c0, jnp.where(idx == 1, c1, jnp.where(idx == 2, c2, c3))
        )

    n1 = pick(major)
    n2 = pick(second)

    def cap_const(i):
        return ds.DS(caps_ref[i, 0], caps_ref[i, 1])

    log1p_cap, log_t3_cap, log_match2_cap = (
        cap_const(0), cap_const(1), cap_const(2),
    )
    thr = cap_const(3)

    covf = cov.astype(_F32)

    # hom: e1 = (cov - n1)/cov > thr  <=>  (cov - n1) - thr*cov > 0,
    # decided in DS on exact integer operands (sign-accurate ~2^-48)
    cap1 = _ds_pos(
        ds.sub(ds.from_f32((cov - n1).astype(_F32)), ds.mul_f32(thr, covf))
    )
    log1p_e1 = ds.where(cap1, log1p_cap, _int_ratio_log(n1, cov))
    log_e1_3 = ds.where(cap1, log_t3_cap, _int_ratio_log(cov - n1, 3 * cov))
    l1 = ds.add_terms(
        [mnom, ds.xlogy_int(n1, log1p_e1), ds.xlogy_int(cov - n1, log_e1_3)]
    )

    # het: e2 = 1.5 (cov - n12)/cov > thr <=> 1.5 (cov - n12) - thr*cov > 0
    n12 = n1 + n2
    cap2 = _ds_pos(
        ds.sub(
            ds.from_f32((jnp.float32(1.5) * (cov - n12).astype(_F32))),
            ds.mul_f32(thr, covf),
        )
    )
    log_match = ds.where(cap2, log_match2_cap, _int_ratio_log(n12, 2 * cov))
    log_err = ds.where(cap2, log_t3_cap, _int_ratio_log(cov - n12, 2 * cov))
    l2 = ds.add_terms(
        [mnom, ds.xlogy_int(n12, log_match), ds.xlogy_int(cov - n12, log_err)]
    )

    l1_hi_ref[:] = l1.hi
    l1_lo_ref[:] = l1.lo
    l2_hi_ref[:] = l2.hi
    l2_lo_ref[:] = l2.lo


@functools.partial(jax.jit, static_argnames=("interpret",))
def local_log_likelihoods_pallas(
    profiles: jnp.ndarray,  # (U, 4) int; U % (256*128) == 0 (bucket-padded)
    major: jnp.ndarray,
    second: jnp.ndarray,
    error_threshold: jnp.ndarray,  # f64 scalar
    lgamma_tab_ds: ds.DS,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slim local classify through the Mosaic kernel; returns f64 (l1, l2).

    Same contract as likelihoods_ds.local_fixed_log_likelihoods_ds: emulated
    -f64 outputs ready for the host LRT, long-double underflow clamped. The
    multinomial gathers run in XLA (log_multinomial_ds); the kernel fuses
    every op downstream. Requires U divisible by 128 with U/128 a multiple
    of the row block (any pow-2 bucket >= 8192 qualifies).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sid_tpu.ops.likelihoods_ds import log_multinomial_ds

    profiles = profiles.astype(jnp.int32)
    u = profiles.shape[0]
    rows = u // 128
    block = min(_BLOCK_ROWS, rows)
    assert rows % block == 0 and u % 128 == 0, (u, rows, block)

    mnom = log_multinomial_ds(profiles, lgamma_tab_ds)  # XLA: table gathers

    # cap-branch DS scalars (host-free: traced f64 -> DS, as the XLA kernel)
    thr64 = jnp.asarray(error_threshold, jnp.float64)
    log1p_cap = ds.log(ds.from_f64(1.0 - thr64))
    log_t3_cap = ds.log(ds.from_f64(thr64 / 3.0))
    log_match2_cap = ds.log(ds.from_f64((1.0 - 2.0 / 3.0 * thr64) * 0.5))
    thr_ds = ds.from_f64(thr64)
    caps = jnp.stack(
        [
            jnp.stack([log1p_cap.hi, log1p_cap.lo]),
            jnp.stack([log_t3_cap.hi, log_t3_cap.lo]),
            jnp.stack([log_match2_cap.hi, log_match2_cap.lo]),
            jnp.stack([thr_ds.hi, thr_ds.lo]),
            jnp.zeros(2, _F32),
        ]
    )

    def plane(x, dtype):
        return x.astype(dtype).reshape(rows, 128)

    planes = [
        plane(profiles[:, 0], jnp.int32),
        plane(profiles[:, 1], jnp.int32),
        plane(profiles[:, 2], jnp.int32),
        plane(profiles[:, 3], jnp.int32),
        plane(major, jnp.int32),
        plane(second, jnp.int32),
        plane(mnom.hi, _F32),
        plane(mnom.lo, _F32),
    ]

    grid = (rows // block,)
    row_spec = pl.BlockSpec(
        (block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, 128), _F32)
    outs = pl.pallas_call(
        _classify_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [row_spec] * len(planes),
        out_specs=[row_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(caps, *planes)
    l1 = ds.DS(outs[0].reshape(u), outs[1].reshape(u))
    l2 = ds.DS(outs[2].reshape(u), outs[3].reshape(u))

    l1_64 = ds.to_f64(l1)
    l2_64 = ds.to_f64(l2)
    neginf = -jnp.inf
    l1_64 = jnp.where(l1_64 < LONG_DOUBLE_UNDERFLOW_LOG, neginf, l1_64)
    l2_64 = jnp.where(l2_64 < LONG_DOUBLE_UNDERFLOW_LOG, neginf, l2_64)
    return l1_64, l2_64
