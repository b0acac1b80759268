"""GSL-nmsimplex2-faithful Nelder-Mead as a JAX ``lax.while_loop``.

Device counterpart of ``sid_tpu.exact.nmsimplex`` (the executable spec both
are tested against): identical update rule — running-center corner moves
(reflection -1, expansion -2, contraction +0.5, full contraction toward the
best corner), GSL's exact highest/second-highest/lowest scan quirk,
incremental RMS simplex size, size < tol stop (reference: 1e-5, max 1000
iterations; optimization.hpp:26,46,66-67).

The whole optimization compiles to a single on-device loop; the objective is
any jittable ``f(theta (N,)) -> scalar``. ``vmap`` over a leading batch axis
gives independent per-sample fits (population-batch config) — lax.while_loop
batching masks finished lanes automatically.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class NmState(NamedTuple):
    x1: jnp.ndarray  # (P, N) simplex corners
    y1: jnp.ndarray  # (P,)
    center: jnp.ndarray  # (N,) running center of all corners
    s2: jnp.ndarray  # scalar: mean squared corner-to-center distance
    iterations: jnp.ndarray  # int32
    converged: jnp.ndarray  # bool


class NmResult(NamedTuple):
    x: jnp.ndarray
    fval: jnp.ndarray
    converged: jnp.ndarray
    iterations: jnp.ndarray


def _compute_center_size(x1):
    # op-for-op the NumPy spec's _compute_center/_compute_size (which follow
    # GSL): multiply by the reciprocal, per-corner sqrt-then-square — the
    # trace-equality tests require bitwise-identical rounding
    p = x1.shape[0]
    center = jnp.sum(x1, axis=0) * (1.0 / p)
    d = x1 - center
    t = jnp.sqrt(jnp.sum(d * d, axis=1))
    ss = jnp.sum(t * t)
    return center, ss / p


def _hi_shi_lo(y1):
    """GSL's scan for highest/second-highest/lowest (its exact quirk:
    ds_hi starts at y[1] before the loop touches i=1)."""
    p = y1.shape[0]
    dhi = y1[0]
    dlo = y1[0]
    hi = jnp.int32(0)
    lo = jnp.int32(0)
    ds_hi = y1[1]
    s_hi = jnp.int32(1)
    for i in range(1, p):
        val = y1[i]
        c_lo = val < dlo
        c_hi = (~c_lo) & (val > dhi)
        c_shi = (~c_lo) & (~c_hi) & (val > ds_hi)
        new_lo = jnp.where(c_lo, i, lo)
        new_dlo = jnp.where(c_lo, val, dlo)
        new_s_hi = jnp.where(c_hi, hi, jnp.where(c_shi, jnp.int32(i), s_hi))
        new_ds_hi = jnp.where(c_hi, dhi, jnp.where(c_shi, val, ds_hi))
        new_hi = jnp.where(c_hi, jnp.int32(i), hi)
        new_dhi = jnp.where(c_hi, val, dhi)
        lo, dlo, s_hi, ds_hi, hi, dhi = (
            new_lo, new_dlo, new_s_hi, new_ds_hi, new_hi, new_dhi,
        )
    return hi, s_hi, lo


def _no_fma_add(a, b):
    """a + b with both products pinned behind an optimization barrier.

    Pins the spec's evaluation order against HLO-level reassociation. Note
    the backend may STILL contract mul+add into an FMA at codegen (LLVM
    excess precision) — a value-changing, backend-dependent ulp effect the
    trace-equality tests neutralize by running with
    ``--xla_backend_optimization_level=0`` (see tests/nm_trace_tool.py).
    With contraction off, this implementation is bitwise-identical to the
    NumPy spec step-for-step; with it on, trajectories may part at the ulp
    level while the fitted optimum still agrees at the 1e-5 size tolerance
    (the CSV-parity tests pin that end-to-end).
    """
    a, b = jax.lax.optimization_barrier((a, b))
    return a + b


def _try_corner_move(coeff, state: NmState, corner):
    p = state.x1.shape[0]
    alpha = (1.0 - coeff) * p / (p - 1.0)
    beta = (coeff * p - 1.0) / (p - 1.0)
    return _no_fma_add(alpha * state.center, beta * state.x1[corner])


def _update_point(state: NmState, i, x, val) -> NmState:
    p = state.x1.shape[0]
    x_old = state.x1[i]
    delta = x - x_old
    xmc = x_old - state.center
    d = jnp.sqrt(jnp.sum(delta * delta))  # sqrt-then-square, as GSL/spec do
    xmcd = jnp.sum(xmc * delta)
    # parenthesized like the spec: the two-term increment sums first
    s2 = state.s2 + _no_fma_add((2.0 / p) * xmcd, ((p - 1.0) / p) * (d * d / p))
    t_old, t_new = jax.lax.optimization_barrier(
        ((1.0 / p) * x_old, (1.0 / p) * x)
    )
    center = state.center - t_old + t_new
    return state._replace(
        x1=state.x1.at[i].set(x),
        y1=state.y1.at[i].set(val),
        center=center,
        s2=s2,
    )


def nm_init(f: Callable, x0: jnp.ndarray, step: jnp.ndarray) -> NmState:
    """Initial simplex state (x0 plus one step along each axis)."""
    x0 = jnp.asarray(x0, jnp.float64)
    step = jnp.asarray(step, jnp.float64)
    p = x0.shape[0] + 1
    corners = jnp.concatenate(
        [x0[None, :], x0[None, :] + jnp.diag(step)], axis=0
    )  # (P, N)
    y1 = jnp.stack([f(corners[i]) for i in range(p)])
    center, s2 = _compute_center_size(corners)
    return NmState(corners, y1, center, s2, jnp.int32(0), jnp.array(False))


def nm_iterate(f: Callable, state: NmState) -> NmState:
    """One nmsimplex2 step (module-level so tests can trace step-by-step)."""
    p = state.x1.shape[0]
    hi, s_hi, lo = _hi_shi_lo(state.y1)
    xc = _try_corner_move(-1.0, state, hi)
    val = f(xc)
    y_lo = state.y1[lo]
    y_shi = state.y1[s_hi]
    y_hi = state.y1[hi]

    def branch_expand(st: NmState) -> NmState:
        xc2 = _try_corner_move(-2.0, st, hi)
        val2 = f(xc2)
        take2 = jnp.isfinite(val2) & (val2 < y_lo)
        return jax.lax.cond(
            take2,
            lambda s: _update_point(s, hi, xc2, val2),
            lambda s: _update_point(s, hi, xc, val),
            st,
        )

    def branch_contract(st: NmState) -> NmState:
        # accept reflection first if it at least beats the highest point
        st = jax.lax.cond(
            jnp.isfinite(val) & (val <= y_hi),
            lambda s: _update_point(s, hi, xc, val),
            lambda s: s,
            st,
        )
        xc2 = _try_corner_move(0.5, st, hi)
        val2 = f(xc2)

        def one_dim(s: NmState) -> NmState:
            return _update_point(s, hi, xc2, val2)

        def contract_all(s: NmState) -> NmState:
            # contract every non-best corner toward the best, re-evaluate
            best_x = s.x1[lo]
            new_x1 = 0.5 * (s.x1 + best_x[None, :])
            new_x1 = new_x1.at[lo].set(best_x)
            new_y1 = jnp.stack(
                [
                    jnp.where(jnp.int32(i) == lo, s.y1[i], f(new_x1[i]))
                    for i in range(p)
                ]
            )
            center2, s2_2 = _compute_center_size(new_x1)
            return s._replace(x1=new_x1, y1=new_y1, center=center2, s2=s2_2)

        return jax.lax.cond(
            jnp.isfinite(val2) & (val2 <= st.y1[hi]), one_dim, contract_all, st
        )

    def branch_accept(st: NmState) -> NmState:
        return _update_point(st, hi, xc, val)

    b1 = jnp.isfinite(val) & (val < y_lo)
    b2 = (~jnp.isfinite(val)) | (val > y_shi)
    branch_idx = jnp.where(b1, 0, jnp.where(b2, 1, 2))
    return jax.lax.switch(
        branch_idx, [branch_expand, branch_contract, branch_accept], state
    )


def minimize_nmsimplex2_jax(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    step: jnp.ndarray,
    tol: float = 1e-5,
    max_iterations: int = 1000,
) -> NmResult:
    """Minimize ``f`` with the nmsimplex2 rule, fully on device."""
    state = nm_init(f, x0, step)

    def iterate(state: NmState) -> NmState:
        return nm_iterate(f, state)

    def cond(state: NmState):
        return (~state.converged) & (state.iterations < max_iterations)

    def body(state: NmState) -> NmState:
        state = iterate(state)._replace(iterations=state.iterations + 1)
        size = jnp.where(state.s2 > 0, jnp.sqrt(state.s2), _recompute_size(state))
        return state._replace(converged=size < tol)

    def _recompute_size(state: NmState):
        _, s2 = _compute_center_size(state.x1)
        return jnp.sqrt(s2)

    final = jax.lax.while_loop(cond, body, state)
    lo = jnp.argmin(final.y1)
    return NmResult(
        x=final.x1[lo],
        fval=final.y1[lo],
        converged=final.converged,
        iterations=final.iterations,
    )
