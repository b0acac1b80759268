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


def minimize_nmsimplex2_jax_classic(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    step: jnp.ndarray,
    tol: float = 1e-5,
    max_iterations: int = 1000,
) -> NmResult:
    """Minimize ``f`` with the nmsimplex2 rule, fully on device.

    Direct transliteration of the spec: the while-loop body is one whole GSL
    iteration, which instantiates the objective ~6x (reflect + expand +
    contract + per-corner re-evals) and the init 3x more — ~9 copies of the
    objective in the traced program. Kept as the executable reference for
    the lean single-instantiation loop below (bitwise-equality tested); use
    ``minimize_nmsimplex2_jax`` in production.
    """
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


class LeanState(NamedTuple):
    """State machine for the single-instantiation loop (see below).

    phase: 0=INIT (evaluating initial corners), 1=REFLECT (iteration start),
    2=EXPAND, 3=CONTRACT, 4=CONTRACT_ALL (re-evaluating shrunk corners).
    ``idx`` is the corner cursor for INIT/CONTRACT_ALL; hi/s_hi/lo and the
    y-values at them are frozen at each REFLECT step (GSL scans once per
    iteration); ``pend_x/pend_val`` hold the reflection while EXPAND decides.
    """

    x1: jnp.ndarray
    y1: jnp.ndarray
    center: jnp.ndarray
    s2: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    phase: jnp.ndarray
    idx: jnp.ndarray
    hi: jnp.ndarray
    s_hi: jnp.ndarray
    lo: jnp.ndarray
    y_lo: jnp.ndarray
    y_shi: jnp.ndarray
    y_hi: jnp.ndarray
    pend_x: jnp.ndarray
    pend_val: jnp.ndarray
    ca_x1: jnp.ndarray


_INIT, _REFLECT, _EXPAND, _CONTRACT, _CONTRACT_ALL = range(5)


def _nm_state_tuple(s: LeanState) -> NmState:
    return NmState(s.x1, s.y1, s.center, s.s2, s.iterations, s.converged)


def _with_nm(s: LeanState, n: NmState) -> LeanState:
    return s._replace(
        x1=n.x1, y1=n.y1, center=n.center, s2=n.s2,
        iterations=n.iterations, converged=n.converged,
    )


def minimize_nmsimplex2_jax(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    step: jnp.ndarray,
    tol: float = 1e-5,
    max_iterations: int = 1000,
) -> NmResult:
    """Minimize ``f`` with the nmsimplex2 rule — lean compile form.

    The while-loop body evaluates the objective EXACTLY ONCE at a
    phase-selected point; the GSL iteration structure (reflect -> expand /
    contract / accept -> contract-all) becomes a state machine whose
    non-objective arithmetic is a few dozen scalar ops in a lax.switch.
    The objective — by far the dominant trace/compile cost for the Lynch
    fit (a (U_pad, 10)-term reduction) — appears once in the whole traced
    program, vs ~9 instantiations in the classic form: measured f64 fit
    compile drops accordingly (DESIGN.md). Evaluation points, evaluation
    order and all update arithmetic are op-for-op the classic loop's, so
    trajectories are bitwise identical (tests/test_nmsimplex.py pins this
    against minimize_nmsimplex2_jax_classic on adversarial objectives;
    reference rule: optimization.hpp:46-72). Under vmap the switch becomes
    a per-lane select while the single objective instantiation batches —
    exactly what the population fits need.

    One benign divergence from the classic trace: contract-all evaluates
    only the p-1 moved corners (the classic form also instantiates f at the
    kept best corner and discards it by a select), which changes no value.
    """
    x0 = jnp.asarray(x0, jnp.float64)
    step = jnp.asarray(step, jnp.float64)
    n = x0.shape[0]
    p = n + 1
    corners = jnp.concatenate([x0[None, :], x0[None, :] + jnp.diag(step)], axis=0)
    i32 = jnp.int32
    state = LeanState(
        x1=corners,
        y1=jnp.zeros((p,), jnp.float64),
        center=jnp.zeros((n,), jnp.float64),
        s2=jnp.float64(0.0),
        iterations=i32(0),
        converged=jnp.array(False),
        phase=i32(_INIT),
        idx=i32(0),
        hi=i32(0),
        s_hi=i32(0),
        lo=i32(0),
        y_lo=jnp.float64(0.0),
        y_shi=jnp.float64(0.0),
        y_hi=jnp.float64(0.0),
        pend_x=jnp.zeros((n,), jnp.float64),
        pend_val=jnp.float64(0.0),
        ca_x1=corners,
    )

    def select(s: LeanState):
        """Phase-dependent evaluation point (+ the REFLECT-step scan)."""

        def sel_init(s):
            return s, s.x1[s.idx]

        def sel_reflect(s):
            hi, s_hi, lo = _hi_shi_lo(s.y1)
            s = s._replace(
                hi=hi, s_hi=s_hi, lo=lo,
                y_lo=s.y1[lo], y_shi=s.y1[s_hi], y_hi=s.y1[hi],
            )
            return s, _try_corner_move(-1.0, _nm_state_tuple(s), hi)

        def sel_expand(s):
            return s, _try_corner_move(-2.0, _nm_state_tuple(s), s.hi)

        def sel_contract(s):
            # state already carries the maybe-accepted reflection (applied
            # on the REFLECT step), matching branch_contract's ordering
            return s, _try_corner_move(0.5, _nm_state_tuple(s), s.hi)

        def sel_contract_all(s):
            return s, s.ca_x1[s.idx]

        return jax.lax.switch(
            s.phase,
            [sel_init, sel_reflect, sel_expand, sel_contract, sel_contract_all],
            s,
        )

    def complete(s: LeanState) -> LeanState:
        """End of one GSL iteration: count it, check the size stop."""
        it = s.iterations + 1
        size = jnp.where(
            s.s2 > 0,
            jnp.sqrt(s.s2),
            jnp.sqrt(_compute_center_size(s.x1)[1]),
        )
        return s._replace(
            iterations=it, converged=size < tol, phase=i32(_REFLECT)
        )

    def update(s: LeanState, x, val) -> LeanState:
        def upd_init(s):
            s = s._replace(y1=s.y1.at[s.idx].set(val))
            done = s.idx == p - 1
            center, s2 = _compute_center_size(s.x1)
            return jax.lax.cond(
                done,
                lambda s: s._replace(
                    center=center, s2=s2, phase=i32(_REFLECT), idx=i32(0)
                ),
                lambda s: s._replace(idx=s.idx + 1),
                s,
            )

        def upd_reflect(s):
            b1 = jnp.isfinite(val) & (val < s.y_lo)
            b2 = (~jnp.isfinite(val)) | (val > s.y_shi)

            def to_expand(s):
                return s._replace(
                    pend_x=x, pend_val=val, phase=i32(_EXPAND)
                )

            def to_contract(s):
                # accept reflection first if it at least beats the highest
                s = jax.lax.cond(
                    jnp.isfinite(val) & (val <= s.y_hi),
                    lambda t: _with_nm(
                        t, _update_point(_nm_state_tuple(t), t.hi, x, val)
                    ),
                    lambda t: t,
                    s,
                )
                return s._replace(phase=i32(_CONTRACT))

            def accept(s):
                s = _with_nm(
                    s, _update_point(_nm_state_tuple(s), s.hi, x, val)
                )
                return complete(s)

            return jax.lax.cond(
                b1, to_expand,
                lambda s: jax.lax.cond(b2, to_contract, accept, s),
                s,
            )

        def upd_expand(s):
            take2 = jnp.isfinite(val) & (val < s.y_lo)
            s = jax.lax.cond(
                take2,
                lambda t: _with_nm(
                    t, _update_point(_nm_state_tuple(t), t.hi, x, val)
                ),
                lambda t: _with_nm(
                    t,
                    _update_point(
                        _nm_state_tuple(t), t.hi, t.pend_x, t.pend_val
                    ),
                ),
                s,
            )
            return complete(s)

        def upd_contract(s):
            def one_dim(s):
                s = _with_nm(
                    s, _update_point(_nm_state_tuple(s), s.hi, x, val)
                )
                return complete(s)

            def to_contract_all(s):
                # contract every non-best corner toward the best; corners
                # are re-evaluated one per loop trip in index order
                best_x = s.x1[s.lo]
                new_x1 = 0.5 * (s.x1 + best_x[None, :])
                new_x1 = new_x1.at[s.lo].set(best_x)
                first = jnp.where(s.lo == 0, i32(1), i32(0))
                return s._replace(
                    ca_x1=new_x1, idx=first, phase=i32(_CONTRACT_ALL)
                )

            return jax.lax.cond(
                jnp.isfinite(val) & (val <= s.y1[s.hi]),
                one_dim, to_contract_all, s,
            )

        def upd_contract_all(s):
            s = s._replace(y1=s.y1.at[s.idx].set(val))
            nxt = s.idx + 1
            nxt = jnp.where(nxt == s.lo, nxt + 1, nxt)

            def finish(s):
                center, s2 = _compute_center_size(s.ca_x1)
                s = s._replace(x1=s.ca_x1, center=center, s2=s2)
                return complete(s)

            return jax.lax.cond(
                nxt > p - 1, finish, lambda t: t._replace(idx=nxt), s
            )

        return jax.lax.switch(
            s.phase,
            [upd_init, upd_reflect, upd_expand, upd_contract, upd_contract_all],
            s,
        )

    def cond(s: LeanState):
        return (~s.converged) & (s.iterations < max_iterations)

    def body(s: LeanState) -> LeanState:
        s, x_eval = select(s)
        val = f(x_eval)  # the ONE objective instantiation in the program
        return update(s, x_eval, val)

    final = jax.lax.while_loop(cond, body, state)
    lo = jnp.argmin(final.y1)
    return NmResult(
        x=final.x1[lo],
        fval=final.y1[lo],
        converged=final.converged,
        iterations=final.iterations,
    )
