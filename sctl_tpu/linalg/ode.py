"""Spectral Deferred Correction (SDC) ODE integrator.

TPU-native rebuild of the reference solver (reference:
include/sctl/ode-solver.hpp, ode-solver.txx:74-306; SURVEY.md §3.6).
Algorithm preserved exactly:

  - collocation on 2nd-kind Chebyshev nodes of [0,1]
    (ode-solver.txx:83-89)
  - integration matrix M_time_step (row i integrates the Lagrange
    interpolant from 0 to nds[i]) and interpolation-defect error matrix
    M_error, both precomputed in extended precision — double-double
    here, QuadReal in the reference (ode-solver.txx:77-131)
  - one step = Picard iterations, each a GEMM Mv = M_time_step @ Mf
    followed by an explicit-Euler "residual time-stepping" sweep
    re-evaluating F at each substep (ode-solver.txx:200-238), with
    convergence/divergence detection on max|dMv|*dt
  - AdaptiveSolve: accept if max(err_interp, err_picard) < tol_*dt;
    dt <- min(T-t, max(0.5 dt, 0.9 dt ((tol_ dt)/err)^(1/order)))
    (Quaife-Biros step control, ode-solver.txx:264-299)

State u may be any jax array (sharded or not); max-norms under jit
reduce across shards via GSPMD (the reference's comm.Allreduce(MAX),
ode-solver.txx:144-153).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .. import quadmath as qm
from .lagrange import interpolation_matrix


class StepInfo(NamedTuple):
    error_interp: float
    error_picard: float
    norm_dudt: float
    picard_iter: int


def _second_kind_cheb_nds_dd(order: int) -> qm.DD:
    i = np.arange(order, dtype=np.float64)
    ang = qm.dd_mul(qm.dd_div(qm.dd_pi(), qm.DD(float(order - 1))),
                    qm.DD(i))
    c = qm.dd_cos(ang)
    return qm.dd_add(qm.DD(0.5), qm.dd_mul(qm.DD(-0.5), c))


def _cc_quad_dd(order: int):
    """Clenshaw-Curtis nodes/weights on [0,1] (weights at f64 accuracy;
    nodes in DD)."""
    from .quadrule import cheb_quad_rule
    nds_dd = _second_kind_cheb_nds_dd(order)
    _, wts = cheb_quad_rule(order)
    return nds_dd, qm.DD(wts)


class SDC:
    """SDC(order) — one-step integrator + adaptive driver
    (reference API: SDC<Real>(Order, comm))."""

    def __init__(self, order: int, comm=None, dtype=jnp.float64):
        assert order >= 2
        self.order = order
        o = order

        nds0 = _second_kind_cheb_nds_dd(o)

        # M_error = (interp down to order-1 nodes and back)^T - I
        trunc = o - 1
        nds1 = _second_kind_cheb_nds_dd(trunc)
        i0 = interpolation_matrix(nds0, nds1, dd=True)     # (o, trunc)
        i1 = interpolation_matrix(nds1, nds0, dd=True)     # (trunc, o)
        m_err = (i0 @ i1).T - np.eye(o)
        self.M_error = jnp.asarray(m_err, dtype=dtype)

        # M_time_step: row i maps f(nds) -> integral_0^{nds[i]} interp(f)
        qx_dd, qw_dd = _cc_quad_dd(o)
        qx64 = qx_dd.to_float64()
        qw64 = qw_dd.to_float64()
        nds64 = nds0.to_float64()
        m_ts = np.zeros((o, o))
        for i in range(o):
            scaled = qm.dd_mul(qx_dd, qm.DD(nds64[i]))
            minterp = interpolation_matrix(nds0, scaled, dd=True)  # (o,o)
            m_ts[i, :] = (minterp @ qw64) * nds64[i]
        self.M_time_step = jnp.asarray(m_ts, dtype=dtype)
        self.nds = jnp.asarray(nds64, dtype=dtype)
        self._nds64 = nds64

    def __call__(self, dt: float, u0, F: Callable,
                 n_picard: Optional[int] = None,
                 tol_picard: float = 0.0):
        """One step: solve u = u0 + int_0^dt F(u).  Returns (u, info)
        (reference: SDC::operator(), ode-solver.txx:143-255)."""
        o = self.order
        if n_picard is None:
            n_picard = o
        u0 = jnp.asarray(u0)
        dof = u0.shape

        f00 = F(u0)
        Mu = [u0 for _ in range(o)]
        Mf0 = [f00 for _ in range(o)]
        Mf1 = [f00 for _ in range(o)]
        Mv = jnp.zeros((o,) + dof, dtype=u0.dtype)

        nds = self._nds64
        picard_err = []
        it = 0
        while it < n_picard:
            Mf0_stack = jnp.stack(Mf0)                         # (o, ...)
            Mv_new = jnp.tensordot(self.M_time_step, Mf0_stack,
                                   axes=([1], [0]))
            change = float(jnp.max(jnp.abs(Mv - Mv_new))) * dt
            Mv = Mv_new
            picard_err.append(change)
            if change < tol_picard or (
                    it > 1 and picard_err[it] > picard_err[it - 2]):
                for i in range(1, o):
                    Mu[i] = u0 + Mv[i] * dt
                break

            # residual time-stepping sweep (ode-solver.txx:216-236)
            v_corr = jnp.zeros_like(u0)
            for i in range(1, o):
                v_corr = v_corr + (Mf1[i - 1] - Mf0[i - 1]) * (
                    nds[i] - nds[i - 1])
                Mv = Mv.at[i].add(v_corr)
                Mu[i] = u0 + Mv[i] * dt
                Mf1[i] = F(Mu[i])
            Mf0 = list(Mf1)
            it += 1

        u = Mu[o - 1]
        err_picard = picard_err[min(it, n_picard - 1)] \
            if picard_err else 0.0
        err_mat = jnp.tensordot(self.M_error, Mv, axes=([1], [0]))
        err_interp = float(jnp.max(jnp.abs(err_mat))) * dt
        norm_dudt = float(jnp.max(jnp.abs(Mv))) * dt
        return u, StepInfo(err_interp, err_picard, norm_dudt, it)

    def adaptive_solve(self, dt: float, T: float, u0, F: Callable,
                       tol: float, monitor: Optional[Callable] = None,
                       continue_with_errors: bool = False):
        """Adaptive time stepping to time T (reference:
        SDC::AdaptiveSolve, ode-solver.txx:264-299).
        Returns (u, t_reached, accumulated_error)."""
        o = self.order
        eps = float(jnp.finfo(jnp.asarray(u0).dtype).eps)
        u0_ = jnp.asarray(u0)
        t, err_total = 0.0, 0.0
        while t < T and dt > eps * T:
            tol_ = max(tol / T, (tol - err_total) / (T - t))
            u_, info = self(dt, u0_, F, n_picard=2 * o,
                            tol_picard=tol_ * dt * 0.8 ** o)
            max_err = max(info.error_interp, info.error_picard)
            tiny = (continue_with_errors and info.norm_dudt > 0
                    and max_err / info.norm_dudt < 2 * eps)
            if max_err < tol_ * dt or tiny:
                u0_ = u_
                t += dt
                err_total += max_err
                if monitor is not None:
                    monitor(t, dt, u0_)
            if tiny:
                dt = min(T - t, 1.1 * dt)
            else:
                dt = min(T - t, max(
                    0.5 * dt,
                    0.9 * dt * ((tol_ * dt) / max_err) ** (1.0 / o)))
            if T - t <= 0:
                break
        return u0_, t, err_total
