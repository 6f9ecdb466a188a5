"""SDC ODE solver tests (reference anchors: src/test-ode-solver.cpp —
order-5 @ tol 1e-5 and order-12 @ tol 1e-12 vs cos(T), T=10;
SDC::test_one_step / test_adaptive_solve, ode-solver.txx:27-72)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu.linalg import SDC


def harmonic(u):
    """du/dt = (-u1, u0): solution u0(t) = cos(t) from (1,0)."""
    return jnp.stack([-u[1], u[0]])


def test_one_step_convergence_order():
    """Error of a single step scales ~ dt^order."""
    for order in (3, 5):
        solver = SDC(order)
        errs = []
        for dt in (0.2, 0.1):
            u, info = solver(dt, jnp.asarray([1.0, 0.0]), harmonic)
            errs.append(abs(float(u[0]) - np.cos(dt)))
        rate = np.log2(errs[0] / max(errs[1], 1e-17))
        assert rate > order - 1.2, (order, errs, rate)


def test_fixed_step_integration():
    """Mirror of SDC::test_one_step: dt=0.1 to T=10, order 5."""
    solver = SDC(5)
    u0 = jnp.asarray([1.0, 0.0])
    t = 0.0
    while t < 10.0 - 1e-12:
        u0, info = solver(0.1, u0, harmonic)
        t += 0.1
    err = abs(float(u0[0]) - np.cos(10.0))
    assert err < 1e-6, err


@pytest.mark.parametrize("order,tol", [(5, 1e-5), (12, 1e-12)])
def test_adaptive_solve(order, tol):
    """Mirror of src/test-ode-solver.cpp:26-27."""
    solver = SDC(order)
    u, t, err_acc = solver.adaptive_solve(
        0.1, 10.0, jnp.asarray([1.0, 0.0]), harmonic, tol)
    assert abs(t - 10.0) < 1e-12
    err = abs(float(u[0]) - np.cos(10.0))
    assert err < tol * 10, (order, tol, err)


def test_picard_info():
    solver = SDC(4)
    u, info = solver(0.05, jnp.asarray([1.0, 0.0]), harmonic)
    assert info.picard_iter <= 4
    assert info.error_interp < 1e-6
    assert 0.04 < info.norm_dudt < 0.06  # |du| ~ dt for unit-speed orbit
