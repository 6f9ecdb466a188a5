"""Distributed (slab-sharded) KIFMM vs single-chip oracle on the
8-device CPU mesh (the multi-chip FMM of SURVEY.md §3.4/§5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu.fmm import KIFMM
from sctl_tpu.fmm.kifmm_dist import KIFMMDist
from sctl_tpu.ops import Laplace3D_FxU, Laplace3D_DxU, \
    direct_eval_blocked

RNG = np.random.default_rng(0)


def rel_err(u, ref):
    return float(np.abs(u - ref).max() / (np.abs(ref).max() + 1e-300))


from conftest import skip_if_cpu_starved  # noqa: E402


@pytest.mark.parametrize("depth", [
    3, pytest.param(4, marks=skip_if_cpu_starved)])
def test_dist_matches_direct(mesh8, depth):
    n = 5000
    xs = RNG.random((n, 3))
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    dist = KIFMMDist(Laplace3D_FxU, mesh8, p=6, depth=depth).setup(
        xs, xt)
    u = dist.eval(f)
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f)))
    assert rel_err(u, u_ref) < 5e-4, rel_err(u, u_ref)


def test_dist_matches_single_chip(mesh8):
    """Bitwise-level agreement with the single-chip engine is not
    expected (different M2L sweep order); accuracy-level agreement is."""
    n = 4000
    xs = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    dist = KIFMMDist(Laplace3D_FxU, mesh8, p=6, depth=3).setup(xs, xs)
    u_d = dist.eval(f)
    single = KIFMM(Laplace3D_FxU, p=6, depth=3).setup(xs, xs)
    u_s = single.eval(f)
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(xs), jnp.asarray(xs),
        jnp.asarray(f)))
    assert rel_err(u_d, u_ref) < 5e-4
    assert rel_err(u_d, u_s) < 1e-4  # same operators, same accuracy


def test_dist_double_layer(mesh8):
    n = 3000
    xs = RNG.random((n, 3))
    nrm = RNG.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    dist = KIFMMDist(Laplace3D_DxU, mesh8, p=6, depth=3).setup(
        xs, xt, n_src=nrm)
    u = dist.eval(f)
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_DxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f), ns=jnp.asarray(nrm)))
    assert rel_err(u, u_ref) < 1e-3, rel_err(u, u_ref)


def test_adaptive_fmm_sharded_matches(mesh8):
    """eval_sharded over the 8-device mesh == single-device eval
    (work-sharded leaf stages + psum'd moments)."""
    import jax.numpy as jnp
    from sctl_tpu.fmm.adaptive import AdaptiveFMM
    from sctl_tpu.ops import Laplace3D_FxU

    rng = np.random.default_rng(42)
    # surface-concentrated (nonuniform) points: the adaptive case
    th = rng.uniform(0, np.pi, 3000)
    ph = rng.uniform(0, 2 * np.pi, 3000)
    xs = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                   np.cos(th)], 1)
    f = rng.normal(size=(3000, 1))
    fmm = AdaptiveFMM(Laplace3D_FxU, p=4, max_pts=40).setup(xs, xs)
    u1 = fmm.eval(f)
    u8 = fmm.eval_sharded(f, mesh8)
    scale = np.abs(u1).max()
    assert np.abs(u8 - u1).max() < 1e-10 * scale
