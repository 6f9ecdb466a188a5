"""par/debug/vtu/native tests (reference anchors: ompUtils primitives,
MEMDEBUG behavior of src/test.cpp, VTUData::test)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import sctl_tpu
from sctl_tpu.utils import merge, merge_sort, reduce, scan, debug


def test_par_primitives():
    a = jnp.sort(jnp.asarray(np.random.default_rng(0).normal(size=20)))
    b = jnp.sort(jnp.asarray(np.random.default_rng(1).normal(size=30)))
    m = merge(a, b)
    np.testing.assert_array_equal(
        np.asarray(m), np.sort(np.concatenate([np.asarray(a),
                                               np.asarray(b)])))
    k = jnp.asarray([3.0, 1.0, 2.0])
    v = jnp.asarray([30.0, 10.0, 20.0])
    ks, vs = merge_sort(v, keys=k)
    np.testing.assert_array_equal(np.asarray(vs), [10.0, 20.0, 30.0])
    assert float(reduce(jnp.arange(5.0))) == 10.0
    np.testing.assert_array_equal(
        np.asarray(scan(jnp.arange(1.0, 5.0))), [0, 1, 3, 6])
    np.testing.assert_array_equal(
        np.asarray(scan(jnp.arange(1.0, 5.0), exclusive=False)),
        [1, 3, 6, 10])


def test_debug_guard():
    sctl_tpu.config.debug = True
    try:
        @debug.guard
        def f(x):
            return x * 2

        f(jnp.ones(3))  # fine
        with pytest.raises(FloatingPointError):
            f(jnp.asarray([1.0, np.nan]))
    finally:
        sctl_tpu.config.debug = False


def test_vtu_roundtrip(tmp_path):
    from sctl_tpu.tree.vtu import VTUData, write_particle_vtk, \
        write_tree_vtk
    from sctl_tpu.tree import PtTree
    rng = np.random.default_rng(0)
    X = rng.random((100, 3))
    p = str(tmp_path / "pts")
    write_particle_vtk(p, X, values=rng.normal(size=100))
    content = open(p + ".vtu").read()
    assert "UnstructuredGrid" in content and "value" in content

    tree = PtTree(dim=3).update_refinement(X, max_pts=20)
    pt = str(tmp_path / "tree")
    write_tree_vtk(pt, tree)
    assert "Float32" in open(pt + ".vtu").read()

    VTUData.write_pvtu(str(tmp_path / "master"), 4,
                       point_fields=[("value", 1)])
    assert "master_0003.vtu" in open(
        str(tmp_path / "master.pvtu")).read()


def test_native_sort_fallback_consistency():
    from sctl_tpu import native
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 1 << 12, size=5000).astype(np.int64)
    s, p = native.argsort_small(ids, 12)
    assert (np.diff(s) >= 0).all()
    np.testing.assert_array_equal(ids[p], s)
    # stability: equal keys keep input order
    for val in np.unique(ids[:50]):
        np.testing.assert_array_equal(np.sort(p[s == val]),
                                      np.where(ids == val)[0])
    k = rng.integers(0, 2 ** 60, size=3000, dtype=np.uint64)
    ks, kp = native.argsort_u64(k)
    np.testing.assert_array_equal(k[kp], ks)
    assert (np.diff(ks.astype(object)) >= 0).all()


def test_checkpoint_pytree(tmp_path):
    """Solver-state checkpointing (SURVEY §5.4 orbax-style mapping)."""
    from sctl_tpu.utils import checkpoint as ckpt
    tree = {"a": jnp.arange(8.0), "b": [jnp.ones((3, 2)),
                                        jnp.asarray(2.5)]}
    p = str(tmp_path / "state")
    ckpt.save(p, tree)
    back = ckpt.restore(p, like=tree)
    import jax
    for l1, l2 in zip(jax.tree_util.tree_leaves(tree),
                      jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1))


def test_checkpoint_krylov_roundtrip(tmp_path):
    """Persist and reuse a Krylov preconditioner across 'runs'
    (the test-linear-solver.cpp reuse scenario, but via checkpoint)."""
    from sctl_tpu.utils import checkpoint as ckpt
    from sctl_tpu.linalg import gmres, KrylovPrecond
    rng = np.random.default_rng(7)
    N = 80
    A = jnp.asarray(rng.random((N, N)) / N + np.eye(N))
    op = lambda v: A @ v
    kp = KrylovPrecond()
    b = jnp.asarray(rng.random(N))
    _, it1 = gmres(op, b, tol=1e-10, krylov_precond=kp)
    p = str(tmp_path / "kp")
    ckpt.save_krylov_precond(p, kp)
    kp2 = ckpt.restore_krylov_precond(p)
    assert kp2.rank() == kp.rank() and kp2.size() == kp.size()
    b2 = jnp.asarray(rng.random(N))
    _, it_fresh = gmres(op, b2, tol=1e-10)
    _, it_restored = gmres(op, b2, tol=1e-10, krylov_precond=kp2)
    assert it_restored <= it_fresh


def test_shape_contract():
    """MEMDEBUG-style shape/dtype contracts at API boundaries
    (reference iterator.txx:42-55 bounds discipline, SURVEY §5.2)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from sctl_tpu.config import config
    from sctl_tpu.utils.debug import shape_contract
    from sctl_tpu.ops import Laplace3D_FxU, direct_eval

    @shape_contract(a=("N", 3, "float"), b=("N", None))
    def f(a, b):
        return a.sum() + b.sum()

    a = jnp.ones((5, 3))
    old = config.debug
    config.debug = True
    try:
        f(a, jnp.ones((5, 2)))                      # OK
        with pytest.raises(ValueError):
            f(a, jnp.ones((4, 2)))                  # 'N' mismatch
        with pytest.raises(ValueError):
            f(jnp.ones((5, 2)), jnp.ones((5, 2)))   # dim != 3
        with pytest.raises(ValueError):
            f(jnp.ones((5, 3), jnp.int32), jnp.ones((5, 2)))
        # a real entry point carries the contract
        with pytest.raises(ValueError):
            direct_eval(Laplace3D_FxU, jnp.ones((4, 2)),
                        jnp.ones((3, 3)), jnp.ones((3, 1)))
    finally:
        config.debug = old
    # checks off when debug is off
    assert float(f(jnp.ones((4, 3)), jnp.ones((9, 2)))) == 30.0


def test_checked_call_catches_oob():
    """checkify index-bounds story (MEMDEBUG pointer-bounds analogue):
    an out-of-bounds gather inside jit raises instead of clamping."""
    import jax
    import jax.numpy as jnp
    import pytest
    from sctl_tpu.utils.debug import checked_call

    def f(x, i):
        return x[i]

    x = jnp.arange(4.0)
    assert float(checked_call(f, x, jnp.int32(2))) == 2.0
    with pytest.raises(Exception):
        checked_call(f, x, jnp.int32(7))
