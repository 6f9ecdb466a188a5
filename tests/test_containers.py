"""Container tests (reference anchors: src/test.cpp GEMM demo,
src/test-tensor.cpp, matrix.hpp SVD/pinv)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu import Vector, Matrix, Permutation, Tensor
from sctl_tpu import write_array, read_array


def test_vector_ops():
    v = Vector(jnp.arange(5.0))
    w = v * 2.0 + 1.0
    np.testing.assert_allclose(np.asarray(w.data), 2 * np.arange(5.0) + 1)
    assert v.dim() == 5
    v2 = v.push_back(9.0)
    assert v2.dim() == 6 and float(v2[5]) == 9.0


def test_vector_io(tmp_path):
    v = Vector(np.random.default_rng(0).normal(size=100))
    p = str(tmp_path / "v.bin")
    v.write(p, dtype=np.float32)  # cross-dtype write
    v2 = Vector.read(p, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(v2.data), np.asarray(v.data),
                               rtol=1e-6)


def test_matrix_gemm():
    rng = np.random.default_rng(1)
    a, b = rng.normal(size=(17, 23)), rng.normal(size=(23, 11))
    c = Matrix(a) @ Matrix(b)
    np.testing.assert_allclose(np.asarray(c.data), a @ b, atol=1e-12)


def test_matrix_svd_pinv():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(12, 8))
    m = Matrix(a)
    u, s, vt = m.svd()
    recon = np.asarray(u.data) * np.asarray(s.data) @ np.asarray(vt.data)
    np.testing.assert_allclose(recon, a, atol=1e-12)
    pinv = m.pinv()
    np.testing.assert_allclose(np.asarray((pinv @ m).data), np.eye(8),
                               atol=1e-10)


def test_permutation():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(6, 6))
    p = Permutation.rand_perm(6)
    m = Matrix(a)
    via_matrix = (p.get_matrix() @ m).data
    via_perm = m.row_perm(p).data
    np.testing.assert_allclose(np.asarray(via_perm),
                               np.asarray(via_matrix), atol=1e-12)
    # transpose operator == matrix transpose
    np.testing.assert_allclose(np.asarray(p.transpose().get_matrix().data),
                               np.asarray(p.get_matrix().data).T, atol=1e-12)
    # for unit scal, P @ P^T is the identity
    pu = Permutation(p.perm)
    ident = (pu @ pu.transpose()).get_matrix().data
    np.testing.assert_allclose(np.asarray(ident), np.eye(6), atol=1e-12)


def test_tensor():
    t = Tensor(np.arange(24.0), shape=(2, 3, 4))
    assert t.order == 3 and t.size == 24 and t.dim(1) == 3
    r = t.rotate_left()
    assert r.data.shape == (3, 4, 2)
    rr = r.rotate_right()
    np.testing.assert_array_equal(np.asarray(rr.data), np.asarray(t.data))


def test_write_read_roundtrip(tmp_path):
    a = np.random.default_rng(4).normal(size=(3, 5)).astype(np.float64)
    p = str(tmp_path / "m.bin")
    write_array(p, a)
    b = read_array(p)
    np.testing.assert_array_equal(a, b)
