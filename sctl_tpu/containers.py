"""Containers: Vector / Matrix / Permutation / Tensor over jax.Array.

TPU-native equivalents of the reference containers (reference:
include/sctl/vector.hpp, matrix.hpp, permutation.hpp, tensor.hpp).  The
reference classes are mutable aligned buffers; on TPU the idiomatic design
is a thin *functional* wrapper over an immutable ``jax.Array``: methods
return new objects, XLA owns layout/alignment, and `jit`/`vmap`/sharding
work through them because they are registered as pytrees.

Capability parity:
  Vector:       dim, elementwise ops, concat/push_back, binary Write/Read
                with cross-dtype conversion (vector.hpp:94-117)
  Matrix:       GEMM (matrix.hpp:205-225), RowPerm/ColPerm (342-349),
                Transpose (356-364), SVD (367-375), pinv (385), IO (81-104)
  Permutation:  perm indices + diagonal scal, compose/apply
                (permutation.hpp:21-...)
  Tensor:       statically-shaped tensor, Order/Size/Dim constexpr
                (tensor.hpp:30-45) — here just a shaped alias of jnp ops.

The aligned arena allocator + MEMDEBUG iterators (mem_mgr.hpp,
iterator.hpp) have no TPU equivalent by design: XLA owns device memory and
bounds safety; the diagnosability story is `sctl_tpu.debug` guards.
"""

from __future__ import annotations

import struct
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"SCTL_TPU"
_DTYPE_CODES = {
    "float32": 0, "float64": 1, "int32": 2, "int64": 3,
    "uint32": 4, "uint64": 5, "complex64": 6, "complex128": 7,
    "bfloat16": 8, "int8": 9, "uint8": 10, "bool": 11, "float16": 12,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}


def write_array(path: str, arr, dtype=None) -> None:
    """Binary array writer with optional cross-dtype conversion.

    Equivalent of Vector/Matrix::Write<Type> (vector.hpp:94-117,
    matrix.hpp:81-104): header (magic, dtype code, ndim, dims) + raw data.
    """
    a = np.asarray(arr)
    if dtype is not None:
        a = a.astype(dtype)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<II", _DTYPE_CODES[str(a.dtype)], a.ndim))
        f.write(struct.pack(f"<{a.ndim}Q", *a.shape))
        f.write(np.ascontiguousarray(a).tobytes())


def read_array(path: str, dtype=None) -> np.ndarray:
    """Read an array written by write_array, converting to dtype if given.

    NOTE: this format (magic + dtype code + ndim + dims) is
    intentionally richer than the reference's raw (dim0, dim1) uint64
    header — it is self-describing in dtype and rank.  For migrating
    caches produced by the reference's Vector/Matrix::Write, use
    read_array_sctl/write_array_sctl below.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: bad magic {magic!r}")
        code, ndim = struct.unpack("<II", f.read(8))
        shape = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
        a = np.frombuffer(f.read(), dtype=_CODE_DTYPES[code]).reshape(shape)
    if dtype is not None:
        a = a.astype(dtype)
    return a


def read_array_sctl(path: str, dtype, out_dtype=None) -> np.ndarray:
    """Read a file produced by the reference's Vector/Matrix::Write
    (vector.txx:107-118, matrix.txx:114-126): little-endian
    (dim0, dim1) uint64 header + raw ValueType data.  The element
    dtype is NOT stored on disk — the caller must supply it, exactly
    as the reference caller knows the template ValueType.

    Returns shape (dim0,) when dim1 == 1 (Vector layout), else
    (dim0, dim1) (Matrix layout).
    """
    with open(path, "rb") as f:
        d0, d1 = struct.unpack("<QQ", f.read(16))
        a = np.frombuffer(f.read(), dtype=np.dtype(dtype)
                          ).reshape(d0, d1)
    a = a[:, 0] if d1 == 1 else a
    return a.astype(out_dtype) if out_dtype is not None else a


def write_array_sctl(path: str, arr, dtype=None) -> None:
    """Write in the reference's Vector/Matrix::Write layout (see
    read_array_sctl) so files are interchangeable with reference-
    produced cached tables.  1-D arrays use the Vector layout
    (dim1=1); 2-D use the Matrix layout."""
    a = np.asarray(arr)
    if dtype is not None:
        a = a.astype(dtype)
    if a.ndim == 1:
        d0, d1 = a.shape[0], 1
    elif a.ndim == 2:
        d0, d1 = a.shape
    else:
        raise ValueError("reference layout is 1-D/2-D only")
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", d0, d1))
        f.write(np.ascontiguousarray(a).tobytes())


@jax.tree_util.register_pytree_node_class
class Vector:
    """1-D array wrapper (reference: vector.hpp)."""

    def __init__(self, data=()):
        self.data = jnp.atleast_1d(jnp.asarray(data))

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data = children[0]
        return obj

    def dim(self) -> int:
        return self.data.shape[0]

    def __len__(self):
        return self.dim()

    def __getitem__(self, i):
        return self.data[i]

    def set(self, i, v) -> "Vector":
        return Vector(self.data.at[i].set(v))

    def push_back(self, v) -> "Vector":
        return Vector(jnp.concatenate([self.data, jnp.atleast_1d(
            jnp.asarray(v, dtype=self.data.dtype))]))

    # elementwise arithmetic
    def _bin(self, other, op):
        o = other.data if isinstance(other, Vector) else other
        return Vector(op(self.data, o))

    def __add__(self, o):
        return self._bin(o, jnp.add)

    def __radd__(self, o):
        return self._bin(o, lambda a, b: jnp.add(b, a))

    def __sub__(self, o):
        return self._bin(o, jnp.subtract)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: jnp.subtract(b, a))

    def __mul__(self, o):
        return self._bin(o, jnp.multiply)

    def __rmul__(self, o):
        return self._bin(o, lambda a, b: jnp.multiply(b, a))

    def __truediv__(self, o):
        return self._bin(o, jnp.divide)

    def __neg__(self):
        return Vector(-self.data)

    def norm2(self):
        return jnp.linalg.norm(self.data)

    def write(self, path: str, dtype=None) -> None:
        write_array(path, self.data, dtype)

    @staticmethod
    def read(path: str, dtype=None) -> "Vector":
        return Vector(read_array(path, dtype))

    def __repr__(self):
        return f"Vector({self.data})"


@jax.tree_util.register_pytree_node_class
class Matrix:
    """Row-major 2-D matrix wrapper (reference: matrix.hpp)."""

    def __init__(self, data):
        d = jnp.asarray(data)
        if d.ndim == 1:
            d = d[None, :]
        assert d.ndim == 2, f"Matrix needs 2-D data, got {d.ndim}-D"
        self.data = d

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data = children[0]
        return obj

    @staticmethod
    def zeros(n0: int, n1: int, dtype=jnp.float64) -> "Matrix":
        return Matrix(jnp.zeros((n0, n1), dtype=dtype))

    def dim(self, i: int) -> int:
        return self.data.shape[i]

    def __getitem__(self, idx):
        return self.data[idx]

    # -- ops (reference: matrix.hpp:205-225, GEMM on MXU via jnp.dot) ----
    def __matmul__(self, other: "Matrix") -> "Matrix":
        return Matrix(jnp.dot(self.data, other.data,
                              preferred_element_type=self.data.dtype))

    def __add__(self, o):
        o = o.data if isinstance(o, Matrix) else o
        return Matrix(self.data + o)

    def __sub__(self, o):
        o = o.data if isinstance(o, Matrix) else o
        return Matrix(self.data - o)

    def __mul__(self, s):
        return Matrix(self.data * s)

    def __rmul__(self, s):
        return Matrix(s * self.data)

    def __neg__(self):
        return Matrix(-self.data)

    def transpose(self) -> "Matrix":
        return Matrix(self.data.T)

    def svd(self):
        """Full SVD, (U, S, Vt) — reference: matrix.hpp:367-375."""
        u, s, vt = jnp.linalg.svd(self.data, full_matrices=False)
        return Matrix(u), Vector(s), Matrix(vt)

    def pinv(self, eps: Optional[float] = None) -> "Matrix":
        """Moore-Penrose pseudo-inverse via SVD (matrix.hpp:385)."""
        u, s, vt = jnp.linalg.svd(self.data, full_matrices=False)
        if eps is None:
            eps = float(jnp.finfo(self.data.dtype).eps) * max(
                self.data.shape)
        cutoff = eps * jnp.max(s)
        sinv = jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0),
                         0.0)
        return Matrix((vt.T * sinv) @ u.T)

    def row_perm(self, p: "Permutation") -> "Matrix":
        """M -> P * M: permute+scale rows (matrix.hpp:342-345)."""
        return Matrix(self.data[p.perm, :] * p.scal[:, None])

    def col_perm(self, p: "Permutation") -> "Matrix":
        """M -> M * P: permute+scale cols (matrix.hpp:346-349)."""
        return Matrix(self.data[:, p.perm] * p.scal[None, :])

    def write(self, path: str, dtype=None) -> None:
        write_array(path, self.data, dtype)

    @staticmethod
    def read(path: str, dtype=None) -> "Matrix":
        return Matrix(read_array(path, dtype))

    def __repr__(self):
        return f"Matrix({self.data})"


@jax.tree_util.register_pytree_node_class
class Permutation:
    """Permutation operator: P = scal * perm-matrix (permutation.hpp:21).

    Applying to a Matrix permutes rows/cols and scales by the diagonal.
    """

    def __init__(self, perm, scal=None):
        self.perm = jnp.asarray(perm, dtype=jnp.int32)
        self.scal = (jnp.asarray(scal) if scal is not None
                     else jnp.ones(self.perm.shape, dtype=jnp.float64))

    def tree_flatten(self):
        return (self.perm, self.scal), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.perm, obj.scal = children
        return obj

    @staticmethod
    def rand_perm(n: int, key=None) -> "Permutation":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        return Permutation(jax.random.permutation(k1, n),
                           jax.random.uniform(k2, (n,), dtype=jnp.float64))

    def dim(self) -> int:
        return self.perm.shape[0]

    def get_matrix(self) -> Matrix:
        n = self.dim()
        m = jnp.zeros((n, n), dtype=self.scal.dtype)
        m = m.at[jnp.arange(n), self.perm].set(self.scal)
        return Matrix(m)

    def transpose(self) -> "Permutation":
        inv = jnp.argsort(self.perm)
        return Permutation(inv, self.scal[inv])

    def __matmul__(self, other):
        if isinstance(other, Permutation):
            # (P1*P2)(e_i): row view — matches GetMatrix composition
            return Permutation(self.perm[other.perm],
                               self.scal[other.perm] * other.scal)
        if isinstance(other, Matrix):
            return other.row_perm(self)
        raise TypeError(type(other))


class Tensor:
    """Statically-shaped tensor (reference: tensor.hpp:30-45).

    In JAX every jnp array already carries a static shape under jit, so
    this is a minimal shim kept for API parity; prefer raw jnp arrays.
    """

    def __init__(self, data, shape=None):
        self.data = jnp.asarray(data)
        if shape is not None:
            self.data = self.data.reshape(shape)

    @property
    def order(self) -> int:
        return self.data.ndim

    @property
    def size(self) -> int:
        return self.data.size

    def dim(self, i: int) -> int:
        return self.data.shape[i]

    def rotate_left(self) -> "Tensor":
        """Cyclic axis rotation (tensor.hpp:12-13)."""
        return Tensor(jnp.moveaxis(self.data, 0, -1))

    def rotate_right(self) -> "Tensor":
        return Tensor(jnp.moveaxis(self.data, -1, 0))

    def __add__(self, o):
        return Tensor(self.data + (o.data if isinstance(o, Tensor) else o))

    def __sub__(self, o):
        return Tensor(self.data - (o.data if isinstance(o, Tensor) else o))

    def __mul__(self, s):
        return Tensor(self.data * s)

    def __matmul__(self, o):
        return Tensor(jnp.tensordot(self.data,
                                    o.data if isinstance(o, Tensor) else o,
                                    axes=1))
