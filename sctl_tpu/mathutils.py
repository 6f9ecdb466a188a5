"""Scalar math utilities.

TPU-native equivalent of the reference's math layer (reference:
include/sctl/math_utils.hpp:18-51,60-110 — `const_pi`, `const_e`,
`machine_eps`, `significant_bits`, `atoreal`, libm wrappers).  The libm
wrappers themselves are unnecessary here (jnp provides them); what survives
is the precision introspection used by algorithms that pick iteration
counts / polynomial orders from the target accuracy (e.g. `approx_rsqrt<
digits>` Newton refinement, quadrature tolerances).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from . import quadmath


def const_pi(dtype=jnp.float64):
    """pi in the given dtype; for quadmath.DD use quadmath.dd_pi()."""
    if dtype is quadmath.DD:
        return quadmath.dd_pi()
    return np.asarray(math.pi, dtype=dtype)


def const_e(dtype=jnp.float64):
    if dtype is quadmath.DD:
        return quadmath.dd_e()
    return np.asarray(math.e, dtype=dtype)


def machine_eps(dtype=jnp.float64) -> float:
    """Machine epsilon of dtype (reference: math_utils.hpp:18-22)."""
    if dtype is quadmath.DD:
        return 2.0 ** -104  # double-double effective epsilon
    return float(jnp.finfo(dtype).eps)


def significant_bits(dtype=jnp.float64) -> int:
    """Mantissa bits of dtype (reference: math_utils.hpp:24-26)."""
    if dtype is quadmath.DD:
        return 104
    return int(jnp.finfo(dtype).nmant) + 1


def digits(dtype=jnp.float64) -> int:
    """Significant decimal digits of dtype."""
    return int(math.floor(significant_bits(dtype) * math.log10(2.0)))


def atoreal(s: str, dtype=jnp.float64):
    """Parse a decimal string into dtype (reference: math_utils.hpp:35).

    For DD the parse keeps ~32 significant digits by splitting the value
    into a float64 leading part plus a float64 correction.
    """
    if dtype is quadmath.DD:
        return quadmath.dd_from_string(s)
    return np.asarray(float(s), dtype=dtype)


def pow_int(x, n: int):
    """x**n by binary exponentiation for integer n (works for DD too)."""
    if isinstance(x, quadmath.DD):
        return quadmath.dd_powi(x, n)
    return x ** n
