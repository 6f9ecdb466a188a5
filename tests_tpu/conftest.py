"""Hardware-gated tests: run on the REAL backend (TPU), unlike
`tests/` whose conftest pins an 8-device virtual CPU mesh.

Run manually / from CI-with-hardware:  python -m pytest tests_tpu/ -q
Every test here skips itself unless jax.default_backend() is a TPU
backend, so the suite is a no-op on CPU-only machines.
"""

import jax
import pytest


def tpu_only():
    return pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="needs real TPU hardware")
