"""Test configuration: 8-device virtual CPU mesh + float64.

Mirrors the reference's multi-node testing strategy (SURVEY.md §4): the
reference runs all distributed algorithms on a 1-rank self-communicator in
CI; here the same sharded programs run on an 8-device CPU mesh created via
--xla_force_host_platform_device_count, exercising the real collective
code paths without TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# XLA's in-process CPU collectives terminate the PROCESS when a
# rendezvous takes > 40 s (hardcoded, xla rendezvous.cc:127: "Exiting
# to ensure a consistent program state").  On hosts with fewer cores
# than mesh devices the 8 shard threads timeshare the cores, so any
# shard program with > ~40s/8 of compute between two collectives
# aborts the whole test run.  Gate only the HEAVY mesh programs on
# this; everything light still exercises the collective paths.
CPU_STARVED = (os.cpu_count() or 1) < 4
skip_if_cpu_starved = pytest.mark.skipif(
    CPU_STARVED,
    reason="heavy 8-device shard program vs XLA CPU collectives' "
    "hardcoded 40 s rendezvous termination on a <4-core host")


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return Mesh(np.array(devs), ("x",))


@pytest.fixture(scope="session")
def mesh1():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:1]), ("x",))
