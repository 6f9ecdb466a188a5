"""Profiler tests (reference anchor: profile.hpp Tic/Toc/counters/report,
src/test.cpp:59-86 profiler demo)."""

import jax.numpy as jnp
import numpy as np

import sctl_tpu
from sctl_tpu.profile import Profile, add_flops, add_comm


def test_tic_toc_counters():
    sctl_tpu.config.profile_level = 5
    Profile.reset()
    Profile.tic("outer")
    add_flops(1e9)
    Profile.tic("inner")
    add_flops(5e8)
    add_comm(2, 1024.0)
    Profile.toc()
    Profile.toc()
    assert Profile.get_counter("FLOP") == 1.5e9
    assert Profile.get_counter("COLL_BYTES") == 1024.0
    report = Profile.print_report()
    assert "outer" in report and "inner" in report
    sctl_tpu.config.profile_level = -1


def test_profile_level_gate():
    """Blocks deeper than profile_level are skipped
    (reference: profile.txx:529-533)."""
    sctl_tpu.config.profile_level = 0
    Profile.reset()
    Profile.tic("shown", level=0)
    Profile.tic("hidden", level=3)
    Profile.toc()
    Profile.toc()
    report = Profile.print_report()
    assert "shown" in report and "hidden" not in report
    sctl_tpu.config.profile_level = -1


def test_scoped_and_custom_field():
    sctl_tpu.config.profile_level = 5
    Profile.reset()
    Profile.set_prof_field("flop_per_byte", lambda d, dt: d.get(
        "FLOP", 0.0) / max(d.get("COLL_BYTES", 0.0), 1.0))
    with Profile.scoped("blk"):
        add_flops(100.0)
        add_comm(1, 10.0)
    r = Profile.print_report(fields=("t", "flop_per_byte"))
    assert "blk" in r
    sctl_tpu.config.profile_level = -1


def test_comm_credits_counters(mesh8):
    from sctl_tpu.comm import Comm
    from jax.sharding import PartitionSpec as P
    import jax
    sctl_tpu.config.profile_level = 5
    Profile.reset()
    comm = Comm.world(mesh8)
    x = jax.device_put(jnp.arange(8.0),
                       jax.sharding.NamedSharding(mesh8, P("x")))
    out = jax.jit(comm.run(lambda v: comm.allreduce(v), in_specs=P("x"),
                           out_specs=P("x")))(x)
    out.block_until_ready()
    jax.effects_barrier()   # counters fire per execution (callback)
    assert Profile.get_counter("COLL_COUNT") >= 1
    sctl_tpu.config.profile_level = -1
