"""Comm layer tests (reference anchors: comm.txx collectives + the
data-redistribution verbs PartitionW/N/S, SortScatterIndex,
ScatterForward/Reverse, HyperQuickSort; run on the 8-device CPU mesh,
the analogue of the reference's self-communicator CI mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sctl_tpu.comm import (
    Comm, alltoallv, route, partition_n, partition_w, partition_s,
    global_sort, sort_scatter_index, scatter_forward, scatter_reverse,
)

PROC = 8
CAP = 32  # per-shard capacity


def shard(mesh, arr):
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P("x")))


def make_ragged(rng, mesh, dtype=np.float64, cnt_max=CAP):
    """Random ragged distributed array: (data (p*CAP,), cnt (p,))."""
    cnts = rng.integers(0, cnt_max + 1, size=PROC)
    data = np.zeros((PROC, CAP), dtype=dtype)
    vals = []
    for r in range(PROC):
        v = rng.normal(size=cnts[r]).astype(dtype)
        data[r, :cnts[r]] = v
        vals.append(v)
    return (shard(mesh, data.reshape(-1)),
            shard(mesh, cnts.astype(np.int32)), vals)


def test_allreduce_scan_bcast(mesh8):
    comm = Comm.world(mesh8)

    def f(x):
        s = comm.allreduce(x)
        mx = comm.allreduce(x, op="max")
        sc = comm.scan(x, exclusive=True)
        b = comm.bcast(x * 0 + comm.rank().astype(x.dtype), root=3)
        return s, mx, sc, b

    x = shard(mesh8, np.arange(PROC, dtype=np.float64))
    s, mx, sc, b = comm.run(f, in_specs=P("x"), out_specs=P("x"))(x)
    np.testing.assert_allclose(np.asarray(s), 28.0)
    np.testing.assert_allclose(np.asarray(mx), 7.0)
    np.testing.assert_allclose(np.asarray(sc),
                               np.concatenate([[0], np.cumsum(
                                   np.arange(7))]))
    np.testing.assert_allclose(np.asarray(b), 3.0)


def test_ring_shift(mesh8):
    comm = Comm.world(mesh8)
    x = shard(mesh8, np.arange(PROC, dtype=np.float64))
    y = comm.run(lambda v: comm.send_recv_shift(v, 1),
                 in_specs=P("x"), out_specs=P("x"))(x)
    np.testing.assert_allclose(np.asarray(y), np.roll(np.arange(8.0), 1))


def test_alltoallv(mesh8):
    rng = np.random.default_rng(0)
    comm = Comm.world(mesh8)
    # rank r sends cnt[r][d] rows to rank d
    send_cnt = rng.integers(0, 4, size=(PROC, PROC)).astype(np.int32)
    data = np.zeros((PROC, CAP))
    expect = [[] for _ in range(PROC)]
    for r in range(PROC):
        n = send_cnt[r].sum()
        vals = rng.normal(size=n)
        data[r, :n] = vals
        off = 0
        for d in range(PROC):
            expect[d].extend(vals[off:off + send_cnt[r][d]])
            off += send_cnt[r][d]

    def f(d, c):
        out, n = alltoallv(comm, d, c, recv_capacity=CAP * 2)
        return out, n.astype(jnp.int32)[None]

    out, n = comm.run(f, in_specs=(P("x"), P("x")),
                      out_specs=(P("x"), P("x")))(
        shard(mesh8, data.reshape(-1)),
        shard(mesh8, send_cnt.reshape(-1)))
    out = np.asarray(out).reshape(PROC, CAP * 2)
    n = np.asarray(n)
    for d in range(PROC):
        assert n[d] == len(expect[d])
        np.testing.assert_allclose(out[d, :n[d]], expect[d])


def test_route(mesh8):
    rng = np.random.default_rng(1)
    comm = Comm.world(mesh8)
    data, cnt, vals = make_ragged(rng, mesh8, cnt_max=16)
    dests = np.zeros((PROC, CAP), dtype=np.int32)
    expect = [[] for _ in range(PROC)]
    for r in range(PROC):
        d = rng.integers(0, PROC, size=len(vals[r]))
        dests[r, :len(vals[r])] = d
    for d in range(PROC):  # arrival order: by source rank, then position
        for r in range(PROC):
            for i, v in enumerate(vals[r]):
                if dests[r, i] == d:
                    expect[d].append(v)

    def f(dd, cc, de):
        out, n = route(comm, dd, cc[0], de, recv_capacity=CAP * PROC)
        return out, n.astype(jnp.int32)[None]

    out, n = comm.run(f, in_specs=(P("x"), P("x"), P("x")),
                      out_specs=(P("x"), P("x")))(
        data, cnt, shard(mesh8, dests.reshape(-1)))
    out = np.asarray(out).reshape(PROC, CAP * PROC)
    n = np.asarray(n)
    for d in range(PROC):
        assert n[d] == len(expect[d])
        np.testing.assert_allclose(out[d, :n[d]], expect[d])


def test_partition_n(mesh8):
    rng = np.random.default_rng(2)
    comm = Comm.world(mesh8)
    data, cnt, vals = make_ragged(rng, mesh8, cnt_max=16)
    total = sum(len(v) for v in vals)
    flat = np.concatenate(vals)
    tgt = np.full(PROC, total // PROC, dtype=np.int32)
    tgt[: total % PROC] += 1

    def f(dd, cc):
        out, n = partition_n(comm, dd, cc[0], jnp.asarray(tgt),
                             capacity=CAP * PROC)
        return out, n.astype(jnp.int32)[None]

    out, n = comm.run(f, in_specs=(P("x"), P("x")),
                      out_specs=(P("x"), P("x")))(data, cnt)
    out = np.asarray(out).reshape(PROC, -1)
    n = np.asarray(n)
    got = np.concatenate([out[r, :n[r]] for r in range(PROC)])
    np.testing.assert_array_equal(n, tgt)
    np.testing.assert_allclose(got, flat)  # global order preserved


def test_partition_w(mesh8):
    rng = np.random.default_rng(3)
    comm = Comm.world(mesh8)
    data, cnt, vals = make_ragged(rng, mesh8, cnt_max=16)
    weights = np.zeros((PROC, CAP))
    wlist = []
    for r in range(PROC):
        w = rng.uniform(0.5, 2.0, size=len(vals[r]))
        weights[r, :len(vals[r])] = w
        wlist.append(w)
    flat = np.concatenate(vals)
    wflat = np.concatenate(wlist)

    def f(dd, cc, ww):
        out, n = partition_w(comm, dd, cc[0], ww, capacity=CAP * PROC)
        return out, n.astype(jnp.int32)[None]

    out, n = comm.run(f, in_specs=(P("x"), P("x"), P("x")),
                      out_specs=(P("x"), P("x")))(
        data, cnt, shard(mesh8, weights.reshape(-1)))
    out = np.asarray(out).reshape(PROC, -1)
    n = np.asarray(n)
    got = np.concatenate([out[r, :n[r]] for r in range(PROC)])
    np.testing.assert_allclose(got, flat)  # order preserved, all present
    # balance: each rank's weight within 2x of average
    wsums, off = [], 0
    for r in range(PROC):
        wsums.append(wflat[off:off + n[r]].sum())
        off += n[r]
    assert max(wsums) < 2.0 * wflat.sum() / PROC + wflat.max()


def test_global_sort(mesh8):
    rng = np.random.default_rng(4)
    comm = Comm.world(mesh8)
    cnts = rng.integers(4, CAP + 1, size=PROC).astype(np.int32)
    keys = np.full((PROC, CAP), np.inf)
    payload = np.zeros((PROC, CAP))
    all_keys = []
    for r in range(PROC):
        k = rng.normal(size=cnts[r])
        keys[r, :cnts[r]] = k
        payload[r, :cnts[r]] = 10.0 * k  # payload tracks key
        all_keys.extend(k)

    def f(kk, cc, vv):
        ks, vs, n = global_sort(comm, kk, cc[0], payload=vv,
                                capacity=CAP * 4)
        return ks, vs, n.astype(jnp.int32)[None]

    ks, vs, n = comm.run(f, in_specs=(P("x"), P("x"), P("x")),
                         out_specs=(P("x"), P("x"), P("x")))(
        shard(mesh8, keys.reshape(-1)), shard(mesh8, cnts),
        shard(mesh8, payload.reshape(-1)))
    ks = np.asarray(ks).reshape(PROC, -1)
    vs = np.asarray(vs).reshape(PROC, -1)
    n = np.asarray(n)
    got_k = np.concatenate([ks[r, :n[r]] for r in range(PROC)])
    got_v = np.concatenate([vs[r, :n[r]] for r in range(PROC)])
    np.testing.assert_allclose(got_k, np.sort(all_keys))
    np.testing.assert_allclose(got_v, 10.0 * np.sort(all_keys))
    assert n.sum() == cnts.sum()
    assert n.max() - n.min() <= 1  # rebalanced


def test_scatter_forward_reverse(mesh8):
    rng = np.random.default_rng(5)
    comm = Comm.world(mesh8)
    cnts = np.full(PROC, CAP // 2, dtype=np.int32)  # uniform layout
    keys = np.zeros((PROC, CAP))
    data = np.zeros((PROC, CAP))
    all_k, all_d = [], []
    for r in range(PROC):
        k = rng.permutation(np.arange(PROC * CAP // 2))[:CAP // 2] * 1.0
        # use disjoint keys per rank for a strict total order
        k = rng.normal(size=CAP // 2)
        keys[r, :CAP // 2] = k
        data[r, :CAP // 2] = 100 + np.arange(CAP // 2) + 1000 * r
        all_k.extend(k)
        all_d.extend(data[r, :CAP // 2])
    all_k, all_d = np.asarray(all_k), np.asarray(all_d)

    def f(kk, cc, dd):
        idx = sort_scatter_index(comm, kk, cc[0], capacity=CAP * 4)
        fwd, fcnt = scatter_forward(comm, dd, cc[0], idx,
                                    capacity=CAP)
        rev, _ = scatter_reverse(comm, fwd, fcnt, idx, cc[0],
                                 capacity=CAP * 4)
        return idx, fwd, fcnt.astype(jnp.int32)[None], rev

    idx, fwd, fcnt, rev = comm.run(
        f, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x"), P("x")))(
        shard(mesh8, keys.reshape(-1)), shard(mesh8, cnts),
        shard(mesh8, data.reshape(-1)))
    idx = np.asarray(idx).reshape(PROC, CAP)
    fwd = np.asarray(fwd).reshape(PROC, CAP)
    fcnt = np.asarray(fcnt)
    rev = np.asarray(rev).reshape(PROC, CAP)

    # scatter index must be the rank of each key in the global sort
    valid_idx = np.concatenate([idx[r, :CAP // 2] for r in range(PROC)])
    np.testing.assert_array_equal(np.sort(valid_idx),
                                  np.arange(PROC * CAP // 2))
    expect_order = np.argsort(np.argsort(all_k))
    np.testing.assert_array_equal(valid_idx, expect_order)

    # forward: data in key-sorted order
    got = np.concatenate([fwd[r, :fcnt[r]] for r in range(PROC)])
    np.testing.assert_allclose(got, all_d[np.argsort(all_k)])

    # reverse: roundtrip restores original
    got_rev = np.concatenate([rev[r, :CAP // 2] for r in range(PROC)])
    np.testing.assert_allclose(got_rev, all_d)


def test_self_comm_dual_mode():
    """p=1 dual mode (reference: serial Comm build, comm.hpp:32-33)."""
    comm = Comm.self_()
    x = jnp.arange(8.0)
    np.testing.assert_allclose(np.asarray(comm.allreduce(x)),
                               np.asarray(x))
    k = jnp.asarray(np.random.default_rng(6).normal(size=16))
    ks, _, n = global_sort(comm, k, jnp.int32(16), capacity=16)
    np.testing.assert_allclose(np.asarray(ks), np.sort(np.asarray(k)))
    assert int(n) == 16


def test_alltoallv_ring_matches_allgather(mesh8):
    """The O(C)-memory ring alltoallv == the allgather-staged baseline."""
    from sctl_tpu.comm import alltoallv_ring
    rng = np.random.default_rng(9)
    comm = Comm.world(mesh8)
    send_cnt = rng.integers(0, 4, size=(PROC, PROC)).astype(np.int32)
    data = np.zeros((PROC, CAP))
    for r in range(PROC):
        data[r, :send_cnt[r].sum()] = rng.normal(size=send_cnt[r].sum())

    def f(d, c):
        o1, n1 = alltoallv(comm, d, c, recv_capacity=CAP * 2)
        o2, n2 = alltoallv_ring(comm, d, c, recv_capacity=CAP * 2)
        return o1, o2, (n1 - n2).astype(jnp.int32)[None]

    o1, o2, dn = comm.run(f, in_specs=(P("x"), P("x")),
                          out_specs=(P("x"), P("x"), P("x")))(
        shard(mesh8, data.reshape(-1)),
        shard(mesh8, send_cnt.reshape(-1)))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    assert (np.asarray(dn) == 0).all()


def test_comm_split(mesh8):
    """Split into equal-color groups (reference: Comm::Split,
    comm.hpp:98): each group's allreduce stays within the group and
    rank() is group-local."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    comm = Comm.world(mesh8)
    sub = comm.split([0, 0, 0, 0, 1, 1, 1, 1])
    assert sub.size() == 4

    def fn(x):
        s = sub.allreduce(x)
        return s, sub.rank()[None].astype(jnp.float64)

    x = jax.device_put(jnp.arange(8.0),
                       NamedSharding(mesh8, P("x")))
    s, r = jax.jit(comm.run(fn, in_specs=P("x"),
                            out_specs=(P("x"), P("x"))))(x)
    # group 0 holds 0+1+2+3=6, group 1 holds 4+5+6+7=22
    np.testing.assert_allclose(np.asarray(s),
                               [6, 6, 6, 6, 22, 22, 22, 22])
    np.testing.assert_allclose(np.asarray(r), [0, 1, 2, 3, 0, 1, 2, 3])


def test_comm_split_strided(mesh8):
    comm = Comm.world(mesh8)
    sub = comm.split([0, 1, 0, 1, 0, 1, 0, 1])
    x = jnp.ones(8)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    xd = jax.device_put(x, NamedSharding(mesh8, P("x")))
    s = jax.jit(comm.run(lambda v: sub.allreduce(v), in_specs=P("x"),
                         out_specs=P("x")))(xd)
    np.testing.assert_allclose(np.asarray(s), 4.0)


def test_comm_send_recv_pairs(mesh8):
    """Tag-free point-to-point (reference: Isend/Irecv comm.hpp:130):
    rank 0 -> rank 5, rank 3 -> rank 1; everyone else gets fill."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    comm = Comm.world(mesh8)
    x = jax.device_put(jnp.arange(8.0) + 1,
                       NamedSharding(mesh8, P("x")))
    y = jax.jit(comm.run(
        lambda v: comm.send_recv(v, [(0, 5), (3, 1)], fill=-1.0),
        in_specs=P("x"), out_specs=P("x")))(x)
    got = np.asarray(y)
    assert got[5] == 1.0 and got[1] == 4.0
    others = [got[i] for i in (0, 2, 3, 4, 6, 7)]
    np.testing.assert_allclose(others, -1.0)


def test_route_ring_impl_matches_gather(mesh8):
    """route(impl='ring') == route(impl='gather')."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sctl_tpu.comm.verbs import route
    comm = Comm.world(mesh8)
    rng = np.random.default_rng(5)
    C = 16
    data = rng.normal(size=(8 * C,))
    dest = rng.integers(0, 8, size=(8 * C,))
    cnt = np.full(8, C - 3, np.int32)

    def fn(impl):
        def f(d, ds, c):
            out, n = route(comm, d, c[0], ds, 4 * C, impl=impl)
            return out, n[None]
        return jax.jit(comm.run(f, in_specs=(P("x"), P("x"), P("x")),
                                out_specs=(P("x"), P("x"))))

    a, na = fn("gather")(jnp.asarray(data), jnp.asarray(dest),
                         jnp.asarray(cnt))
    b, nb = fn("ring")(jnp.asarray(data), jnp.asarray(dest),
                       jnp.asarray(cnt))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))


def test_comm_counters_per_execution(mesh8):
    """Counters fire once per EXECUTION under jit, not once per trace
    (reference counts at runtime, comm.txx:229-230)."""
    import jax
    import sctl_tpu
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sctl_tpu.profile import Profile
    sctl_tpu.config.profile_level = 5
    Profile.reset()
    comm = Comm.world(mesh8)
    fn = jax.jit(comm.run(lambda v: comm.allreduce(v),
                          in_specs=P("x"), out_specs=P("x")))
    x = jax.device_put(jnp.arange(8.0), NamedSharding(mesh8, P("x")))
    for i in range(3):
        fn(x + i).block_until_ready()
    jax.effects_barrier()
    # 3 executions; the callback runs per shard (8 devices), so the
    # aggregated count is a multiple of the execution count
    n = Profile.get_counter("COLL_COUNT")
    assert n >= 3, n
    sctl_tpu.config.profile_level = -1


def test_report_distributed_fields():
    import sctl_tpu
    from sctl_tpu.profile import Profile, add_flops
    sctl_tpu.config.profile_level = 5
    Profile.reset()
    Profile.tic("blk")
    add_flops(2e9)
    Profile.toc()
    rep = Profile.print_report(fields=("t", "t_min", "t_max", "t_avg",
                                       "f_total", "f/s_total"))
    assert "blk" in rep
    sctl_tpu.config.profile_level = -1
