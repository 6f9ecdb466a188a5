"""Morton + tree tests (reference anchors: Morton<DIM> coords/ancestor/
children/NbrList morton.txx; PtTree::test tree.txx:30-81 — build from
points, max M per box, data scatter roundtrip; test-pt-tree.cpp 2-D)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sctl_tpu.tree import (
    morton_encode, morton_decode, morton_ancestor, morton_children,
    morton_neighbors, PtTree, UniformTree,
)
from sctl_tpu.tree import morton as mt

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("dim", [2, 3])
def test_morton_roundtrip(dim):
    X = RNG.random((1000, dim))
    keys = morton_encode(X, dim=dim)
    lat = morton_decode(keys, dim=dim)
    D = mt.max_depth(dim)
    expect = np.floor(X * (1 << D)).astype(np.uint64)
    np.testing.assert_array_equal(lat, expect)


def test_morton_ordering_locality():
    """Morton order sorts boxes in Z-order: points in the same box at
    level L are contiguous after sorting."""
    X = RNG.random((500, 3))
    keys = np.sort(morton_encode(X, dim=3))
    boxes = keys >> np.uint64(3 * (mt.max_depth(3) - 2))
    assert (np.diff(boxes.astype(np.int64)) >= 0).all()


def test_morton_ancestor_children():
    X = RNG.random((10, 3))
    keys = morton_encode(X, dim=3)
    anc = morton_ancestor(keys, 3, dim=3)
    ch = morton_children(anc, 3, dim=3)          # level-3 boxes' children
    assert ch.shape == (10, 8)
    # original key's level-4 ancestor must be among the children
    anc4 = morton_ancestor(keys, 4, dim=3)
    assert all(anc4[i] in ch[i] for i in range(10))


@pytest.mark.parametrize("dim", [2, 3])
def test_morton_neighbors(dim):
    X = RNG.random((50, dim))
    keys = morton_encode(X, dim=dim)
    lvl = 3
    nbk, valid = morton_neighbors(keys, lvl, dim=dim)
    b0 = mt.box_coords(keys, lvl, dim)
    bn = mt.box_coords(nbk, lvl, dim)
    # all valid neighbors are at Chebyshev distance exactly 1
    d = np.abs(bn - b0[:, None, :]).max(axis=-1)
    assert (d[valid] == 1).all()
    assert nbk.shape[1] == 3 ** dim - 1


@pytest.mark.parametrize("dim", [2, 3])
def test_pttree_refinement(dim):
    """Mirror of PtTree::test (tree.txx:30-81): every leaf has <= M
    points; leaves tile the domain (counts sum to N)."""
    N, M = 4000, 50
    X = RNG.random((N, dim)) ** 2       # non-uniform
    tree = PtTree(dim=dim).update_refinement(X, max_pts=M)
    assert tree.leaf_cnt.sum() == N
    assert tree.leaf_cnt.max() <= M
    # leaves are disjoint and sorted
    assert (np.diff(tree.leaf_keys.astype(np.int64)) > 0).all()


def test_pttree_balance21():
    N = 3000
    # strongly graded distribution forces level jumps
    X = RNG.random((N, 3)) ** 8
    tree = PtTree(dim=3).update_refinement(X, max_pts=20,
                                           balance21=False)
    tree21 = PtTree(dim=3).update_refinement(X, max_pts=20,
                                             balance21=True)
    assert tree21.check_2to1()
    assert tree21.n_leaves() >= tree.n_leaves()
    assert tree21.leaf_cnt.sum() == N


def test_pttree_particle_data_roundtrip():
    N = 1000
    X = RNG.random((N, 3))
    v = RNG.normal(size=(N, 2))
    tree = PtTree(dim=3).update_refinement(X, max_pts=64)
    tree.add_particle_data("v", v)
    got = tree.get_particle_data("v")
    np.testing.assert_array_equal(got, v)
    # tree order is the Morton sort of the inputs
    sorted_v = tree.get_tree_order_data("v")
    np.testing.assert_array_equal(sorted_v, v[tree.perm])
    tree.delete_particle_data("v")
    assert "v" not in tree._data


def test_uniform_tree():
    N, depth = 5000, 3
    X = RNG.random((N, 3)) * 4 - 1     # arbitrary bbox
    t = UniformTree(X, depth)
    assert t.box_cnt.sum() == N
    # box_of_point consistent with centers
    ctr = t.box_centers()
    side = t.box_size()
    pts = t.X_sorted
    b = np.repeat(np.arange(t.n_boxes), t.box_cnt)
    assert (np.abs(pts - ctr[b]).max(axis=1) <= side / 2 * 1.0001).all()
    nb = t.neighbor_boxes()
    assert nb.shape == (t.n_boxes, 27)
    # center box of the grid has all 27 neighbors valid
    interior = np.where((nb >= 0).all(axis=1))[0]
    assert len(interior) == (2 ** depth - 2) ** 3


# -- distributed tree (reference: tree.txx:134-333) ----------------------

def test_dist_tree_matches_host(mesh8):
    """DistPtTree on the 8-device mesh produces EXACTLY the host
    PtTree's leaf set (keys and levels), with and without 2:1 balance
    (VERDICT round-2 item 5 acceptance)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sctl_tpu.comm import Comm
    from sctl_tpu.tree.dist_tree import DistPtTree, NOKEY
    from sctl_tpu.tree.tree import PtTree

    rng = np.random.default_rng(11)
    n = 2048
    X = rng.random((n, 3)) ** 2          # nonuniform
    for balance in (False, True):
        host = PtTree(dim=3).update_refinement(
            X, max_pts=64, balance21=balance, max_level=6)

        comm = Comm.world(mesh8)
        C = n // 8
        tree = DistPtTree(comm, leaf_cap=4096, pt_cap=2 * C,
                          max_level=6)
        fn = tree.build_fn(max_pts=64, balance21=balance)
        Xd = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh8, P("x", None)))
        cnt = jax.device_put(jnp.full((8,), C, jnp.int32),
                             NamedSharding(mesh8, P("x")))
        out = jax.jit(comm.run(
            lambda Xl, c: fn(Xl, c[0]),
            in_specs=(P("x", None), P("x")),
            out_specs=(P(), P(), P("x"), P("x", None), P("x"))))(
            Xd, cnt)
        lk, ll, nl, Xs, out_cnt = out
        nl0 = int(np.asarray(nl)[0])
        lk = np.asarray(lk)[:nl0]
        ll = np.asarray(ll)[:nl0]
        assert int(np.asarray(out_cnt).sum()) == n
        np.testing.assert_array_equal(lk, host.leaf_keys, err_msg=f"balance={balance}")
        np.testing.assert_array_equal(ll, host.leaf_levels)


def test_dist_tree_reduce_broadcast(mesh8):
    """Named node-data exchange: per-leaf point counts from sharded
    points reduce to the global per-leaf counts on every rank
    (reference: ReduceBroadcast, tree.txx:547)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sctl_tpu.comm import Comm
    from sctl_tpu.tree.dist_tree import DistPtTree
    from sctl_tpu.tree import morton as mt
    from sctl_tpu.tree.tree import PtTree

    rng = np.random.default_rng(7)
    n = 1024
    X = rng.random((n, 3))
    host = PtTree(dim=3).update_refinement(X, max_pts=32, max_level=5)

    comm = Comm.world(mesh8)
    C = n // 8
    tree = DistPtTree(comm, leaf_cap=4096, pt_cap=2 * C, max_level=5)
    fn = tree.build_fn(max_pts=32)
    Xd = jax.device_put(jnp.asarray(X),
                        NamedSharding(mesh8, P("x", None)))
    cnt = jax.device_put(jnp.full((8,), C, jnp.int32),
                         NamedSharding(mesh8, P("x")))
    lk, ll, nl, Xs, oc = jax.jit(comm.run(
        lambda Xl, c: fn(Xl, c[0]),
        in_specs=(P("x", None), P("x")),
        out_specs=(P(), P(), P("x"), P("x", None), P("x"))))(Xd, cnt)
    nl0 = int(np.asarray(nl)[0])
    lkn = np.asarray(lk)[:nl0]

    # per-rank partial counts via leaf_of_points on each shard, then
    # reduce_broadcast
    def count_prog(Xl, c):
        lo = comm.allreduce(jnp.min(jnp.where(
            (jnp.arange(Xl.shape[0]) < c[0])[:, None], Xl, 1e300),
            axis=0), "min")
        hi = comm.allreduce(jnp.max(jnp.where(
            (jnp.arange(Xl.shape[0]) < c[0])[:, None], Xl, -1e300),
            axis=0), "max")
        scale = jnp.max(hi - lo) * (1 + 1e-10)
        keys = mt.morton_encode((Xl - lo) / scale, dim=3)
        leaf = DistPtTree.leaf_of_points(jnp.asarray(lk), keys)
        valid = jnp.arange(Xl.shape[0]) < c[0]
        partial = jnp.zeros((lk.shape[0],)).at[
            jnp.where(valid, leaf, lk.shape[0])].add(1.0, mode="drop")
        return tree.reduce_broadcast(partial)[None]

    counts = jax.jit(comm.run(count_prog,
                              in_specs=(P("x", None), P("x")),
                              out_specs=P("x")))(Xd, cnt)
    counts = np.asarray(counts)
    # every rank agrees and totals match the host tree's leaf counts
    for r in range(1, 8):
        np.testing.assert_array_equal(counts[r], counts[0])
    np.testing.assert_array_equal(counts[0][:nl0], host.leaf_cnt)
    assert counts[0].sum() == n
