"""High-level distributed data-movement verbs.

TPU-native equivalents of the reference Comm's data-redistribution layer
(reference: comm.txx — PartitionW:540, PartitionN:625, PartitionS:696,
SortScatterIndex:730, ScatterForward:811, ScatterReverse:936,
HyperQuickSort:1159; SURVEY.md §5.8(iii)): these verbs, not raw
collectives, are what Tree / BoundaryIntegral / FMM actually call.

Design: the ragged-data discipline.  Every distributed array is a
per-shard buffer of *static capacity* C (leading axis) plus a traced
valid-count scalar ``cnt``; slots >= cnt are padding.  This is the
jit-compatible version of the reference's cnt/dsp layout (SURVEY.md §7
hard-part #3).  All verbs take and return ``(data, cnt)`` pairs where
``data`` may be a pytree of arrays sharing the leading axis.

Algorithm notes:
  - ``alltoallv`` is implemented as all_gather + gather-selection: O(p*C)
    memory per shard.  This is the robust baseline (correct for any
    send-count pattern); a ring/ppermute variant with O(C) memory is the
    planned optimization for large p.
  - ``global_sort`` is a sample sort (local sort -> regular samples ->
    global splitters -> route -> local sort), the same family as the
    reference's HyperQuickSort; per-shard local sorts are `lax.sort`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .comm import Comm, exclusive_cumsum


def ragged_route_tables(src, payload, dst, places, ndev, fill=-1):
    """Host-side builder of sparse cnt/dsp-ragged STATIC routing
    tables for `alltoallv` (reference: Ialltoallv_sparse, comm.txx:363
    — the sparse counterpart of a dense (ndev, ndev, R) slot table).

    src/payload/dst and each placement array are (M,) parallel numpy
    arrays: row m sends local payload index payload[m] from device
    src[m] to device dst[m], landing at places[k][m] on the receiver.

    Returns (send_idx, send_cnt, recv_places, Cs, Cr, recv_pos):

    - send_idx (ndev, Cs): payload rows packed and GROUPED BY
      DESTINATION rank (the alltoallv send convention), `fill` beyond
      each device's send total;
    - send_cnt (ndev, ndev): rows device d sends to rank r — row d is
      the `send_cnt` argument device d passes to `alltoallv`;
    - recv_places: for each placement array, an (ndev, Cr) table
      mapping alltoallv's packed-by-source receive positions to the
      placement values, `fill` beyond each device's receive total;
    - Cs / Cr: send / receive buffer capacities = max per-device
      TRAFFIC — not ndev^2 * max-cell-rows like a dense table;
    - recv_pos (M,): each input row's packed receive position on its
      destination device (for building receiver-side side tables).

    Rows keep their original relative order within each (src, dst)
    pair on both sides."""
    import numpy as np
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    M = len(src)
    if M == 0:
        one = np.full((ndev, 1), fill, np.int64)
        return (one, np.zeros((ndev, ndev), np.int64),
                [one.copy() for _ in places], 1, 1,
                np.zeros(0, np.int64))
    cnt = np.zeros((ndev, ndev), np.int64)
    np.add.at(cnt, (src, dst), 1)
    tot_s = cnt.sum(axis=1)
    tot_r = cnt.sum(axis=0)
    Cs = max(1, int(tot_s.max()))
    Cr = max(1, int(tot_r.max()))

    # send side: per device, rows sorted by destination (stable)
    o_s = np.argsort(src * np.int64(ndev) + dst, kind="stable")
    dsp_s = np.concatenate([[0], np.cumsum(tot_s)])
    pos_s = np.arange(M) - dsp_s[src[o_s]]     # rank within device
    send_idx = np.full((ndev, Cs), fill, np.int64)
    send_idx[src[o_s], pos_s] = np.asarray(payload)[o_s]

    # recv side: per device, rows packed by SOURCE rank (alltoallv's
    # receive order), stable within
    o_r = np.argsort(dst * np.int64(ndev) + src, kind="stable")
    dsp_r = np.concatenate([[0], np.cumsum(tot_r)])
    pos_r = np.arange(M) - dsp_r[dst[o_r]]
    recv_pos = np.empty(M, np.int64)
    recv_pos[o_r] = pos_r
    recv = []
    for p in places:
        r = np.full((ndev, Cr), fill, np.int64)
        r[dst[o_r], pos_r] = np.asarray(p)[o_r]
        recv.append(r)
    return send_idx, cnt, recv, Cs, Cr, recv_pos


def _leading_capacity(data) -> int:
    leaves = jax.tree_util.tree_leaves(data)
    return leaves[0].shape[0]


def _key_sentinel(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).max, dtype)


def _take_rows(data, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], data)


def alltoallv(comm: Comm, data, send_cnt, recv_capacity: int):
    """Ragged all-to-all (reference: Alltoallv, comm.txx:404).

    `data`: pytree with leading capacity C; rows are grouped by
    destination rank: rows [dsp[r], dsp[r]+send_cnt[r]) go to rank r,
    where dsp = exclusive_cumsum(send_cnt).  Rows beyond sum(send_cnt)
    are padding.

    Returns (recv_data, recv_cnt): received rows packed by source rank,
    in a buffer of static capacity `recv_capacity`.
    """
    p = comm.size()
    if comm.axis is None or p == 1:
        c = _leading_capacity(data)
        n = jnp.minimum(send_cnt.reshape(-1)[0], recv_capacity)
        idx = jnp.arange(recv_capacity) % max(c, 1)
        return _take_rows(data, idx), n

    r = comm.rank()
    all_cnt = lax.all_gather(send_cnt, comm.axis)     # (p, p): [src, dst]
    all_dsp = exclusive_cumsum(all_cnt, axis=1)
    cnt_to_me = all_cnt[:, r]                          # (p,)
    dsp_to_me = all_dsp[:, r]
    recv_dsp = exclusive_cumsum(cnt_to_me)
    recv_cnt = jnp.sum(cnt_to_me)

    C = _leading_capacity(data)
    j = jnp.arange(recv_capacity)
    src = jnp.clip(
        jnp.searchsorted(recv_dsp, j, side="right") - 1, 0, p - 1)
    src_pos = dsp_to_me[src] + (j - recv_dsp[src])
    src_pos = jnp.clip(src_pos, 0, C - 1)
    valid = j < recv_cnt

    def one(v):
        g = lax.all_gather(v, comm.axis)               # (p, C, ...)
        out = g[src, src_pos]
        zero = jnp.zeros((), dtype=out.dtype)
        vshape = (recv_capacity,) + (1,) * (out.ndim - 1)
        return jnp.where(valid.reshape(vshape), out, zero)

    return jax.tree_util.tree_map(one, data), recv_cnt


def alltoallv_ring(comm: Comm, data, send_cnt, recv_capacity: int):
    """Ragged all-to-all with O(C) memory: p-1 ppermute ring steps
    rotating each rank's full buffer, every rank extracting the segment
    addressed to it (the EvalDirect ring shape, fmm-wrapper.txx:537).

    Same contract as `alltoallv`; preferable at large p where the
    all_gather baseline's O(p*C) staging doesn't fit.  Only the (p,p)
    count matrix is gathered.
    """
    p = comm.size()
    if comm.axis is None or p == 1:
        return alltoallv(comm, data, send_cnt, recv_capacity)
    r = comm.rank()
    all_cnt = lax.all_gather(send_cnt, comm.axis)     # (p, p) metadata
    all_dsp = exclusive_cumsum(all_cnt, axis=1)
    cnt_to_me = all_cnt[:, r]
    dsp_to_me = all_dsp[:, r]
    recv_dsp = exclusive_cumsum(cnt_to_me)
    recv_cnt = jnp.sum(cnt_to_me)

    C = _leading_capacity(data)
    out = jax.tree_util.tree_map(
        lambda v: jnp.zeros((recv_capacity,) + v.shape[1:],
                            dtype=v.dtype), data)
    j = jnp.arange(recv_capacity)
    buf = data
    perm = [(i, (i + 1) % p) for i in range(p)]
    for s in range(p):
        src = jnp.mod(r - s, p)                       # buffer's owner
        start = dsp_to_me[src]
        n_seg = cnt_to_me[src]
        o0 = recv_dsp[src]
        take = jnp.clip(j - o0 + start, 0, C - 1)
        valid = (j >= o0) & (j < o0 + n_seg)

        def place(o, v):
            vshape = (recv_capacity,) + (1,) * (v.ndim - 1)
            return jnp.where(valid.reshape(vshape), v[take], o)

        out = jax.tree_util.tree_map(place, out, buf)
        if s < p - 1:
            buf = jax.tree_util.tree_map(
                lambda v: lax.ppermute(v, comm.axis, perm), buf)
    return out, recv_cnt


# Above this many staged rows (p * C) the O(p*C) all_gather baseline
# is replaced by the O(C) ring inside `route` — every verb (global
# sort, partitions, scatter) inherits the choice.
RING_THRESHOLD_ROWS = 1 << 21


def route(comm: Comm, data, cnt, dest, recv_capacity: int,
          impl: str = "auto"):
    """Route each valid row i to rank dest[i] (the sparse Ialltoallv
    pattern, comm.txx:363).  Stable within (source, destination).

    impl: "auto" (ring when p*C exceeds RING_THRESHOLD_ROWS, else the
    all_gather baseline), "gather", or "ring".

    Returns (recv_data, recv_cnt).
    """
    p = comm.size()
    C = _leading_capacity(data)
    i = jnp.arange(C)
    dest = jnp.where(i < cnt, dest.astype(jnp.int32), jnp.int32(p))
    order = jnp.argsort(dest, stable=True)
    data_sorted = _take_rows(data, order)
    dest_sorted = dest[order]
    bounds = jnp.searchsorted(dest_sorted, jnp.arange(p + 1), side="left")
    send_cnt = jnp.diff(bounds)
    use_ring = (impl == "ring" or
                (impl == "auto" and p * C > RING_THRESHOLD_ROWS))
    a2av = alltoallv_ring if use_ring else alltoallv
    return a2av(comm, data_sorted, send_cnt, recv_capacity)


def partition_n(comm: Comm, data, cnt, target_cnt, capacity: int):
    """Repartition so rank r holds exactly target_cnt[r] rows, keeping
    global order (reference: PartitionN, comm.txx:625).

    target_cnt: (p,) per-rank target counts (same values on all ranks).
    """
    my_dsp = comm.scan(cnt, exclusive=True)
    gid = my_dsp + jnp.arange(_leading_capacity(data))
    tgt_dsp = exclusive_cumsum(target_cnt)
    dest = jnp.clip(
        jnp.searchsorted(tgt_dsp, gid, side="right") - 1, 0,
        comm.size() - 1)
    out, out_cnt = route(comm, data, cnt, dest, capacity)
    return out, out_cnt


def partition_w(comm: Comm, data, cnt, weights, capacity: int):
    """Weight-balanced repartition (reference: PartitionW, comm.txx:540):
    split the global sequence so every rank gets ~equal total weight,
    preserving order.
    """
    p = comm.size()
    C = _leading_capacity(data)
    i = jnp.arange(C)
    w = jnp.where(i < cnt, weights.astype(jnp.float64), 0.0)
    local_pre = jnp.cumsum(w) - w                     # exclusive local
    my_off = comm.scan(jnp.sum(w), exclusive=True)
    total = comm.allreduce(jnp.sum(w))
    # element's global exclusive weight prefix -> bucket by weight quantile
    gpre = my_off + local_pre + 0.5 * w
    dest = jnp.clip((gpre * p / jnp.maximum(total, 1e-300)).astype(
        jnp.int32), 0, p - 1)
    # enforce monotonicity for zero-weight elements interleaved
    dest = lax.associative_scan(jnp.maximum, dest)
    return route(comm, data, cnt, dest, capacity)


def partition_s(comm: Comm, data, cnt, keys, splitters, capacity: int):
    """Splitter-based repartition (reference: PartitionS, comm.txx:696):
    element with key k goes to rank = #splitters < k... i.e. rank r gets
    keys in [splitters[r-1], splitters[r]).  splitters: (p-1,) sorted.
    """
    dest = jnp.searchsorted(splitters, keys, side="right").astype(
        jnp.int32)
    return route(comm, data, cnt, dest, capacity)


def _local_sort_by_key(keys, cnt, payload):
    """Stable local sort of valid rows by key; padding stays at the end."""
    C = keys.shape[0]
    i = jnp.arange(C)
    k = jnp.where(i < cnt, keys, _key_sentinel(keys.dtype))
    order = jnp.argsort(k, stable=True)
    return k[order], (None if payload is None
                      else _take_rows(payload, order))


def global_sort(comm: Comm, keys, cnt, payload=None,
                capacity: Optional[int] = None, rebalance: bool = True):
    """Distributed sort by key (reference: HyperQuickSort, comm.txx:1159;
    here a sample sort — same O((N/p) log) family, better fit for fixed
    collective schedules).

    Returns (keys_sorted, payload_sorted, out_cnt): globally sorted
    across ranks (rank r holds keys <= rank r+1's), locally sorted.
    With rebalance=True, counts are evened via partition_n afterwards.
    """
    p = comm.size()
    C = keys.shape[0]
    capacity = capacity or 2 * C
    keys_l, payload_l = _local_sort_by_key(keys, cnt, payload)

    if comm.axis is None or p == 1:
        out_cnt = cnt
        if capacity != C:
            pad_idx = jnp.arange(capacity) % C
            keys_l = keys_l[pad_idx]
            payload_l = (None if payload is None
                         else _take_rows(payload_l, pad_idx))
        return keys_l, payload_l, out_cnt

    # regular samples from the locally sorted keys; a rank with
    # cnt < ns contributes only its min(cnt, ns) distinct keys (the
    # rest are sentinel-masked so under-full ranks don't skew the
    # splitter quantiles)
    ns = min(C, 32)  # samples per rank (oversampling factor)
    m = jnp.minimum(cnt, ns)                  # valid samples this rank
    pos = ((jnp.arange(ns) + 0.5) * cnt
           / jnp.maximum(m, 1)).astype(jnp.int32)
    pos = jnp.clip(pos, 0, jnp.maximum(cnt - 1, 0))
    samples = jnp.where(jnp.arange(ns) < m, keys_l[pos],
                        _key_sentinel(keys.dtype))
    all_samples = lax.all_gather(samples, comm.axis).reshape(-1)
    all_samples = jnp.sort(all_samples)       # sentinels sort last
    n_valid = comm.allreduce(m)
    spos = ((jnp.arange(1, p) * n_valid) // p).astype(jnp.int32)
    spos = jnp.clip(spos, 0, p * ns - 1)
    splitters = all_samples[spos]

    tree = {"k": keys_l}
    if payload is not None:
        tree["v"] = payload_l
    routed, out_cnt = partition_s(comm, tree, cnt, keys_l, splitters,
                                  capacity)
    keys_r, payload_r = routed["k"], routed.get("v")
    # restore padding sentinel (alltoallv zero-fills padding)
    keys_r = jnp.where(jnp.arange(capacity) < out_cnt, keys_r,
                       _key_sentinel(keys_r.dtype))
    keys_s, payload_s = _local_sort_by_key(keys_r, out_cnt, payload_r)

    if rebalance:
        total = comm.allreduce(out_cnt)
        tgt = jnp.full((p,), total // p, dtype=total.dtype)
        tgt = tgt.at[:].add(jnp.where(jnp.arange(p) < total % p, 1, 0))
        tree2 = {"k": keys_s}
        if payload is not None:
            tree2["v"] = payload_s
        routed2, out_cnt = partition_n(comm, tree2, out_cnt, tgt, capacity)
        keys_s, payload_s = routed2["k"], routed2.get("v")
        keys_s = jnp.where(jnp.arange(capacity) < out_cnt, keys_s,
                           _key_sentinel(keys_s.dtype))
    return keys_s, payload_s, out_cnt


def sort_scatter_index(comm: Comm, keys, cnt, capacity: Optional[int] = None):
    """For each valid local element, its global position in the sorted
    order (reference: SortScatterIndex, comm.txx:730).  Feed the result
    to scatter_forward to move data into sorted order.
    """
    C = keys.shape[0]
    capacity = capacity or 2 * C
    my_dsp = comm.scan(cnt, exclusive=True)
    gid = my_dsp + jnp.arange(C)
    k_s, gid_s, out_cnt = global_sort(comm, keys, cnt, payload=gid,
                                      capacity=capacity, rebalance=False)
    # element at global sorted position s carries original id g:
    # send (g -> s) back to the owner of g (original distribution).
    sort_dsp = comm.scan(out_cnt, exclusive=True)
    s_pos = sort_dsp + jnp.arange(capacity)
    # owner of original gid g: ranks own [my_dsp_r, my_dsp_r + cnt_r)
    all_dsp = _gather_dsp(comm, cnt)                  # (p,) original dsp
    dest = jnp.clip(jnp.searchsorted(all_dsp, gid_s, side="right") - 1,
                    0, comm.size() - 1)
    pairs = {"g": gid_s, "s": s_pos}
    routed, rcnt = route(comm, pairs, out_cnt, dest, capacity)
    # place: local slot = g - my_dsp; invalid rows go out of range and
    # are dropped (they must not clobber slot 0)
    scatter_idx = jnp.zeros((C,), dtype=jnp.int64)
    valid = jnp.arange(capacity) < rcnt
    slot = jnp.where(valid, jnp.clip(routed["g"] - my_dsp, 0, C - 1), C)
    scatter_idx = scatter_idx.at[slot].set(routed["s"], mode="drop")
    return scatter_idx


def _gather_dsp(comm: Comm, cnt):
    """(p,) exclusive prefix of per-rank counts, same on all ranks."""
    if comm.axis is None:
        return jnp.zeros((1,), dtype=jnp.asarray(cnt).dtype)
    all_cnt = lax.all_gather(cnt, comm.axis)
    return exclusive_cumsum(all_cnt)


def scatter_forward(comm: Comm, data, cnt, scatter_idx,
                    out_cnt_per_rank=None, capacity: Optional[int] = None):
    """Move row i to global position scatter_idx[i] (reference:
    ScatterForward, comm.txx:811).

    out_cnt_per_rank: (p,) target layout (defaults to current layout).
    Returns (out_data, out_cnt).
    """
    p = comm.size()
    C = _leading_capacity(data)
    capacity = capacity or C
    if out_cnt_per_rank is None:
        if comm.axis is None:
            out_cnt_per_rank = jnp.asarray([cnt])
        else:
            out_cnt_per_rank = lax.all_gather(cnt, comm.axis)
    out_dsp = exclusive_cumsum(out_cnt_per_rank)
    dest = jnp.clip(
        jnp.searchsorted(out_dsp, scatter_idx, side="right") - 1, 0, p - 1)
    tree = {"i": scatter_idx}
    tree["d"] = data
    routed, rcnt = route(comm, tree, cnt, dest, capacity)
    r = comm.rank()
    my_out_dsp = out_dsp[r] if comm.axis is not None else out_dsp[0]
    valid = jnp.arange(capacity) < rcnt
    slot = jnp.where(valid,
                     jnp.clip(routed["i"] - my_out_dsp, 0, capacity - 1),
                     capacity)  # invalid -> dropped

    def place(v):
        out = jnp.zeros((capacity,) + v.shape[1:], dtype=v.dtype)
        return out.at[slot].set(v, mode="drop")

    out_data = jax.tree_util.tree_map(place, routed["d"])
    my_cnt = (out_cnt_per_rank[r] if comm.axis is not None
              else out_cnt_per_rank[0])
    return out_data, my_cnt


def scatter_reverse(comm: Comm, data, cnt, scatter_idx, orig_cnt,
                    capacity: Optional[int] = None):
    """Inverse of scatter_forward (reference: ScatterReverse,
    comm.txx:936): `data` lives in scattered order (row j at global
    scattered position sort_dsp+j); bring rows back so that the element
    whose scatter_idx (held by its original owner) is s returns to the
    original slot.

    `scatter_idx`/`orig_cnt` describe the original layout (as produced
    by sort_scatter_index); `data`/`cnt` the scattered layout.
    """
    p = comm.size()
    C = scatter_idx.shape[0]
    capacity = capacity or _leading_capacity(data)
    # step 1: original owners request position s -> route (g, s) to the
    # owner of s in the scattered layout
    my_dsp = comm.scan(orig_cnt, exclusive=True)
    gid = my_dsp + jnp.arange(C)
    scat_dsp_all = _gather_dsp(comm, cnt)
    dest = jnp.clip(
        jnp.searchsorted(scat_dsp_all, scatter_idx, side="right") - 1,
        0, p - 1)
    req, req_cnt = route(comm, {"g": gid, "s": scatter_idx}, orig_cnt,
                         dest, capacity)
    # step 2: owner of s returns (g, data[s_local])
    r = comm.rank()
    my_scat_dsp = scat_dsp_all[r] if comm.axis is not None \
        else scat_dsp_all[0]
    s_local = jnp.clip(req["s"] - my_scat_dsp, 0,
                       _leading_capacity(data) - 1)
    vals = _take_rows(data, s_local)
    orig_dsp_all = _gather_dsp(comm, orig_cnt)
    dest2 = jnp.clip(
        jnp.searchsorted(orig_dsp_all, req["g"], side="right") - 1,
        0, p - 1)
    back, back_cnt = route(comm, {"g": req["g"], "d": vals}, req_cnt,
                           dest2, capacity)
    valid = jnp.arange(capacity) < back_cnt
    slot = jnp.where(valid, jnp.clip(back["g"] - my_dsp, 0, C - 1), C)

    def place(v):
        out = jnp.zeros((C,) + v.shape[1:], dtype=v.dtype)
        return out.at[slot].set(v, mode="drop")

    return jax.tree_util.tree_map(place, back["d"]), orig_cnt
