"""Distributed BIE pipeline: sharded ComputePotential + BuildNearList.

The reference's BIE is distributed end-to-end (reference:
boundary_integral.txx:46-183 BuildNearList — Morton sort +
HyperQuickSort + PartitionS + neighbor-box join; 1016-1142
ComputePotential — far eval through the MPI FMM, near GEMMs on the
element owner, ScatterForward accumulation to target owners).  This
module is the sharded TPU counterpart; the round-2 `sharded_apply_fn`
(full-density allgather + O(Nt*Nf/p) direct far field) is replaced by
it.

Layout — element-aligned blocks: elements are split into `ndev`
contiguous groups balanced by node count; device d owns its elements'
surface nodes (a contiguous node range), far-field quadrature nodes,
near-interaction matrices, and target rows.  The density vector uses a
block-padded flat layout (ndev * Cs * k0) built by `pack`/`unpack`.

One operator application (a single shard_map program):

  1. density -> far density: per-element interpolation GEMMs, local
     (tables sharded by element block).
  2. far field:
     - FMM regime: the far density is re-distributed from element
       blocks to the AdaptiveFMMDist Morton-leaf blocks with ONE
       ragged all-to-all over static sparse cnt/dsp route tables
       (ragged_route_tables + comm.verbs.alltoallv — the
       SortScatterIndex / ScatterForward / Ialltoallv_sparse role,
       comm.txx:363,730-1006), evaluated by the memory-sharded
       adaptive FMM (adaptive_dist.py), and the leaf-sharded
       potentials are routed back to the target owners with a second
       ragged all-to-all.
     - direct regime (below the FMM cutoff): each device sums its OWN
       far nodes' contribution to all targets and the (small, by
       definition of the cutoff) target potentials are psum'd — the
       density is never replicated in either regime.
  3. near corrections: GEMMs on the ELEMENT owner (density local),
     contributions routed to target owners with an all-to-all and
     scatter-added (ScatterForward, boundary_integral.txx:1129).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..comm.comm import Comm
from ..comm.verbs import alltoallv, ragged_route_tables
from ..ops.direct import direct_eval_blocked



def _rank_within(groups):
    """(M,) group ids -> (M,) 0-based rank of each element within its
    group, in original order (vectorized cumcount)."""
    M = len(groups)
    if M == 0:
        return np.zeros(0, np.int64), 0
    order = np.argsort(groups, kind="stable")
    gs = np.asarray(groups)[order]
    new = np.concatenate([[True], gs[1:] != gs[:-1]])
    start = np.maximum.accumulate(np.where(new, np.arange(M), 0))
    rank_sorted = np.arange(M) - start
    rank = np.empty(M, np.int64)
    rank[order] = rank_sorted
    return rank, int(rank_sorted.max()) + 1


class ShardedBIEApply:
    """Sharded operator application built from a set-up
    BoundaryIntegralOp (see module docstring)."""

    def __init__(self, op, comm: Comm):
        assert op.Xt is None, \
            "sharded apply targets = surface nodes (reference layout)"
        # the distributed near search IS the setup path here (the
        # reference's BuildNearList-inside-Setup, boundary_integral.
        # txx:46-183); host search only when the mesh is 1 device
        op.setup(comm=comm)
        self.op = op
        self.comm = comm
        ndev = comm.size()
        self.ndev = ndev
        ker = op.kernel
        k0, k1 = ker.kdim0, ker.kdim1
        self.k0, self.k1 = k0, k1
        mesh = comm.mesh

        # ---- element-aligned partition (balanced node counts) ----
        E = len(op._elem_of)
        nd, fd = op.node_dsp, op.far_dsp
        total = nd[-1]
        eb = np.searchsorted(nd, np.arange(ndev) * (total / ndev))
        eb = np.maximum.accumulate(np.minimum(eb, E))
        eb = np.concatenate([eb, [E]])
        self.e_bounds = eb
        n_lo, n_hi = nd[eb[:-1]], nd[eb[1:]]
        f_lo, f_hi = fd[eb[:-1]], fd[eb[1:]]
        Cs = max(1, int((n_hi - n_lo).max()))
        Cf = max(1, int((f_hi - f_lo).max()))
        Ec = max(1, int(np.diff(eb).max()))
        self.Cs, self.Cf = Cs, Cf
        self.n_lo = n_lo
        owner_node = np.zeros(total, np.int64)
        for d in range(ndev):
            owner_node[n_lo[d]:n_hi[d]] = d

        dev = op._dev
        dt = dev["Xt"].dtype
        self.dt = dt
        interp = np.asarray(dev["interp"])
        nidx = np.asarray(dev["nidx"])
        fidx = np.asarray(dev["fidx"])
        fval = np.asarray(dev["fval"])
        max_nf, max_ne = interp.shape[1:]

        interp_l = np.zeros((ndev, Ec, max_nf, max_ne))
        nidx_l = np.zeros((ndev, Ec, max_ne), np.int64)
        fidx_l = np.zeros((ndev, Ec, max_nf), np.int64)
        fval_l = np.zeros((ndev, Ec, max_nf))
        wf_l = np.zeros((ndev, Cf))
        for d in range(ndev):
            es = slice(eb[d], eb[d + 1])
            ne_ = eb[d + 1] - eb[d]
            interp_l[d, :ne_] = interp[es]
            nidx_l[d, :ne_] = nidx[es] - n_lo[d]
            fidx_l[d, :ne_] = fidx[es] - f_lo[d]
            fval_l[d, :ne_] = fval[es]
            wf_l[d, :f_hi[d] - f_lo[d]] = op.wf[f_lo[d]:f_hi[d]]

        sh = NamedSharding(mesh, P("x"))

        def put(a, dtype=None):
            return jax.device_put(jnp.asarray(a, dtype), sh)

        self._t = {
            "interp": put(interp_l, dt),
            "nidx": put(nidx_l, jnp.int32),
            "fidx": put(np.maximum(fidx_l, 0), jnp.int32),
            "fval": put(fval_l, dt),
            "wf": put(wf_l, dt),
        }

        # ---- far-field evaluator ----
        self._fmm = None
        if op._far_fmm is not None:
            from ..fmm.adaptive_dist import AdaptiveFMMDist
            src = op._far_fmm
            self._fmm = AdaptiveFMMDist(
                op.kernel, comm, p=src.p, max_pts=src.max_pts,
                ker_l2t=src.ker_l2t).setup(op.Xf, op.Xt_eff,
                                           n_src=op.Xnf)
            self._build_fmm_routing(owner_node, f_lo, put)
        else:
            # direct regime: replicated target coords (small by the
            # FMM-cutoff definition), sharded far nodes
            Xf_l = np.zeros((ndev, Cf, 3))
            Xnf_l = np.zeros((ndev, Cf, 3))
            for d in range(ndev):
                m = f_hi[d] - f_lo[d]
                Xf_l[d, :m] = op.Xf[f_lo[d]:f_hi[d]]
                Xnf_l[d, :m] = op.Xnf[f_lo[d]:f_hi[d]]
            self._t["Xf_l"] = put(Xf_l, dt)
            self._t["Xnf_l"] = put(Xnf_l, dt)
            self._Xt_rep = jnp.asarray(op.Xt_eff, dt)

        # ---- near corrections: element-owner-side GEMMs + routed
        # scatter (ScatterForward, boundary_integral.txx:1092-1129) ----
        pairs = op.near_pairs
        near_mats = op._near_mats_list()
        R = (max(m.shape[0] for m in near_mats)
             if pairs else 1)
        owner_e = np.zeros(E, np.int64)
        for d in range(ndev):
            owner_e[eb[d]:eb[d + 1]] = d
        if pairs:
            pt = np.array([t for (t, _) in pairs], np.int64)
            pe = np.array([e for (_, e) in pairs], np.int64)
        else:
            pt = pe = np.zeros(0, np.int64)
        a_arr = owner_e[pe]                    # element-owner per pair
        piloc, Pc = _rank_within(a_arr)        # local payload index
        Pc = max(1, Pc)
        mats_l = np.zeros((ndev, Pc, R, k1))
        rows = (np.array([m.shape[0] for m in near_mats],
                         np.int64) if pairs else np.zeros(0, np.int64))
        if pairs and rows.min() == rows.max() == R:
            # uniform-row case (every ParametricPatchList): ONE
            # vectorized scatter instead of a 250k-iteration loop
            mats_l[a_arr, piloc] = np.asarray(near_mats).reshape(
                len(pairs), R, k1)
        else:
            for pi, m in enumerate(near_mats):  # ragged copies only
                mats_l[a_arr[pi], piloc[pi], :m.shape[0]] = \
                    m.reshape(-1, k1)
        s0 = op.node_dsp[pe] * k0 - n_lo[a_arr] * k0
        J = np.arange(R)[None, :]
        sidx_l = np.zeros((ndev, Pc, R), np.int64)
        if pairs:
            mask = J < rows[:, None]
            flat = (a_arr * Pc + piloc)[:, None] * R + J
            sidx_l.reshape(-1)[flat[mask]] = (s0[:, None] + J)[mask]
        d_arr = owner_node[pt]
        send, scnt, (recv_t,), Csn, Crn, _ = ragged_route_tables(
            a_arr, piloc, d_arr, [pt - n_lo[d_arr]], ndev)
        self._t.update({
            "near_mats": put(mats_l, dt),
            "near_sidx": put(sidx_l, jnp.int32),
            "near_send": put(send, jnp.int32),
            "near_scnt": put(scnt, jnp.int32),
            "near_recv_t": put(recv_t, jnp.int32),
        })
        self.Pc, self.Crn = Pc, Crn

    def _build_fmm_routing(self, owner_node, f_lo, put):
        """Static all-to-all slot tables: element-block far densities
        -> FMM leaf-block pads, and leaf-block target potentials ->
        node-block owners."""
        op, ndev = self.op, self.ndev
        fm = self._fmm
        af = fm._afmm
        Cb = fm.Cb
        nf = len(op.Xf)

        # far node i -> (leaf, slot): position in the Morton sort
        inv_perm = np.empty(nf, np.int64)
        inv_perm[af.tree.perm] = np.arange(nf)
        leaf_dsp = np.append(af.tree.leaf_dsp, nf)
        leaf_of = np.searchsorted(leaf_dsp, inv_perm, side="right") - 1
        slot_of = inv_perm - leaf_dsp[leaf_of]
        owner_leaf = np.minimum(leaf_of // Cb, ndev - 1)
        # element-block owner of each far node
        fown = np.zeros(nf, np.int64)
        fd = op.far_dsp
        eb = self.e_bounds
        for d in range(ndev):
            fown[fd[eb[d]]:fd[eb[d + 1]]] = d

        fd_lo = fd[eb[:-1]]
        send_f, scnt_f, (rleaf, rslot), Csf, Crf, _ = ragged_route_tables(
            fown, np.arange(nf) - fd_lo[fown], owner_leaf,
            [leaf_of - owner_leaf * Cb, slot_of], ndev)

        # FMM target row u[leaf_local, slot] -> node-block owner row
        nt = len(op.Xt_eff)
        inv_t = np.empty(nt, np.int64)
        inv_t[af._t_perm] = np.arange(nt)
        # per-leaf target displacements from the padded target layout
        t_cnt = af._tvalid_np.sum(axis=1)
        t_dsp = np.concatenate([[0], np.cumsum(t_cnt)])
        tleaf = np.searchsorted(t_dsp, inv_t, side="right") - 1
        tslot = inv_t - t_dsp[tleaf]
        towner = np.minimum(tleaf // Cb, ndev - 1)
        d_t = owner_node[np.arange(nt)]
        send_u, scnt_u, (rtrow,), Csu, Cru, _ = ragged_route_tables(
            towner, (tleaf - towner * Cb) * af.cap_t + tslot, d_t,
            [np.arange(nt) - self.n_lo[d_t]], ndev)

        self._t.update({
            "fm_send_f": put(send_f, jnp.int32),
            "fm_scnt_f": put(scnt_f, jnp.int32),
            "fm_rleaf": put(rleaf, jnp.int32),
            "fm_rslot": put(rslot, jnp.int32),
            "fm_send_u": put(send_u, jnp.int32),
            "fm_scnt_u": put(scnt_u, jnp.int32),
            "fm_rtrow": put(rtrow, jnp.int32),
        })
        self.Crf, self.Cru = Crf, Cru

    # ---- host-side vector layout helpers -------------------------------
    def pack(self, sigma) -> jax.Array:
        """(N*k0,) nodal density -> block-padded sharded flat vector."""
        op, ndev, Cs, k0 = self.op, self.ndev, self.Cs, self.k0
        sig = np.asarray(sigma, np.float64).reshape(-1, k0)
        out = np.zeros((ndev, Cs, k0))
        nd = op.node_dsp
        eb = self.e_bounds
        for d in range(ndev):
            lo, hi = nd[eb[d]], nd[eb[d + 1]]
            out[d, :hi - lo] = sig[lo:hi]
        return jax.device_put(
            jnp.asarray(out.reshape(ndev * Cs * k0), self.dt),
            NamedSharding(self.comm.mesh, P("x")))

    def unpack(self, U_pad) -> np.ndarray:
        """Sharded (ndev*Cs, k1) potentials -> (Nt, k1) host array."""
        op, ndev, Cs = self.op, self.ndev, self.Cs
        u = np.asarray(U_pad).reshape(ndev, Cs, self.k1)
        nd = op.node_dsp
        eb = self.e_bounds
        out = np.zeros((nd[-1], self.k1))
        for d in range(ndev):
            lo, hi = nd[eb[d]], nd[eb[d + 1]]
            out[lo:hi] = u[d, :hi - lo]
        return out

    def apply_fn(self):
        """The shard_map-able operator body fn(sigma_local
        ((Cs*k0,) block) -> U_local (Cs, k1)); wrap with
        `comm.run(fn, in_specs=P('x'), out_specs=P('x'))` (done by
        `jit_apply`)."""
        comm = self.comm
        ndev, Cs, Cf = self.ndev, self.Cs, self.Cf
        k0, k1 = self.k0, self.k1
        dt = self.dt
        op = self.op
        fm = self._fmm

        def fn(sig_loc, t, fmm_args):
            sig = sig_loc.reshape(Cs, k0)
            # 1. far density (local per-element interpolation)
            own = lambda a: a[0]
            sig_e = sig[own(t["nidx"])]            # (Ec, max_ne, k0)
            Ffar_e = jnp.einsum("efn,enk->efk", own(t["interp"]),
                                sig_e)
            Ff = jnp.zeros((Cf, k0), dt)
            Ff = Ff.at[own(t["fidx"]).reshape(-1)].add(
                (Ffar_e * own(t["fval"])[..., None]).reshape(-1, k0))
            Ff = Ff * own(t["wf"])[:, None]

            # 2. far field
            if fm is not None:
                rep, loc = fmm_args
                af = fm._afmm
                # element blocks -> leaf-block pads (one RAGGED
                # all-to-all; send rows grouped by destination,
                # receive rows packed by source — _ragged_tables)
                sidx = own(t["fm_send_f"])         # (Csf,)
                sbuf = Ff[jnp.clip(sidx, 0, Cf - 1)]
                rbuf, _ = alltoallv(
                    comm, sbuf, own(t["fm_scnt_f"]), self.Crf)
                rl = own(t["fm_rleaf"])            # (Crf,)
                rs = own(t["fm_rslot"])
                fp_loc = jnp.zeros((fm.Cb, af.cap_s, k0), dt)
                okr = rl >= 0
                fp_loc = fp_loc.at[
                    jnp.where(okr, rl, fm.Cb),
                    jnp.where(okr, rs, 0)].set(rbuf, mode="drop")
                u_leaf = fm._eval_dist(fp_loc, rep, loc)
                # leaf-block potentials -> node-block owners
                su = own(t["fm_send_u"])           # (Csu,)
                u_flat = u_leaf.reshape(-1, k1)
                sbu = u_flat[jnp.clip(su, 0, u_flat.shape[0] - 1)]
                rbu, _ = alltoallv(
                    comm, sbu, own(t["fm_scnt_u"]), self.Cru)
                rt = own(t["fm_rtrow"])            # (Cru,)
                U = jnp.zeros((Cs, k1), dt)
                okt = rt >= 0
                U = U.at[jnp.where(okt, rt, Cs)].add(
                    rbu * okt[:, None].astype(dt), mode="drop")
            else:
                # direct regime: own-source partial sums to replicated
                # (small) targets, psum'd, then slice own target rows
                U_all = direct_eval_blocked(
                    op.kernel, self._Xt_rep, own(t["Xf_l"]), Ff,
                    ns=own(t["Xnf_l"]), block_t=1024, block_s=1024)
                U_all = comm.allreduce(U_all)
                r = comm.rank()
                n_lo_t = jnp.asarray(self.n_lo, jnp.int32)
                start = n_lo_t[r]
                idx = start + jnp.arange(Cs)
                U = jnp.where(
                    (idx < U_all.shape[0])[:, None],
                    U_all[jnp.clip(idx, 0, U_all.shape[0] - 1)], 0.0)

            # 3. near corrections: own elements' GEMMs, routed to
            # target owners (ScatterForward)
            sigf = sig.reshape(-1)
            sig_p = sigf[own(t["near_sidx"])]      # (Pc, R)
            corr = jnp.einsum("pr,prk->pk", sig_p, own(t["near_mats"]))
            sn = own(t["near_send"])               # (Csn,)
            sb = corr[jnp.clip(sn, 0, corr.shape[0] - 1)]
            rb, _ = alltoallv(
                comm, sb, own(t["near_scnt"]), self.Crn)
            rt2 = own(t["near_recv_t"])            # (Crn,)
            ok2 = rt2 >= 0
            U = U.at[jnp.where(ok2, rt2, Cs)].add(
                rb * ok2[:, None].astype(dt), mode="drop")
            return U

        return fn

    def jit_apply(self):
        """jit(shard_map(...)) closure: U_pad = f(sigma_packed)."""
        comm = self.comm
        fn = self.apply_fn()
        fmm_args = ((self._fmm._rep, self._fmm._loc)
                    if self._fmm is not None else ())
        fmm_spec = ((P(), P("x")) if self._fmm is not None else ())
        wrapped = comm.run(
            fn, in_specs=(P("x"), P("x"), fmm_spec),
            out_specs=P("x"))
        jf = jax.jit(wrapped)
        return lambda sig: jf(sig, self._t, fmm_args)


def build_near_list_fn(comm: Comm, ndev: int, Ct: int, Cf: int,
                       cap_route_t: int, cap_route_f: int,
                       cap_join: int, cap_out: int):
    """Distributed near-pair search (reference: BuildNearList,
    boundary_integral.txx:46-183 — Morton sort of targets and far
    nodes + HyperQuickSort + PartitionS splitter routing + neighbor-
    box join + scatter of the pairs back to the target owners).

    Returns a traced fn for `comm.run(fn, in_specs=..., P('x')...)`:

        fn(Xt_loc (Ct,3), tcnt (), tgid_loc (Ct,),
           Xf_loc (Cf,3), df_loc (Cf,), fe_loc (Cf,), fcnt ())
          -> (pair_t (cap_out,), pair_e (cap_out,), n_pairs ())

    per-device: targets/far nodes arrive in arbitrary blocks; pairs
    (target id, element id) return grouped by the target's ORIGINAL
    block owner (tgid // Ct), deduplicated, sorted.  Pipeline: grid
    cell keys with side >= global max dist_far -> targets routed to
    cell-range owners (PartitionS with equal key-range splitters) ->
    far nodes replicated onto their 27 neighbor cells and routed once
    -> local sorted-range join + exact distance filter -> pairs routed
    to target owners -> local sort + dedupe.  Capacities follow the
    (data, cnt) ragged-buffer convention of comm.verbs.
    """
    from ..comm.verbs import route, _local_sort_by_key

    noff = 27
    offs = np.stack(np.meshgrid(*([[-1, 0, 1]] * 3),
                                indexing="ij"), -1).reshape(-1, 3)

    def fn(Xt_loc, tcnt, tgid_loc, Xf_loc, df_loc, fe_loc, fcnt):
        it = jnp.arange(Ct)
        jf = jnp.arange(Cf)
        tval = it < tcnt
        fval = jf < fcnt
        big = jnp.float64(1e300)
        lo = comm.allreduce(jnp.minimum(
            jnp.min(jnp.where(tval[:, None], Xt_loc, big), axis=0),
            jnp.min(jnp.where(fval[:, None], Xf_loc, big), axis=0)),
            "min")
        hi = comm.allreduce(jnp.maximum(
            jnp.max(jnp.where(tval[:, None], Xt_loc, -big), axis=0),
            jnp.max(jnp.where(fval[:, None], Xf_loc, -big), axis=0)),
            "max")
        maxdf = comm.allreduce(
            jnp.max(jnp.where(fval, df_loc, 0.0)), "max")
        extent = jnp.max(hi - lo) + 1e-12
        nside = jnp.clip((extent / jnp.maximum(
            maxdf, extent / 1024)).astype(jnp.int64), 1, 1024)
        side = extent / nside * (1 + 1e-12)

        def cell(X):
            return jnp.clip(((X - lo) / side).astype(jnp.int64), 0,
                            nside - 1)

        def ckey(c):
            return (c[:, 0] * nside + c[:, 1]) * nside + c[:, 2]

        ncell = nside * nside * nside

        def owner_of(k):
            return jnp.clip((k * ndev) // ncell, 0, ndev - 1).astype(
                jnp.int32)

        # 1. route targets to their cell-range owner (PartitionS role)
        kt = ckey(cell(Xt_loc))
        (kt_r, tg_r, Xt_r), tcnt_r = route(
            comm, (kt, tgid_loc, Xt_loc), tcnt, owner_of(kt),
            cap_route_t)
        kt_s, (tg_s, Xt_s) = _local_sort_by_key(kt_r, tcnt_r,
                                                (tg_r, Xt_r))

        # 2. far nodes onto their 27 neighbor cells, ONE route
        cf = cell(Xf_loc)
        nk_all, val_all = [], []
        for o in range(noff):
            nc = cf + jnp.asarray(offs[o])[None, :]
            ok = jnp.all((nc >= 0) & (nc < nside), axis=1) & fval
            nk_all.append(ckey(jnp.clip(nc, 0, nside - 1)))
            val_all.append(ok)
        nk = jnp.concatenate(nk_all)               # (27*Cf,)
        vv = jnp.concatenate(val_all)
        Xf_t = jnp.tile(Xf_loc, (noff, 1))
        df_t = jnp.tile(df_loc, noff)
        fe_t = jnp.tile(fe_loc, noff)
        order = jnp.argsort(~vv, stable=True)      # valid first
        n_ok = jnp.sum(vv.astype(jnp.int32))
        (nk_r, Xf_r, df_r, fe_r), fcnt_r = route(
            comm, (nk[order], Xf_t[order], df_t[order], fe_t[order]),
            n_ok, owner_of(nk[order]), cap_route_f)

        # 3. sorted-range join: targets in the far-copy's cell
        lo_i = jnp.searchsorted(kt_s, nk_r)
        hi_i = jnp.searchsorted(kt_s, nk_r + 1)
        okf = jnp.arange(cap_route_f) < fcnt_r
        cnt = jnp.where(okf, hi_i - lo_i, 0)
        dsp = jnp.cumsum(cnt) - cnt
        total = jnp.sum(cnt)
        j = jnp.arange(cap_join)
        fi = jnp.clip(jnp.searchsorted(dsp, j, side="right") - 1, 0,
                      cap_route_f - 1)
        pos = j - dsp[fi]
        ti = jnp.clip(lo_i[fi] + pos, 0, cap_route_t - 1)
        valid = (j < total) & (pos < cnt[fi])
        d2 = jnp.sum((Xt_s[ti] - Xf_r[fi]) ** 2, axis=1)
        keep = valid & (d2 < df_r[fi] ** 2)

        # 4. LOCAL dedupe before routing (all duplicates are local:
        # every pair for target t is produced on the owner of t's
        # cell), so the routed buffer and cap_out scale with the
        # UNIQUE pair count, not the raw join count
        E_big = jnp.int64(1) << 31
        sent = jnp.int64(jnp.iinfo(jnp.int64).max)
        pk = jnp.where(keep, tg_s[ti] * E_big + fe_r[fi], sent)
        order2 = jnp.argsort(pk)
        pk_s = pk[order2]
        keep_s = keep[order2]
        first = keep_s & jnp.concatenate(
            [jnp.ones(1, bool), pk_s[1:] != pk_s[:-1]])
        n_loc = jnp.sum(first.astype(jnp.int32))
        posc = jnp.cumsum(first.astype(jnp.int32)) - 1
        ptc = jnp.zeros((cap_out,), jnp.int64)
        pec = jnp.zeros((cap_out,), jnp.int64)
        scat = jnp.where(first, posc, cap_out)
        ptc = ptc.at[scat].set(pk_s // E_big, mode="drop")
        pec = pec.at[scat].set(pk_s % E_big, mode="drop")

        # route unique pairs to the target's original block owner
        dest = jnp.clip(ptc // Ct, 0, ndev - 1).astype(jnp.int32)
        (pt_r, pe_r), pcnt = route(comm, (ptc, pec), n_loc, dest,
                                   cap_out)

        # 5. final local sort + (cross-device safety) dedupe
        pk2 = pt_r * E_big + pe_r
        pk2_s, _ = _local_sort_by_key(pk2, pcnt, None)
        iv = jnp.arange(cap_out) < pcnt
        first2 = iv & jnp.concatenate(
            [jnp.ones(1, bool), pk2_s[1:] != pk2_s[:-1]])
        n_uniq = jnp.sum(first2.astype(jnp.int32))
        posu = jnp.cumsum(first2.astype(jnp.int32)) - 1
        outt = jnp.full((cap_out,), -1, jnp.int64)
        oute = jnp.full((cap_out,), -1, jnp.int64)
        scat2 = jnp.where(first2, posu, cap_out)
        outt = outt.at[scat2].set(pk2_s // E_big, mode="drop")
        oute = oute.at[scat2].set(pk2_s % E_big, mode="drop")
        # per-device REQUIRED capacities (true receive/join totals —
        # alltoallv returns the untruncated count even when the buffer
        # overflowed), so the caller can grow-and-retrace instead of
        # aborting on a dense geometry (VERDICT r4 #9; the reference's
        # Vector growth discipline, vector.hpp:87)
        need = jnp.stack([tcnt_r.astype(jnp.int64),
                          fcnt_r.astype(jnp.int64),
                          total.astype(jnp.int64),
                          jnp.maximum(n_loc, pcnt).astype(jnp.int64)])
        return outt, oute, n_uniq[None], need[None, :]

    return fn
