"""Multi-chip KIFMM: slab-sharded uniform-tree FMM over a device mesh.

The distributed-memory FMM story (SURVEY.md §3.4: the reference
delegates to PVFMM's MPI tree; SURVEY.md §5.7: halo exchange + ring
pipelines are the scaling primitives).  TPU-native design:

  sharding   The level-L box grid's leading (x) axis is sharded over
             the mesh axis: each device owns a contiguous SLAB of
             grid planes, so every per-box stage (S2M, P2P pairwise,
             L2T) is local.
  halo       P2P needs one neighbor plane, M2L needs two block-planes:
             exchanged with lax.ppermute (ICI neighbor transfers, the
             tree.txx:295+ ghost pattern), zero-masked at the domain
             boundary.
  hierarchy  Slab sharding is PARENT-ALIGNED: the parents of a shard's
             boxes live in the same shard (x/2 stays in [s*P/2,
             (s+1)*P/2)), so M2M/L2L never communicate while the shard
             still holds >= 2 planes.  Coarser levels are tiny
             (<= (2*n_dev)^3 boxes): they are all-gathered, processed
             replicated, and re-sliced on the way down.

Box data is laid out X-MAJOR (not Morton) so slabs are contiguous;
the Morton<->x-major permutations are applied at setup.  Differences
from the single-chip engine: no overflow sideband (capacity = max box
count) and the M2L sweep uses the plain 316-offset masked form on the
padded slab (the per-parity factorization interacts with odd slab
widths; revisit when optimizing).

Capacity note: correctness-targeted for round 1 — validated against
the single-chip engine on the virtual CPU mesh; ICI performance work
is ROADMAP.md #5.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kernels import KernelSpec, Laplace3D_FxU
from ..tree.tree import UniformTree
from .kifmm import KIFMMOperators, _pad_boxes


class KIFMMDist:
    """Slab-sharded KIFMM (Laplace family) over a 1-D mesh axis."""

    def __init__(self, ker_s2t: KernelSpec, mesh: Mesh, p: int = 6,
                 depth: int = 3, axis: Optional[str] = None,
                 ker_l2t: Optional[KernelSpec] = None, dtype=None):
        self.ker_s2t = ker_s2t
        self.ker_trans = Laplace3D_FxU
        self.ker_l2t = ker_l2t or Laplace3D_FxU
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]
        self.n_dev = mesh.shape[self.axis]
        self.p = p
        self.depth = depth
        x64 = jax.config.jax_enable_x64
        self.dtype = dtype or (
            jnp.float64 if (x64 and jax.default_backend()
                            not in ("tpu", "axon"))
            else jnp.float32)
        nside = 1 << depth
        assert nside % self.n_dev == 0 and nside // self.n_dev >= 1, \
            f"2^{depth} planes must tile over {self.n_dev} devices"
        # coarsest SHARDED level: needs >= 2 planes per shard (parent
        # alignment) and full halo width within one neighbor shard
        self.l_shard_min = depth
        for l in range(depth, 1, -1):
            planes = (1 << l) // self.n_dev
            if planes >= 4:
                self.l_shard_min = l
            else:
                break
        if (1 << self.l_shard_min) // self.n_dev < 4:
            self.l_shard_min = depth + 1          # nothing sharded

    # -- setup -------------------------------------------------------------
    def setup(self, x_src, x_trg, n_src=None):
        L = self.depth
        nside = 1 << L
        x_src = np.asarray(x_src, np.float64)
        x_trg = np.asarray(x_trg, np.float64)
        lo = np.minimum(x_src.min(0), x_trg.min(0))
        hi = np.maximum(x_src.max(0), x_trg.max(0))
        self.src_tree = UniformTree(x_src, L, bbox=(lo, hi))
        self.trg_tree = UniformTree(x_trg, L, bbox=(lo, hi))
        ops = KIFMMOperators(self.ker_s2t, self.ker_trans, self.ker_l2t,
                             self.p, L, self.src_tree.scale, self.dtype)
        self._ops = ops
        # single-chip data layout (VERDICT r2 #7): quantile capacity
        # with a compact replicated overflow sideband instead of
        # padding every box to the max count ((max/mean)^2 waste)
        from .kifmm import _quantile_cap, _overflow_slots
        self.cap_s = _quantile_cap(self.src_tree.box_cnt,
                                   lane_dim=True)
        self.cap_t = _quantile_cap(self.trg_tree.box_cnt)
        xs_p, ns_p, _ = _pad_boxes(self.src_tree, n_src, self.cap_s)
        xt_p, _, t_mask = _pad_boxes(self.trg_tree, None, self.cap_t)
        self._ovf_s = _overflow_slots(self.src_tree, self.cap_s)
        self._ovf_t = _overflow_slots(self.trg_tree, self.cap_t)

        # Morton -> x-major permutation of boxes (per level)
        self._xmajor = {l: self._xmajor_perm(l) for l in range(L + 1)}
        xm = self._xmajor[L]
        dt = self.dtype
        sh = NamedSharding(self.mesh, P(self.axis))
        B = nside ** 3

        def grid(a):
            """(B, ...) Morton-ordered -> x-sharded x-major array."""
            return jax.device_put(
                jnp.asarray(a[xm], dt).reshape(
                    (nside, nside * nside) + a.shape[1:]), sh)

        self.xs_g = grid(xs_p)                     # (n, n^2, cap, 3)
        self.ns_g = grid(ns_p if ns_p is not None
                         else np.zeros_like(xs_p))
        self.xt_g = grid(xt_p)
        self.t_mask = t_mask                       # host, Morton order
        ctr = self.src_tree.box_centers()
        self.ctr_g = grid(ctr)
        self._setup_overflow(n_src, ctr)
        # operators (replicated); M2L travels in the two-sided
        # compressed (U, A_d, V) + per-parity factored form the
        # single-chip engine uses (kifmm.py:_m2l_sweep)
        from .kifmm import KIFMM
        rep = NamedSharding(self.mesh, P())
        cast = lambda a: jax.device_put(jnp.asarray(a, dt), rep)
        casti = lambda a: jax.device_put(jnp.asarray(a), rep)
        self.data_rep = {
            "uc2e_L": cast(ops.uc2e[L]),
            "m2m": tuple(cast(a) for a in ops.m2m),
            "l2l": tuple(cast(a) for a in ops.l2l),
            "m2l_u": tuple(cast(a) for a in ops.m2l_u),
            "m2l_v": tuple(cast(a) for a in ops.m2l_v),
            "m2l_a": tuple(cast(a) for a in ops.m2l_a),
            "surf_out_L": cast(ops.surf_out[L]),
        }
        self.data_rep.update({k: casti(v) for k, v in
                              KIFMM._parity_tables(ops).items()})
        self._eval_jit = None
        return self

    def _setup_overflow(self, n_src, ctr):
        """Replicated overflow-sideband tables (the single-chip slot-2
        layout, kifmm.py:_overflow_slots): boxes beyond the quantile
        capacity keep their excess points in compact replicated arrays
        — small by construction (~3% of boxes), so replication costs
        O(Bo * cap2) while the padded grids stay at the quantile
        capacity."""
        nside = 1 << self.depth
        dt = self.dtype
        rep = NamedSharding(self.mesh, P())
        cast = lambda a, dty=dt: jax.device_put(jnp.asarray(a, dty),
                                                rep)
        xinv = self._xmajor_inv()

        def xyz(boxes):
            lin = xinv[boxes]
            return np.stack([lin // nside ** 2,
                             (lin // nside) % nside,
                             lin % nside], 1).astype(np.int32)

        bo_s, cap2s, idx_s, val_s = self._ovf_s
        bo_t, cap2t, idx_t, val_t = self._ovf_t
        self.Bo_s, self.cap2_s = len(bo_s), cap2s
        self.Bo_t, self.cap2_t = len(bo_t), cap2t
        st, tt = self.src_tree, self.trg_tree
        d = {}
        if len(bo_s):
            ns_sorted = (np.asarray(n_src, np.float64)[st.perm]
                         if n_src is not None
                         else np.zeros_like(st.X_sorted))
            d["xs_o"] = cast(st.X_sorted[idx_s])
            d["ns_o"] = cast(ns_sorted[idx_s])
            d["val_s"] = cast(val_s.astype(np.float64))
            d["ctr_s"] = cast(ctr[bo_s])
            d["xyz_s"] = cast(xyz(bo_s), jnp.int32)
        if len(bo_t):
            d["xt_o"] = cast(tt.X_sorted[idx_t])
            d["val_t"] = cast(val_t.astype(np.float64))
            d["ctr_t"] = cast(ctr[bo_t])
            d["xyz_t"] = cast(xyz(bo_t), jnp.int32)
        if len(bo_s) and len(bo_t):
            cs, ct2 = xyz(bo_s), xyz(bo_t)
            adj = (np.abs(cs[:, None, :] - ct2[None, :, :]).max(2)
                   <= 1)
            oi, ti = np.nonzero(adj)
            d["oo_pairs"] = cast(
                np.stack([oi, ti], 1).astype(np.int32)
                if len(oi) else np.zeros((0, 2), np.int32), jnp.int32)
        self._ovf_idx = (idx_s, val_s, idx_t, val_t)
        self.data_ovf = d

    def _xmajor_perm(self, l):
        """perm such that morton_array[perm] is x-major at level l."""
        from ..tree import morton as mt
        nside = 1 << l
        keys = (np.arange(nside ** 3, dtype=np.uint64)
                << np.uint64(3 * (mt.max_depth(3) - l)))
        b = mt.box_coords(keys, l, 3)
        lin = (b[:, 0] * nside + b[:, 1]) * nside + b[:, 2]
        perm = np.empty(nside ** 3, dtype=np.int64)
        perm[lin] = np.arange(nside ** 3)          # x-major pos -> morton
        return perm

    def _pad_density(self, f):
        f = np.asarray(f, np.float64).reshape(-1, self.ker_s2t.kdim0)
        tree = self.src_tree
        idx = tree.box_dsp[:-1, None] + np.arange(self.cap_s)[None, :]
        valid = idx < tree.box_dsp[1:, None]
        idx = np.clip(idx, 0, len(f) - 1)
        fs = f[tree.perm]
        fp = fs[idx] * valid[..., None]
        nside = 1 << self.depth
        fp = fp[self._xmajor[self.depth]].reshape(
            nside, nside * nside, self.cap_s, -1)
        fp_d = jax.device_put(jnp.asarray(fp, self.dtype),
                              NamedSharding(self.mesh, P(self.axis)))
        idx_s, val_s, _, _ = self._ovf_idx
        fo = (fs[idx_s] * val_s[..., None] if self.Bo_s
              else np.zeros((1, self.cap2_s, f.shape[1])))
        fo_d = jax.device_put(jnp.asarray(fo, self.dtype),
                              NamedSharding(self.mesh, P()))
        return fp_d, fo_d

    # -- halo helpers (inside shard_map) ------------------------------------
    def _halo_x(self, a, width: int):
        """Pad the local slab's leading axis with `width` planes from
        the neighbor shards (zeros at the domain boundary).

        `a` may be a pytree: all leaves travel in ONE batched
        ppermute pair (the reference batches its ghost payloads into
        one Alltoallv per level, tree.txx:295+)."""
        ax = self.axis
        nd = self.n_dev
        idx = lax.axis_index(ax)
        tm = jax.tree_util.tree_map
        lo = tm(lambda v: lax.ppermute(
            v[-width:], ax, [(i, (i + 1) % nd) for i in range(nd)]), a)
        hi = tm(lambda v: lax.ppermute(
            v[:width], ax, [(i, (i - 1) % nd) for i in range(nd)]), a)
        lo = tm(lambda v: jnp.where(idx == 0, jnp.zeros_like(v), v),
                lo)                                # wrap -> zero
        hi = tm(lambda v: jnp.where(idx == nd - 1, jnp.zeros_like(v),
                                    v), hi)
        return tm(lambda l, m, h: jnp.concatenate([l, m, h], axis=0),
                  lo, a, hi)

    # -- evaluation ----------------------------------------------------------
    def eval(self, f) -> np.ndarray:
        fp, fo = self._pad_density(f)
        if self._eval_jit is None:
            spec = P(self.axis)
            rspec = lambda t: jax.tree_util.tree_map(lambda _: P(), t)
            self._eval_jit = jax.jit(jax.shard_map(
                self._eval_impl, mesh=self.mesh,
                in_specs=(spec, P(), spec, spec, spec, spec,
                          rspec(self.data_rep), rspec(self.data_ovf)),
                out_specs=(spec, P()), check_vma=False))
        u_g, u_ovf = self._eval_jit(fp, fo, self.xs_g, self.ns_g,
                                    self.xt_g, self.ctr_g,
                                    self.data_rep, self.data_ovf)
        # x-major grid -> Morton box order -> original target order
        nside = 1 << self.depth
        k1 = self.ker_l2t.kdim1
        u = np.asarray(u_g).reshape(nside ** 3, self.cap_t, -1)
        u_m = u[self._xmajor_inv()]
        tt = self.trg_tree
        res_sorted = np.zeros((len(tt.perm), k1))
        # padded slots: sorted position = box_dsp[b] + slot
        pos_pad = (tt.box_dsp[:-1, None]
                   + np.arange(self.cap_t)[None, :])[self.t_mask]
        res_sorted[pos_pad] = u_m.reshape(-1, k1)[
            self.t_mask.reshape(-1)]
        # overflow sideband slots
        _, _, idx_t, val_t = self._ovf_idx
        if self.Bo_t:
            res_sorted[idx_t[val_t]] = np.asarray(u_ovf).reshape(
                -1, k1)[val_t.reshape(-1)]
        res = np.empty_like(res_sorted)
        res[tt.perm] = res_sorted
        return res

    def _xmajor_inv(self):
        """Morton box index -> x-major linear position."""
        if getattr(self, "_xmajor_inv_cache", None) is None:
            self._xmajor_inv_cache = np.argsort(self._xmajor[self.depth])
        return self._xmajor_inv_cache

    def _eval_impl(self, fp, fo, xs_l, ns_l, xt_l, ctr_l, data, dovf):
        """Per-shard slab computation (traced inside shard_map)."""
        ops = self._ops
        L = self.depth
        nside = 1 << L
        ns = ops.n_surf * ops.k0t
        dt = self.dtype
        hi = lax.Precision.HIGHEST
        planes = nside // self.n_dev
        n2 = nside * nside
        idx = lax.axis_index(self.axis)

        # ---- S2M (local) ----
        xck = (jnp.asarray(data["surf_out_L"], dt)[None, None]
               + ctr_l[..., None, :])          # (pl, n2, n_surf, 3)

        def s2m_box(args):
            xc, xs_, nr_, fb = args
            return self.ker_s2t.apply_pairwise(xc, xs_, nr_, fb)

        flat = lambda a: a.reshape((planes * n2,) + a.shape[2:])
        u_check = lax.map(
            s2m_box, (flat(xck), flat(xs_l), flat(ns_l), flat(fp)),
            batch_size=max(1, min(planes * n2, 4096)))
        u_check = u_check.reshape(planes * n2, -1) \
            * self.ker_s2t.scale_factor
        q_up = jnp.einsum("mn,bn->bm", jnp.asarray(data["uc2e_L"], dt),
                          u_check, precision=hi)
        q_up = q_up.reshape(planes, n2, ns)

        # ---- S2M of overflow sources: replicated compute, scattered
        # into the owner's slab (slot-2 sideband, kifmm.py layout) ----
        if self.Bo_s:
            xck_o = (jnp.asarray(data["surf_out_L"], dt)[None]
                     + dovf["ctr_s"][:, None])
            u_check_o = lax.map(
                s2m_box, (xck_o, dovf["xs_o"], dovf["ns_o"],
                          fo * dovf["val_s"][..., None]),
                batch_size=max(1, min(self.Bo_s, 2048)))
            u_check_o = u_check_o.reshape(self.Bo_s, -1) \
                * self.ker_s2t.scale_factor
            q_add = jnp.einsum("mn,bn->bm",
                               jnp.asarray(data["uc2e_L"], dt),
                               u_check_o, precision=hi)
            pXYZ = dovf["xyz_s"]
            pl_loc = pXYZ[:, 0] - idx * planes
            okp = (pl_loc >= 0) & (pl_loc < planes)
            cell = pXYZ[:, 1] * nside + pXYZ[:, 2]
            q_up = q_up.at[jnp.where(okp, pl_loc, planes),
                           cell].add(q_add * okp[:, None].astype(dt),
                                     mode="drop")

        # ---- M2M upward: local while sharded, replicated when coarse --
        q_lvl = {L: q_up}
        lvl = L
        while lvl > 2:
            q = q_lvl[lvl]
            pl = q.shape[0]
            n_l = 1 << lvl
            sharded = q.shape[0] * self.n_dev == n_l
            if sharded and pl >= 2 and lvl - 1 >= self.l_shard_min:
                q_lvl[lvl - 1] = self._m2m_local(q, lvl, data)
            else:
                if sharded:                     # gather to replicated
                    q = lax.all_gather(q, self.axis, tiled=True)
                    q_lvl[lvl] = q
                q_lvl[lvl - 1] = self._m2m_local(q, lvl, data)
            lvl -= 1

        # ---- M2L per level ----
        v_dn = {}
        for lvl in range(2, L + 1):
            q = q_lvl[lvl]
            n_l = 1 << lvl
            sharded = q.shape[0] * self.n_dev == n_l
            v_dn[lvl] = self._m2l_level(q, lvl, sharded, data)

        # ---- downward ----
        q_dn = v_dn[2]
        for lvl in range(3, L + 1):
            n_l = 1 << lvl
            child_sharded = (v_dn[lvl].shape[0] * self.n_dev == n_l)
            parent_sharded = (q_dn.shape[0] * self.n_dev == (n_l // 2))
            if child_sharded and not parent_sharded:
                # slice own slab of the replicated parent
                pp = (n_l // 2) // self.n_dev
                q_dn = lax.dynamic_slice_in_dim(q_dn, idx * pp, pp, 0)
            q_dn = self._l2l_local(q_dn, lvl, data) + v_dn[lvl]

        if q_dn.shape[0] != planes:             # leaf level replicated
            q_dn = lax.dynamic_slice_in_dim(q_dn, idx * planes,
                                            planes, 0)

        # ---- L2T (local) ----
        xeq = (jnp.asarray(data["surf_out_L"], dt)[None, None]
               + ctr_l[..., None, :])
        k0_l2t = self.ker_l2t.kdim0

        def l2t_box(args):
            xt_, xe, qd = args
            return self.ker_l2t.apply_pairwise(
                xt_, xe, xe, qd.reshape(-1, k0_l2t))

        u_far = lax.map(
            l2t_box, (flat(xt_l), flat(xeq),
                      q_dn.reshape(planes * n2, ns)),
            batch_size=max(1, min(planes * n2, 4096)))
        u_far = (u_far.reshape(planes, n2, self.cap_t,
                               self.ker_l2t.kdim1)
                 * self.ker_l2t.scale_factor)

        # ---- P2P: 27 neighbor shifts with 1-plane halo.  Points,
        # normals and density travel CONCATENATED in one buffer — a
        # single ppermute pair per apply instead of three (the
        # reference batches ghost payloads into one Alltoallv,
        # tree.txx:295+) ----
        k0s = fp.shape[-1]
        packed = jnp.concatenate([xs_l, ns_l, fp], axis=-1)
        packed_h = self._halo_x(packed, 1)
        xs_h = packed_h[..., :3]
        ns_h = packed_h[..., 3:6]
        fp_h = packed_h[..., 6:6 + k0s]

        def grid4(a):
            return a.reshape((a.shape[0], nside, nside)
                             + a.shape[2:])

        xs_4 = grid4(xs_h)                      # (pl+2, n, n, cap, 3)
        ns_4 = grid4(ns_h)
        fp_4 = grid4(fp_h)
        xt_4 = grid4(xt_l)

        u_near = jnp.zeros((planes, nside, nside, self.cap_t,
                            self.ker_s2t.kdim1), dtype=dt)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    src_x = xs_4[1 + dx: 1 + dx + planes]
                    src_n = ns_4[1 + dx: 1 + dx + planes]
                    src_f = fp_4[1 + dx: 1 + dx + planes]
                    src_x, src_n, src_f = [
                        _shift_yz(a, dy, dz)
                        for a in (src_x, src_n, src_f)]

                    def pair(args):
                        xt_, xs_, nr_, fb = args
                        return self.ker_s2t.apply_pairwise(
                            xt_, xs_, nr_, fb)

                    fl = lambda a: a.reshape((planes * nside * nside,)
                                             + a.shape[3:])
                    u_d = lax.map(
                        pair, (fl(xt_4), fl(src_x), fl(src_n),
                               fl(src_f)),
                        batch_size=max(1, min(planes * nside * nside,
                                              2048)))
                    u_near = u_near + u_d.reshape(u_near.shape)
        u_near = u_near * self.ker_s2t.scale_factor

        offs27 = np.stack(np.meshgrid(*([[-1, 0, 1]] * 3),
                                      indexing="ij"), -1).reshape(-1, 3)

        def pair27(args):
            xt_, xs_, nr_, fb = args
            return self.ker_s2t.apply_pairwise(xt_, xs_, nr_, fb)

        # ---- overflow sources -> padded targets of their 27
        # neighbors (computed on the target owner; replicated source
        # sideband) ----
        if self.Bo_s:
            TX = (dovf["xyz_s"][:, None, :]
                  + jnp.asarray(offs27, jnp.int32)[None])
            okg = jnp.all((TX >= 0) & (TX < nside), -1).reshape(-1)
            TXf = TX.reshape(-1, 3)
            tp = TXf[:, 0] - idx * planes
            okl = okg & (tp >= 0) & (tp < planes)
            tpc = jnp.clip(tp, 0, planes - 1)
            ty = jnp.clip(TXf[:, 1], 0, nside - 1)
            tz = jnp.clip(TXf[:, 2], 0, nside - 1)
            xt5 = xt_l.reshape(planes, nside, nside, self.cap_t, 3)
            xt_gath = xt5[tpc, ty, tz]         # (Bo*27, cap_t, 3)
            o_rep = jnp.repeat(jnp.arange(self.Bo_s), 27)
            fb = fo[o_rep] * okl[:, None, None].astype(dt)
            u_d = lax.map(
                pair27, (xt_gath, dovf["xs_o"][o_rep],
                         dovf["ns_o"][o_rep], fb),
                batch_size=max(1, min(self.Bo_s * 27, 2048)))
            u_near = u_near.at[
                jnp.where(okl, tpc, planes), ty, tz].add(
                u_d * self.ker_s2t.scale_factor, mode="drop")

        # ---- overflow targets: padded-source near field + L2T on the
        # owner (psum'd), then the replicated ovf->ovf part ----
        k1 = self.ker_l2t.kdim1
        u_ovf = jnp.zeros((max(self.Bo_t, 1), self.cap2_t, k1), dt)
        if self.Bo_t:
            SX = (dovf["xyz_t"][:, None, :]
                  + jnp.asarray(offs27, jnp.int32)[None])
            okg2 = jnp.all((SX >= 0) & (SX < nside), -1).reshape(-1)
            SXf = SX.reshape(-1, 3)
            sp = SXf[:, 0] - idx * planes
            okl2 = okg2 & (sp >= 0) & (sp < planes)
            spc = jnp.clip(sp, 0, planes - 1)
            syz = (jnp.clip(SXf[:, 1], 0, nside - 1) * nside
                   + jnp.clip(SXf[:, 2], 0, nside - 1))
            xs_gA = xs_l[spc, syz]             # (Bo_t*27, cap_s, 3)
            ns_gA = ns_l[spc, syz]
            fp_gA = fp[spc, syz] * okl2[:, None, None].astype(dt)
            o2 = jnp.repeat(jnp.arange(self.Bo_t), 27)
            u_d2 = lax.map(
                pair27, (dovf["xt_o"][o2], xs_gA, ns_gA, fp_gA),
                batch_size=max(1, min(self.Bo_t * 27, 2048)))
            u_ovf = u_ovf.at[o2].add(u_d2 * self.ker_s2t.scale_factor)
            # L2T from the (owner-local) down-equivalents
            tpo = dovf["xyz_t"][:, 0] - idx * planes
            okL = (tpo >= 0) & (tpo < planes)
            cell_t = (dovf["xyz_t"][:, 1] * nside
                      + dovf["xyz_t"][:, 2])
            qd_o = (q_dn[jnp.clip(tpo, 0, planes - 1), cell_t]
                    * okL[:, None].astype(dt))
            xeq_o = (jnp.asarray(data["surf_out_L"], dt)[None]
                     + dovf["ctr_t"][:, None])

            def l2t_o(args):
                xt_, xe, qd_ = args
                return self.ker_l2t.apply_pairwise(
                    xt_, xe, xe, qd_.reshape(-1, k0_l2t))

            u_l2t = lax.map(l2t_o, (dovf["xt_o"], xeq_o, qd_o),
                            batch_size=max(1, min(self.Bo_t, 2048)))
            u_ovf = u_ovf + u_l2t * self.ker_l2t.scale_factor
        u_ovf = lax.psum(u_ovf, self.axis)
        if (self.Bo_s and self.Bo_t
                and self.data_ovf["oo_pairs"].shape[0]):
            oo = dovf["oo_pairs"]
            u_oo = lax.map(
                pair27, (dovf["xt_o"][oo[:, 1]], dovf["xs_o"][oo[:, 0]],
                         dovf["ns_o"][oo[:, 0]], fo[oo[:, 0]]),
                batch_size=max(1, min(int(oo.shape[0]), 2048)))
            u_ovf = u_ovf.at[oo[:, 1]].add(
                u_oo * self.ker_s2t.scale_factor)

        u = (u_far.reshape(u_near.shape) + u_near)
        return u.reshape(planes, n2, self.cap_t, -1), u_ovf

    # -- level helpers -------------------------------------------------------
    def _m2m_local(self, q, lvl, data):
        """(pl, n2, ns) child level lvl -> parent level lvl-1 (local:
        slab sharding is parent-aligned).  x-major: child (X,Y,Z) =
        (2x+cx, 2y+cy, 2z+cz); Morton child index c = cx + 2cy + 4cz."""
        pl = q.shape[0]
        n_l = int(np.sqrt(q.shape[1]))
        ns = q.shape[2]
        qg = q.reshape(pl // 2, 2, n_l // 2, 2, n_l // 2, 2, ns)
        # child index c = cx + 2cy + 4cz from dims (1, 3, 5)
        qc = qg.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
            -1, 8, ns)  # order: (cx, cy, cz) with cx slowest = c' = 4cx+2cy+cz
        # reorder to Morton child index c = cx + 2cy + 4cz
        reorder = np.array([(4 * cx + 2 * cy + cz)
                            for c in range(8)
                            for cx, cy, cz in [((c & 1), (c >> 1) & 1,
                                                (c >> 2) & 1)]])
        qc = qc[:, jnp.asarray(reorder)]
        dt = q.dtype
        out = jnp.einsum("pcn,cmn->pm", qc,
                         jnp.asarray(data["m2m"][lvl - 1], dt),
                         precision=lax.Precision.HIGHEST)
        return out.reshape(pl // 2, (n_l // 2) ** 2, ns)

    def _l2l_local(self, q_parent, lvl, data):
        """parent level lvl-1 -> child level lvl (local)."""
        pl = q_parent.shape[0]
        n_p = int(np.sqrt(q_parent.shape[1]))
        ns = q_parent.shape[2]
        dt = q_parent.dtype
        qc = jnp.einsum("pn,cmn->pcm",
                        q_parent.reshape(-1, ns),
                        jnp.asarray(data["l2l"][lvl - 1], dt),
                        precision=lax.Precision.HIGHEST)  # (P, 8, ns)
        # qc[:, c] is Morton child index c = cx+2cy+4cz; the grid
        # reshape wants the child axis ordered (cx, cy, cz), cx slowest
        perm = np.array([cx + 2 * cy + 4 * cz
                         for cx in range(2) for cy in range(2)
                         for cz in range(2)])
        qc = qc[:, jnp.asarray(perm)]
        qg = qc.reshape(pl, n_p, n_p, 2, 2, 2, ns)
        qg = qg.transpose(0, 3, 1, 4, 2, 5, 6)
        return qg.reshape(pl * 2, (n_p * 2) ** 2, ns)

    def _m2l_level(self, q, lvl, sharded, data):
        """Per-parity two-sided-compressed M2L on the (possibly
        sharded) slab — the single-chip factored-grid form
        (kifmm.py:_m2l_sweep): project onto the joint row basis V
        once, per child parity run 189 contiguous shifted-block GEMMs
        in the compressed (r x r2) space, expand with U after.
        Sharded levels exchange a 2-h-plane halo on the h-grid x axis
        (local plane counts are even — powers of two over powers of
        two — so the local parity split always aligns)."""
        n_l = 1 << lvl
        ns = q.shape[2]
        dt = q.dtype
        pl = q.shape[0]
        h = n_l // 2
        hl = pl // 2
        hi = lax.Precision.HIGHEST
        qg = q.reshape(pl, n_l, n_l, ns)
        V = jnp.asarray(data["m2l_v"][lvl], dt)
        U = jnp.asarray(data["m2l_u"][lvl], dt)
        r = U.shape[1]
        r2 = V.shape[1]
        qr = jnp.einsum("xyzn,nk->xyzk", qg, V, precision=hi)
        # keep x h-planes leading for the halo: (hl, 2, h, 2, h, 2, r2)
        q7 = qr.reshape(hl, 2, h, 2, h, 2, r2)
        pad = 2
        if sharded:
            q7 = self._halo_x(q7, pad)
        else:
            q7 = jnp.pad(q7, ((pad, pad),) + ((0, 0),) * 6)
        qp = q7.transpose(1, 3, 5, 0, 2, 4, 6)  # (2,2,2,hl+4,h,h,r2)
        qp = jnp.pad(qp, ((0, 0),) * 3 + ((0, 0), (pad, pad),
                                          (pad, pad), (0, 0)))
        mats_all = jnp.asarray(data["m2l_a"][lvl], dt)   # (316, r, r2)
        outs = []
        for c in range(8):
            ebs = data["m2l_ebs"][c]                # (189, 3)
            eps = data["m2l_eps"][c]
            mats = mats_all[data["m2l_vidx"][c]]

            def m2l_step(acc, blk, hl=hl, h=h, r2=r2):
                eb, ep, mat = blk                   # mat (r, r2)
                sl = lax.dynamic_slice(
                    qp, (ep[0], ep[1], ep[2], 2 + eb[0], 2 + eb[1],
                         2 + eb[2], jnp.int32(0)),
                    (1, 1, 1, hl, h, h, r2)).reshape(hl, h, h, r2)
                return acc + jnp.einsum("xyzn,rn->xyzr", sl, mat,
                                        precision=hi), None

            acc0 = jnp.zeros((hl, h, h, r), dt)
            acc, _ = lax.scan(m2l_step, acc0, (ebs, eps, mats))
            outs.append(jnp.einsum("xyzr,nr->xyzn", acc, U,
                                   precision=hi))
        out = jnp.stack(outs).reshape(2, 2, 2, hl, h, h, ns)
        out = out.transpose(3, 0, 4, 1, 5, 2, 6).reshape(
            pl, n_l, n_l, ns)
        return out.reshape(pl, n_l * n_l, ns)


def _shift_yz(a, dy, dz):
    """Shift axes 1,2 of (pl, n, n, ...) by (dy, dz) with zero fill."""
    n = a.shape[1]
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1)) + ((0, 0),) * (a.ndim - 3))
    return ap[:, 1 + dy: 1 + dy + n, 1 + dz: 1 + dz + n]
