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
        self.cap_s = max(8, int(self.src_tree.box_cnt.max()))
        self.cap_t = max(8, int(self.trg_tree.box_cnt.max()))
        xs_p, ns_p, _ = _pad_boxes(self.src_tree, n_src, self.cap_s)
        xt_p, _, t_mask = _pad_boxes(self.trg_tree, None, self.cap_t)

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
        # operators (replicated)
        rep = NamedSharding(self.mesh, P())
        cast = lambda a: jax.device_put(jnp.asarray(a, dt), rep)
        self.data_rep = {
            "uc2e_L": cast(ops.uc2e[L]),
            "m2m": tuple(cast(a) for a in ops.m2m),
            "l2l": tuple(cast(a) for a in ops.l2l),
            "m2l": tuple(cast(a) for a in ops.m2l),
            "surf_out_L": cast(ops.surf_out[L]),
            "offsets": jax.device_put(
                jnp.asarray(ops.offsets, jnp.int32), rep),
            "pvalid": cast(ops.parity_valid.T.astype(np.float64)),
        }
        self._eval_jit = None
        return self

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
        fp = f[tree.perm][idx] * valid[..., None]
        nside = 1 << self.depth
        fp = fp[self._xmajor[self.depth]].reshape(
            nside, nside * nside, self.cap_s, -1)
        return jax.device_put(jnp.asarray(fp, self.dtype),
                              NamedSharding(self.mesh, P(self.axis)))

    # -- halo helpers (inside shard_map) ------------------------------------
    def _halo_x(self, a, width: int):
        """Pad the local slab's leading axis with `width` planes from
        the neighbor shards (zeros at the domain boundary)."""
        ax = self.axis
        nd = self.n_dev
        idx = lax.axis_index(ax)
        lo = lax.ppermute(a[-width:], ax,
                          [(i, (i + 1) % nd) for i in range(nd)])
        hi = lax.ppermute(a[:width], ax,
                          [(i, (i - 1) % nd) for i in range(nd)])
        zero = jnp.zeros_like(lo)
        lo = jnp.where(idx == 0, zero, lo)         # wrap -> zero
        hi = jnp.where(idx == nd - 1, zero, hi)
        return jnp.concatenate([lo, a, hi], axis=0)

    # -- evaluation ----------------------------------------------------------
    def eval(self, f) -> np.ndarray:
        fp = self._pad_density(f)
        if self._eval_jit is None:
            spec = P(self.axis)
            rep_spec = jax.tree_util.tree_map(lambda _: P(),
                                              self.data_rep)
            self._eval_jit = jax.jit(jax.shard_map(
                self._eval_impl, mesh=self.mesh,
                in_specs=(spec, spec, spec, spec, spec, rep_spec),
                out_specs=spec, check_vma=False))
        u_g = self._eval_jit(fp, self.xs_g, self.ns_g, self.xt_g,
                             self.ctr_g, self.data_rep)
        # x-major grid -> Morton box order -> original target order
        nside = 1 << self.depth
        u = np.asarray(u_g).reshape(nside ** 3, self.cap_t, -1)
        u_m = u[self._xmajor_inv()]
        u_flat = u_m.reshape(-1, self.ker_l2t.kdim1)[
            self.t_mask.reshape(-1)]
        out = np.empty_like(u_flat)
        out[...] = u_flat
        res = np.empty((len(self.trg_tree.perm), self.ker_l2t.kdim1))
        res[self.trg_tree.perm] = out
        return res

    def _xmajor_inv(self):
        """Morton box index -> x-major linear position."""
        if getattr(self, "_xmajor_inv_cache", None) is None:
            self._xmajor_inv_cache = np.argsort(self._xmajor[self.depth])
        return self._xmajor_inv_cache

    def _eval_impl(self, fp, xs_l, ns_l, xt_l, ctr_l, data):
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

        # ---- P2P: 27 neighbor shifts with 1-plane halo ----
        xs_h = self._halo_x(xs_l, 1)
        ns_h = self._halo_x(ns_l, 1)
        fp_h = self._halo_x(fp, 1)

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

        u = (u_far.reshape(u_near.shape) + u_near)
        return u.reshape(planes, n2, self.cap_t, -1)

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
        """Masked 316-offset M2L on the (possibly sharded) grid."""
        ops = self._ops
        n_l = 1 << lvl
        ns = q.shape[2]
        dt = q.dtype
        pl = q.shape[0]
        qg = q.reshape(pl, n_l, n_l, ns)
        pad = 3
        if sharded:
            qx = self._halo_x(qg, pad)
        else:
            qx = jnp.pad(qg, ((pad, pad), (0, 0), (0, 0), (0, 0)))
        qp = jnp.pad(qx, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        # parity of local x planes depends on the slab offset
        if sharded:
            x0 = lax.axis_index(self.axis) * pl
        else:
            x0 = 0
        xs_par = (jnp.arange(pl) + x0) & 1
        ys = np.arange(n_l) & 1
        par = (xs_par[:, None, None] * 4
               + jnp.asarray(ys)[None, :, None] * 2
               + jnp.asarray(ys)[None, None, :])   # (pl, n, n)

        offsets = jnp.asarray(data["offsets"], jnp.int32)
        m2l = jnp.asarray(data["m2l"][lvl], dt)
        pvalid = jnp.asarray(data["pvalid"], dt)    # (8, 316)

        def step(acc, blk):
            d, mat, pv = blk                        # pv: (8,) validity
            sl = lax.dynamic_slice(
                qp, (pad + d[0], pad + d[1], pad + d[2],
                     jnp.int32(0)), (pl, n_l, n_l, ns))
            contrib = jnp.einsum("xyzn,mn->xyzm", sl, mat,
                                 precision=lax.Precision.HIGHEST)
            return acc + contrib * pv[par][..., None], None

        acc0 = jnp.zeros((pl, n_l, n_l, ns), dtype=dt)
        acc, _ = lax.scan(step, acc0, (offsets, m2l, pvalid))
        return acc.reshape(pl, n_l * n_l, ns)


def _shift_yz(a, dy, dz):
    """Shift axes 1,2 of (pl, n, n, ...) by (dy, dz) with zero fill."""
    n = a.shape[1]
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1)) + ((0, 0),) * (a.ndim - 3))
    return ap[:, 1 + dy: 1 + dy + n, 1 + dz: 1 + dz + n]
