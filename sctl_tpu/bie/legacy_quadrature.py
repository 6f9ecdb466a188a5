"""Legacy boundary-quadrature layer: tensor-product surface elements
with Duffy-type singular quadrature.

TPU redesign of the reference's legacy quadrature module
(reference: boundary_quadrature.hpp:39-1812; marked legacy by
doc/tutorial/index.rst:78-86 — the modern path is `bie/` +
`BoundaryIntegralOp`).  Capabilities mirrored:

  TensorBasis        <- Basis<Real,DIM,ORDER> (boundary_quadrature.hpp:39)
  duffy_quad         <- Quadrature::DuffyQuad (:269): geometric
                        shell/panel rule concentrating at a (possibly
                        off-element) singular point
  tensor_gauss_quad  <- Quadrature::TensorProductGaussQuad (:385)
  BasisElemList      <- ElemList (:216) + DiscretizeSurfaceFn (:1753)
  setup_singular     <- Quadrature::SetupSingular (:394): per
                        (element, on-element target) correction =
                        Duffy quadrature MINUS the order_direct tensor
                        Gauss contribution
  build_nbr_list     <- Quadrature::BuildNbrList (:611) (bounding-
                        sphere search; the scalable tree-based near
                        search lives in the modern BoundaryIntegralOp)
  setup_near_singular<- Quadrature::SetupNearSingular (:981):
                        closest-point preimage by 2 Gauss-Newton
                        steps, then Duffy with adapt = dist/|x_u|
  LegacyQuadrature   <- Quadrature::Setup/Eval (:1444-1581)

Design: ALL quadrature tables and correction matrices are precomputed
in f64 numpy at setup (the reference's own posture — quadratures are
setup-time); the apply phase is a pair of batched einsums on device,
so an outer GMRES loop stays device-resident.  Correction matrices
are O(Nelem*Ntrg) small GEMMs — MXU-friendly and jit-stable.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..linalg.quadrule import leg_quad_rule
from ..ops.kernels import KernelSpec
from ..ops.kernels_np import full_matrix_np

__all__ = [
    "TensorBasis", "duffy_quad", "tensor_gauss_quad", "BasisElemList",
    "setup_singular", "build_nbr_list", "setup_near_singular",
    "LegacyQuadrature",
]


class TensorBasis:
    """Tensor-product Lagrange basis on [0,1]^dim at first-kind
    Chebyshev nodes (reference Basis<Real,DIM,ORDER>::Nodes,
    boundary_quadrature.hpp:54-85: x_i = 1/2 - cos((2i+1)pi/2q)/2).

    Values are stored nodally; eval/grad are interpolation matrices
    (Size, Npts) applied by GEMM."""

    def __init__(self, order: int, dim: int = 2):
        self.order = order
        self.dim = dim
        i = np.arange(order)
        self.nodes1d = 0.5 - 0.5 * np.cos((2 * i + 1) * np.pi
                                          / (2 * order))

    @property
    def size(self) -> int:
        return self.order ** self.dim

    def nodes(self) -> np.ndarray:
        """(dim, order^dim) tensor grid, dim-0 fastest (matching the
        reference's node ordering)."""
        grids = np.meshgrid(*([self.nodes1d] * self.dim),
                            indexing="ij")
        # axis d varies with stride order^d -> stack reversed
        return np.stack([g.T.ravel() for g in grids], axis=0)

    def _lag1d(self, x: np.ndarray) -> np.ndarray:
        """(order, len(x)) 1-D Lagrange cardinal values."""
        xn = self.nodes1d
        q = self.order
        out = np.ones((q, len(x)))
        for j in range(q):
            for k in range(q):
                if k != j:
                    out[j] *= (x - xn[k]) / (xn[j] - xn[k])
        return out

    def _dlag1d(self, x: np.ndarray) -> np.ndarray:
        """(order, len(x)) 1-D cardinal derivatives."""
        xn = self.nodes1d
        q = self.order
        out = np.zeros((q, len(x)))
        for j in range(q):
            for l in range(q):
                if l == j:
                    continue
                t = np.ones_like(x) / (xn[j] - xn[l])
                for k in range(q):
                    if k != j and k != l:
                        t *= (x - xn[k]) / (xn[j] - xn[k])
                out[j] += t
        return out

    def eval_matrix(self, pts: np.ndarray) -> np.ndarray:
        """(size, Npts) interpolation matrix at pts (dim, Npts)
        (reference Basis::SetupEval, boundary_quadrature.hpp:145)."""
        mats = [self._lag1d(pts[d]) for d in range(self.dim)]
        out = mats[0]
        for d in range(1, self.dim):
            out = (out[:, None, :] * mats[d][None, :, :]).reshape(
                -1, pts.shape[1])
        # index (i0 + q*i1 + ...) with i0 fastest: out above is
        # ordered i0 slowest -> reorder
        q = self.order
        idx = np.arange(self.size).reshape([q] * self.dim)
        perm = idx.transpose(list(range(self.dim))[::-1]).ravel()
        inv = np.empty_like(perm)
        inv[perm] = np.arange(self.size)
        return out[inv]

    def grad_matrices(self, pts: np.ndarray) -> list:
        """dim matrices (size, Npts): d/dx_d of the interpolant
        (reference Basis::Grad, boundary_quadrature.hpp:86-143)."""
        out = []
        for gd in range(self.dim):
            mats = [(self._dlag1d if d == gd else self._lag1d)(pts[d])
                    for d in range(self.dim)]
            m = mats[0]
            for d in range(1, self.dim):
                m = (m[:, None, :] * mats[d][None, :, :]).reshape(
                    -1, pts.shape[1])
            q = self.order
            idx = np.arange(self.size).reshape([q] * self.dim)
            perm = idx.transpose(list(range(self.dim))[::-1]).ravel()
            inv = np.empty_like(perm)
            inv[perm] = np.arange(self.size)
            out.append(m[inv])
        return out


def duffy_quad(coord, order: int, adapt: float = -1.0,
               ratio: float = 0.0, max_panel: float = 1.0
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Quadrature on [0,1]^2 concentrating geometrically at `coord`
    (which may lie outside the square): concentric rectangular shells
    around coord with growth ratio order/2, each shell's four
    trapezoidal side panels carrying a mapped tensor Gauss rule
    (reference Quadrature::DuffyQuad, boundary_quadrature.hpp:269-383;
    `adapt` >= 0 inserts a breakpoint at that radius — the near-
    singular refinement floor).  `ratio` overrides the shell growth
    factor (default order/2, the reference's choice; smaller ratios
    give more, narrower shells — needed when the INTEGRAND's smooth
    factor varies on scales the wide outer shells cannot resolve,
    e.g. strongly curved charts).  `max_panel` < 1 splits each
    panel's CROSS extent into segments no wider than that — the
    shells only refine radially, so cross-direction variation of the
    smooth factor (chart curvature) is otherwise resolved by order
    alone.

    Returns (nodes (N, 2), weights (N,))."""
    coord = np.asarray(coord, np.float64)
    q1, w1 = leg_quad_rule(order)
    eps = 16 * np.finfo(np.float64).eps
    if ratio <= 1.0:
        ratio = 0.5 * order

    # shell radii: breakpoints at 0, adapt, distances to the four
    # edge lines, geometric fill with ratio order/2 between them
    vals = sorted([0.0, adapt, abs(coord[0]), abs(coord[0] - 1.0),
                   abs(coord[1]), abs(coord[1] - 1.0)])
    X = [max(0.0, vals[-2] - 1.0)]
    for v in vals:
        if v > X[-1]:
            X.append(v)
    radii = [X[0]]
    for v in X[1:]:
        while radii[-1] > 0.0 and ratio * radii[-1] < v:
            radii.append(ratio * radii[-1])
        radii.append(v)

    yy, zz = np.meshgrid(q1, q1, indexing="ij")     # panel coords
    ww = np.outer(w1, w1)
    yy, zz, ww = yy.ravel(), zz.ravel(), ww.ravel()

    nds, wts = [], []
    clip = lambda v: min(1.0, max(0.0, v))
    for k in range(len(radii) - 1):
        r0, r1 = radii[k], radii[k + 1]
        for d0 in range(2):
            for sgn in (-1.0, 1.0):
                # inner/outer extents: the moving face is pinned at
                # coord[d0] + sgn*r; the other axis spans the clipped
                # shell width at each depth
                lo0 = [clip(coord[d] - r0) for d in range(2)]
                hi0 = [clip(coord[d] + r0) for d in range(2)]
                lo1 = [clip(coord[d] - r1) for d in range(2)]
                hi1 = [clip(coord[d] + r1) for d in range(2)]
                f0 = clip(coord[d0] + sgn * r0)
                f1 = clip(coord[d0] + sgn * r1)
                lo0[d0] = hi0[d0] = f0
                lo1[d0] = hi1[d0] = f1
                th = abs(f1 - f0)                   # panel thickness
                w0 = hi0[1 - d0] - lo0[1 - d0]
                w1_ = hi1[1 - d0] - lo1[1 - d0]
                if th * max(w0, w1_) < eps:
                    continue
                # blend: z along the d0 (depth) axis, y across
                # (cross extent split into <= max_panel segments)
                d1 = 1 - d0
                nseg = max(1, int(np.ceil(max(w0, w1_) / max_panel)))
                for sg in range(nseg):
                    ys = (sg + yy) / nseg
                    nd = np.empty((len(yy), 2))
                    nd[:, d0] = f0 * (1 - zz) + f1 * zz
                    nd[:, d1] = ((lo0[d1] * (1 - ys) + hi0[d1] * ys)
                                 * (1 - zz)
                                 + (lo1[d1] * (1 - ys) + hi1[d1] * ys)
                                 * zz)
                    wt = (ww / nseg) * th * (w0 * (1 - zz) + w1_ * zz)
                    nds.append(nd)
                    wts.append(wt)
    if not nds:
        return np.zeros((0, 2)), np.zeros((0,))
    return np.concatenate(nds), np.concatenate(wts)


_DUFFY_KMAX = 28          # padded shell cap (worst case ~6 breakpoints
                          # + log_{order/2}(1/adapt_floor) geo steps)


def duffy_radii_batch(coords: np.ndarray, order: int,
                      adapts: np.ndarray) -> np.ndarray:
    """Shell-radii ladders for P (coord, adapt) pairs at once — the
    rule-DESCRIPTOR half of `duffy_quad_batch`, split out so the
    device engine (bie/near_device.py) can upload the (P, K+1)
    ladders and build the panels on device (the panel blend is pure
    arithmetic; the ladder is the only data-dependent part)."""
    coords = np.atleast_2d(np.asarray(coords, np.float64))
    P = len(coords)
    adapts = np.broadcast_to(np.asarray(adapts, np.float64), (P,))
    adapts = np.where(adapts < 1e-7, 0.0, adapts)
    ratio = 0.5 * order
    c0, c1 = coords[:, 0], coords[:, 1]
    vals = np.sort(np.stack(
        [np.zeros(P), adapts, np.abs(c0), np.abs(c0 - 1.0),
         np.abs(c1), np.abs(c1 - 1.0)], 1), axis=1)        # (P, 6)
    start = np.maximum(0.0, vals[:, -2] - 1.0)

    def _bp(idx):
        return np.take_along_axis(vals, np.minimum(idx, 5)[:, None],
                                  1)[:, 0]

    # radii ladder: breakpoints interleaved with geometric fill
    # (scalar rule's radii loop, run across all pairs per column)
    r = start.copy()
    bp_idx = np.zeros(P, np.int64)
    for _ in range(6):
        bp_idx += (bp_idx < 6) & (_bp(bp_idx) <= r)
    cols = [r.copy()]
    active = bp_idx < 6
    while active.any():
        if len(cols) > _DUFFY_KMAX:
            raise RuntimeError("duffy_quad_batch shell cap exceeded")
        nb = _bp(bp_idx)
        geo = np.where(r > 0, ratio * r, np.inf)
        r_next = np.where(active, np.minimum(geo, nb), r)
        bp_idx += active & (geo >= nb)
        for _ in range(6):
            bp_idx += active & (bp_idx < 6) & (_bp(bp_idx) <= r_next)
        cols.append(r_next)
        r = r_next
        active = bp_idx < 6
    return np.stack(cols, 1)                               # (P, K+1)


def duffy_quad_batch(coords: np.ndarray, order: int,
                     adapts: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized `duffy_quad` over P (coord, adapt) pairs at once —
    the BIE near-setup hot loop batched (reference recipe
    boundary_quadrature.hpp:269-383; default ratio=order/2 and
    max_panel=1, i.e. nseg=1, matching the near_interac fast path).

    All pairs share one padded shell structure: shells beyond a pair's
    own radii ladder and degenerate panels carry ZERO weight, so the
    caller can evaluate geometry/kernels on the fixed-shape arrays and
    contract with the weights without per-pair branching.

    Returns (nodes (P, K*4*order^2, 2), weights (P, K*4*order^2));
    adapt values below 1e-7 are treated as 0 (shells that thin are
    dropped by the eps filter in the scalar rule anyway).
    """
    coords = np.atleast_2d(np.asarray(coords, np.float64))
    P = len(coords)
    eps = 16 * np.finfo(np.float64).eps
    q1, w1 = leg_quad_rule(order)
    radii = duffy_radii_batch(coords, order, adapts)
    K = radii.shape[1] - 1

    yy, zz = np.meshgrid(q1, q1, indexing="ij")
    ww = np.outer(w1, w1)
    yy, zz, ww = yy.ravel(), zz.ravel(), ww.ravel()        # (n2,)
    n2 = len(yy)
    clip = lambda v: np.clip(v, 0.0, 1.0)

    r0 = radii[:, :-1]                                     # (P, K)
    r1 = radii[:, 1:]
    nd_out = np.zeros((P, K, 4, n2, 2))
    wt_out = np.zeros((P, K, 4, n2))
    pi = 0
    for d0 in range(2):
        cd0 = coords[:, d0][:, None]                       # (P, 1)
        cd1 = coords[:, 1 - d0][:, None]
        for sgn in (-1.0, 1.0):
            f0 = clip(cd0 + sgn * r0)                      # (P, K)
            f1 = clip(cd0 + sgn * r1)
            lo0 = clip(cd1 - r0)
            hi0 = clip(cd1 + r0)
            lo1 = clip(cd1 - r1)
            hi1 = clip(cd1 + r1)
            th = np.abs(f1 - f0)
            w0 = hi0 - lo0
            w1_ = hi1 - lo1
            live = th * np.maximum(w0, w1_) >= eps         # (P, K)
            zz_ = zz[None, None, :]
            nd_out[:, :, pi, :, d0] = (f0[..., None] * (1 - zz_)
                                       + f1[..., None] * zz_)
            ys = yy[None, None, :]
            nd_out[:, :, pi, :, 1 - d0] = (
                (lo0[..., None] * (1 - ys) + hi0[..., None] * ys)
                * (1 - zz_)
                + (lo1[..., None] * (1 - ys) + hi1[..., None] * ys)
                * zz_)
            wt_out[:, :, pi] = (live[..., None] * ww[None, None, :]
                                * th[..., None]
                                * (w0[..., None] * (1 - zz_)
                                   + w1_[..., None] * zz_))
            pi += 1
    return (nd_out.reshape(P, K * 4 * n2, 2),
            wt_out.reshape(P, K * 4 * n2))


def tensor_gauss_quad(order: int) -> Tuple[np.ndarray, np.ndarray]:
    """order^2-point tensor Gauss rule on [0,1]^2 (reference
    Quadrature::TensorProductGaussQuad, boundary_quadrature.hpp:385)."""
    q1, w1 = leg_quad_rule(order)
    u, v = np.meshgrid(q1, q1, indexing="ij")
    return (np.stack([u.ravel(), v.ravel()], axis=1),
            np.outer(w1, w1).ravel())


class BasisElemList:
    """Surface as Nelem tensor-basis elements: nodal coordinates
    (Nelem, size, 3) (reference ElemList, boundary_quadrature.hpp:216).
    """

    def __init__(self, order: int, X: np.ndarray):
        self.basis = TensorBasis(order, 2)
        X = np.asarray(X, np.float64)
        assert X.ndim == 3 and X.shape[1] == self.basis.size \
            and X.shape[2] == 3
        self.X = X

    @property
    def n_elem(self) -> int:
        return self.X.shape[0]

    @classmethod
    def discretize(cls, order: int, charts) -> "BasisElemList":
        """Sample parametric charts ([0,1]^2 -> R^3) at the basis
        nodes (reference DiscretizeSurfaceFn,
        boundary_quadrature.hpp:1753)."""
        b = TensorBasis(order, 2)
        nds = b.nodes()                             # (2, size)
        X = np.stack([np.asarray(c(nds.T)) for c in charts])
        return cls(order, X)

    def geometry(self, pts: np.ndarray, elem: Optional[int] = None):
        """Positions, unit normals (xu x xv, reference orientation
        boundary_quadrature.hpp:446-456) and area elements at
        parameter points pts (2, N): -> x (E, N, 3), nrm (E, N, 3),
        area (E, N); `elem` restricts to one element -> (N, ...)."""
        E = self.basis.eval_matrix(pts)             # (size, N)
        Du, Dv = self.basis.grad_matrices(pts)
        X = self.X if elem is None else self.X[elem:elem + 1]
        x = np.einsum("esk,sn->enk", X, E)
        xu = np.einsum("esk,sn->enk", X, Du)
        xv = np.einsum("esk,sn->enk", X, Dv)
        nrm = np.cross(xu, xv)
        area = np.linalg.norm(nrm, axis=-1)
        nrm = nrm / np.maximum(area, 1e-300)[..., None]
        if elem is not None:
            return x[0], nrm[0], area[0]
        return x, nrm, area


def _corr_block(ker: KernelSpec, x0: np.ndarray, xq: np.ndarray,
                nq: np.ndarray, wt: np.ndarray,
                Ed: np.ndarray) -> np.ndarray:
    """One (element, target) quadrature block: density nodal values ->
    potential at x0.  xq/nq (N,3) quadrature points/unit normals, wt
    (N,) weights * area, Ed (size, N) density eval matrix.
    -> (size*k0, k1), scale factor included."""
    M = full_matrix_np(ker, x0[None, :], xq, nq)    # (N*k0, k1)
    k0, k1 = ker.kdim0, ker.kdim1
    Mw = M.reshape(len(xq), k0, k1) * wt[:, None, None]
    return np.einsum("sn,nab->sab", Ed, Mw).reshape(-1, k1)


def setup_singular(trg_nds: np.ndarray, elems: BasisElemList,
                   ker: KernelSpec, order_singular: int = 10,
                   order_direct: int = 10) -> np.ndarray:
    """Correction matrices for on-element targets at parameter nodes
    trg_nds (2, Ntrg): Duffy quadrature at the target minus the
    order_direct tensor Gauss contribution of the SAME element
    (reference Quadrature::SetupSingular,
    boundary_quadrature.hpp:394-549).

    -> (Nelem, Ntrg, size*k0, k1)"""
    Ntrg = trg_nds.shape[1]
    Ne = elems.n_elem
    k0, k1 = ker.kdim0, ker.kdim1
    size = elems.basis.size
    xt, _, _ = elems.geometry(trg_nds)              # (E, Ntrg, 3)

    M = np.zeros((Ne, Ntrg, size * k0, k1))
    for i in range(Ntrg):
        nds, wts = duffy_quad(trg_nds[:, i], order_singular)
        xq, nq, aq = elems.geometry(nds.T)
        Ed = elems.basis.eval_matrix(nds.T)
        for j in range(Ne):
            M[j, i] = _corr_block(ker, xt[j, i], xq[j], nq[j],
                                  wts * aq[j], Ed)
    # subtract the direct contribution the far-field quadrature will
    # double count
    ndsd, wtsd = tensor_gauss_quad(order_direct)
    xqd, nqd, aqd = elems.geometry(ndsd.T)
    Edd = elems.basis.eval_matrix(ndsd.T)
    for i in range(Ntrg):
        for j in range(Ne):
            M[j, i] -= _corr_block(ker, xt[j, i], xqd[j], nqd[j],
                                   wtsd * aqd[j], Edd)
    return M


def build_nbr_list(Xt: np.ndarray, trg_surf: np.ndarray,
                   elems: BasisElemList, distance_factor: float = 2.5
                   ) -> np.ndarray:
    """Near pairs (t, e): target within distance_factor * radius of
    element e's bounding sphere, excluding targets ON e (reference
    Quadrature::BuildNbrList, boundary_quadrature.hpp:611 — there via
    the distributed tree; here a chunked bounding-sphere sweep, the
    legacy layer's sizes are modest and the scalable near search is
    BoundaryIntegralOp's).

    trg_surf[t] = element owning target t (-1 = off-surface).
    -> (P, 2) int array."""
    ctr = elems.X.mean(axis=1)                      # (E, 3)
    rad = np.linalg.norm(elems.X - ctr[:, None], axis=-1).max(axis=1)
    pairs = []
    for t0 in range(0, len(Xt), 4096):
        xt = Xt[t0:t0 + 4096]
        d = np.linalg.norm(xt[:, None] - ctr[None], axis=-1)
        near = d < distance_factor * rad[None]
        ti, ei = np.nonzero(near)
        own = trg_surf[t0 + ti] == ei
        pairs.append(np.stack([t0 + ti[~own], ei[~own]], axis=1))
    return (np.concatenate(pairs) if pairs
            else np.zeros((0, 2), np.int64))


def setup_near_singular(Xt: np.ndarray, pairs: np.ndarray,
                        elems: BasisElemList, ker: KernelSpec,
                        order_singular: int = 10,
                        order_direct: int = 10) -> np.ndarray:
    """Near-singular corrections for off-element targets: for each
    pair, the closest-point parameter preimage u0 by 2 Gauss-Newton
    steps from the nearest basis node, then an adapt = dist/|x_u|
    Duffy rule minus the direct rule (reference
    Quadrature::SetupNearSingular, boundary_quadrature.hpp:981-1258).

    -> (P, size*k0, k1)"""
    size = elems.basis.size
    k0, k1 = ker.kdim0, ker.kdim1
    bnodes = elems.basis.nodes()                    # (2, size)
    ndsd, wtsd = tensor_gauss_quad(order_direct)
    xqd, nqd, aqd = elems.geometry(ndsd.T)
    Edd = elems.basis.eval_matrix(ndsd.T)

    M = np.zeros((len(pairs), size * k0, k1))
    for p, (t, e) in enumerate(pairs):
        x0 = Xt[t]
        # nearest basis node as Newton seed
        d2 = ((elems.X[e] - x0) ** 2).sum(-1)
        u0 = bnodes[:, np.argmin(d2)].copy()
        adapt = -1.0
        for _ in range(2):
            u0 = np.clip(u0, 0.0, 1.0)
            pt = u0[:, None]
            E = elems.basis.eval_matrix(pt)
            Du, Dv = elems.basis.grad_matrices(pt)
            x = elems.X[e].T @ E[:, 0]
            J = np.stack([elems.X[e].T @ Du[:, 0],
                          elems.X[e].T @ Dv[:, 0]], axis=1)  # (3,2)
            r = x0 - x
            JtJ = J.T @ J
            u0 = u0 + np.linalg.solve(JtJ, J.T @ r)
            adapt = float(np.sqrt(r @ r / max(JtJ[0, 0], JtJ[1, 1])))
        nds, wts = duffy_quad(u0, order_singular, adapt)
        xq, nq, aq = elems.geometry(nds.T, elem=e)
        Ed = elems.basis.eval_matrix(nds.T)
        M[p] = (_corr_block(ker, x0, xq, nq, wts * aq, Ed)
                - _corr_block(ker, x0, xqd[e], nqd[e],
                              wtsd * aqd[e], Edd))
    return M


class LegacyQuadrature:
    """Setup/Eval driver (reference Quadrature::Setup + Eval,
    boundary_quadrature.hpp:1444-1581): potential = upsampled direct
    quadrature over ALL elements + precomputed singular/near
    corrections; the apply phase is device-resident einsums."""

    def __init__(self, ker: KernelSpec, elems: BasisElemList,
                 order_singular: int = 10, order_direct: int = 10):
        self.ker = ker
        self.elems = elems
        self.order_singular = order_singular
        self.order_direct = order_direct
        self._on_surface = None

    def setup(self, Xt: Optional[np.ndarray] = None,
              trg_surf: Optional[np.ndarray] = None,
              distance_factor: float = 2.5):
        """Targets = the element nodes themselves (on-surface solve
        operator) when Xt is None; otherwise arbitrary points with
        trg_surf ownership (-1 = off-surface)."""
        ker, elems = self.ker, self.elems
        b = elems.basis
        ndsd, wtsd = tensor_gauss_quad(self.order_direct)
        self._xq, self._nq, aq = elems.geometry(ndsd.T)
        self._wq = wtsd[None, :] * aq               # (E, Nq)
        self._Ed = b.eval_matrix(ndsd.T)            # (size, Nq)

        if Xt is None:
            # on-surface operator: self-element Duffy corrections PLUS
            # near-singular corrections against the OTHER nearby
            # elements (the reference Eval driver pairs SetupSingular
            # with SetupNearSingular under trg_surf ownership,
            # boundary_quadrature.hpp:1444-1462)
            self._on_surface = True
            trg_nds = b.nodes()
            self._Xt, _, _ = elems.geometry(trg_nds)
            self._Xt = self._Xt.reshape(-1, 3)
            self._Msing = setup_singular(
                trg_nds, elems, ker, self.order_singular,
                self.order_direct)                  # (E,T,size*k0,k1)
            trg_surf = np.repeat(np.arange(elems.n_elem), b.size)
        else:
            self._on_surface = False
            self._Xt = np.asarray(Xt, np.float64)
            if trg_surf is None:
                trg_surf = np.full(len(self._Xt), -1, np.int64)
            if (np.asarray(trg_surf) >= 0).any():
                raise NotImplementedError(
                    "on-surface targets via Xt: pass Xt=None for the "
                    "self-interaction operator")
        self._pairs = build_nbr_list(self._Xt, trg_surf, elems,
                                     distance_factor)
        self._Mnear = setup_near_singular(
            self._Xt, self._pairs, elems, ker,
            self.order_singular, self.order_direct)
        # device-side tables (f64 on CPU meshes, f32 on TPU — same
        # dtype policy as BoundaryIntegralOp._tpu_backend)
        import jax
        dt = (jnp.float64 if jax.config.jax_enable_x64
              else jnp.float32)
        self._dev = {
            "xq": jnp.asarray(self._xq.reshape(-1, 3), dt),
            "nq": jnp.asarray(self._nq.reshape(-1, 3), dt),
            "wq": jnp.asarray(self._wq.reshape(-1), dt),
            "Ed": jnp.asarray(self._Ed, dt),
            "xt": jnp.asarray(self._Xt, dt),
        }
        if self._on_surface:
            self._dev["Msing"] = jnp.asarray(self._Msing, dt)
        self._dev["Mnear"] = jnp.asarray(self._Mnear, dt)
        self._dev["pairs"] = jnp.asarray(
            self._pairs.reshape(-1, 2), jnp.int32)
        return self

    def eval(self, density: np.ndarray) -> np.ndarray:
        """density (Nelem, size, k0) nodal values ->
        (Ntrg, k1) potentials (scale factor included)."""
        from ..ops.direct import direct_eval_blocked
        ker = self.ker
        E, size = self.elems.n_elem, self.elems.basis.size
        k0, k1 = ker.kdim0, ker.kdim1
        dens = jnp.asarray(
            np.asarray(density, np.float64).reshape(E, size, k0),
            self._dev["xq"].dtype)
        d = self._dev
        # upsample to the direct quadrature, weight, and evaluate as
        # a plain (weighted) point sum — the far field
        fq = jnp.einsum("esk,sn->enk", dens, d["Ed"])
        fq = fq * d["wq"].reshape(E, -1)[:, :, None]
        u = direct_eval_blocked(
            ker, d["xt"], d["xq"], fq.reshape(-1, k0),
            ns=d["nq"] if ker.needs_normal else None)
        # corrections
        # (correction matrices already carry the kernel scale factor
        # via full_matrix_np, as does direct_eval_blocked)
        if self._on_surface:
            dc = dens.reshape(E, size * k0)
            corr = jnp.einsum("es,etsb->etb", dc, d["Msing"])
            u = u + corr.reshape(-1, k1)
        if len(self._pairs):
            dc = dens.reshape(E, size * k0)[d["pairs"][:, 1]]
            corr = jnp.einsum("ps,psb->pb", dc, d["Mnear"])
            u = u.at[d["pairs"][:, 0]].add(corr)
        return np.asarray(u)
