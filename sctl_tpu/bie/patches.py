"""Concrete element list: tensor-product quadrature patches on a
parametric surface.

The reference keeps geometry outside the core library (SlenderElemList
lives in CSBQ; doc/tutorial/boundaryintegralop.rst) and ships only the
`ElementListBase` protocol.  This module provides the protocol's
reference implementation for smooth closed surfaces (sphere via cubed-
sphere charts, torus), so the BIE pipeline is usable and testable
end-to-end:

  - discretization nodes: q x q tensor Gauss-Legendre per patch
  - far-field quadrature: upsampled qf x qf GL with surface Jacobian
    weights and a resolution-based near cutoff dist_far
  - density interpolation: tensor Lagrange (q -> qf per axis)
  - NearInterac/SelfInterac: adaptive cell subdivision of the parameter
    square, refining toward the (near-)singular point — the role the
    reference delegates to the user's element implementation
    (boundary_integral.hpp:64-213)
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np
import jax.numpy as jnp

from ..linalg.lagrange import interpolation_matrix
from ..linalg.quadrule import leg_quad_rule
from ..ops.kernels import KernelSpec
from .boundary_integral import ElementListBase, host_kernel_matrix

_FD_H = 1e-6


class ParametricPatchList(ElementListBase):
    """Patches given by charts phi: [0,1]^2 -> R^3 (one callable per
    patch, vectorized over (M,2) parameter arrays)."""

    def __init__(self, charts: List[Callable], q: int = 6,
                 upsample: int = 2, flip_normal: bool = False):
        self.charts = charts
        self.q = q
        self.qf = q * upsample
        self.flip = -1.0 if flip_normal else 1.0
        x1, w1 = leg_quad_rule(q)
        xf, wf = leg_quad_rule(self.qf)
        self._uv_q = np.stack(np.meshgrid(x1, x1, indexing="ij"),
                              -1).reshape(-1, 2)
        self._uv_f = np.stack(np.meshgrid(xf, xf, indexing="ij"),
                              -1).reshape(-1, 2)
        self._w2_f = np.outer(wf, wf).reshape(-1)
        # tensor interpolation q -> qf (per axis), as a (q^2, qf^2) map
        m1 = interpolation_matrix(x1, xf)            # (q, qf)
        self._interp = np.einsum("ik,jl->ijkl", m1, m1).reshape(
            self.q ** 2, self.qf ** 2)
        self._x1 = x1

    # -- geometry helpers --------------------------------------------------
    def _geom(self, chart, uv):
        """(X, normal, jacobian) at parameter points uv (M,2)."""
        X = np.asarray(chart(uv))
        du = np.array([_FD_H, 0.0])
        dv = np.array([0.0, _FD_H])
        tu = (np.asarray(chart(uv + du)) - np.asarray(chart(uv - du))) \
            / (2 * _FD_H)
        tv = (np.asarray(chart(uv + dv)) - np.asarray(chart(uv - dv))) \
            / (2 * _FD_H)
        nrm = np.cross(tu, tv)
        J = np.linalg.norm(nrm, axis=1)
        n = self.flip * nrm / np.maximum(J, 1e-300)[:, None]
        return X, n, J

    # -- ElementListBase ----------------------------------------------------
    def size(self) -> int:
        return len(self.charts)

    def get_node_coord(self):
        Xs, Ns = [], []
        for ch in self.charts:
            X, n, _ = self._geom(ch, self._uv_q)
            Xs.append(X)
            Ns.append(n)
        cnt = np.full(self.size(), self.q ** 2, dtype=np.int64)
        return np.concatenate(Xs), np.concatenate(Ns), cnt

    def get_far_field_nodes(self, tol: float):
        Xs, Ns, Ws, Ds = [], [], [], []
        for ch in self.charts:
            X, n, J = self._geom(ch, self._uv_f)
            w = self._w2_f * J
            # resolution-based cutoff: GL error ~ (c h / d)^qf with
            # local spacing h ~ sqrt(area)/qf
            diam = np.linalg.norm(X.max(0) - X.min(0))
            h = diam / self.qf
            d_far = h * max(2.0, 2.0 * tol ** (-1.0 / self.qf))
            Xs.append(X)
            Ns.append(n)
            Ws.append(w)
            Ds.append(np.full(len(X), d_far))
        cnt = np.full(self.size(), self.qf ** 2, dtype=np.int64)
        return (np.concatenate(Xs), np.concatenate(Ns),
                np.concatenate(Ws), np.concatenate(Ds), cnt)

    def get_far_field_density(self, F):
        F = np.asarray(F)
        ne, nq, nf = self.size(), self.q ** 2, self.qf ** 2
        k = F.shape[1] if F.ndim > 1 else 1
        F = F.reshape(ne, nq, k)
        out = np.einsum("enk,nf->efk", F, self._interp)
        return out.reshape(ne * nf, k)

    def far_field_density_matrix(self, elem: int) -> np.ndarray:
        return self._interp                           # same every patch

    def near_interac(self, kernel: KernelSpec, xt: np.ndarray,
                     elem: int, tol: float) -> np.ndarray:
        """(n_nodes*k0, k1) near-singular operator for one (target,
        element) pair.

        Fast path: a single geometric-shell Duffy rule centered at the
        target's closest-point parameter preimage with the adapt floor
        at the normal distance (the reference's SetupNearSingular
        recipe, boundary_quadrature.hpp:981-1258) — one fixed
        quadrature instead of an adaptive subdivision loop, ~20-100x
        fewer host kernel evaluations.  Two rule orders provide an
        error estimate; on a miss the original adaptive subdivision
        runs as fallback."""
        if tol >= 1e-6:        # single fixed rule reaches ~1e-6 on
            fast = self._near_interac_duffy(kernel, xt, elem, tol)
            if fast is not None:   # curved charts; tighter tols go
                return fast        # straight to the adaptive rule
        return self._near_interac_adaptive(kernel, xt, elem, tol)

    def _near_interac_duffy(self, kernel: KernelSpec, xt: np.ndarray,
                            elem: int, tol: float):
        from .legacy_quadrature import duffy_quad
        ch = self.charts[elem]
        k0, k1 = kernel.kdim0, kernel.kdim1
        nq = self.q ** 2
        # closest-point preimage: seed at nearest quadrature node,
        # then Gauss-Newton with FD tangents
        X0, _, _ = self._geom(ch, self._uv_q)
        u0 = self._uv_q[np.argmin(((X0 - xt) ** 2).sum(1))].copy()
        h = _FD_H
        adapt = -1.0
        for _ in range(3):
            u0 = np.clip(u0, 0.0, 1.0)
            pts = np.array([u0, u0 + [h, 0], u0 - [h, 0],
                            u0 + [0, h], u0 - [0, h]])
            Xs = np.asarray(ch(pts))
            tu = (Xs[1] - Xs[2]) / (2 * h)
            tv = (Xs[3] - Xs[4]) / (2 * h)
            J = np.stack([tu, tv], axis=1)          # (3,2)
            r = xt - Xs[0]
            JtJ = J.T @ J
            try:
                u0 = u0 + np.linalg.solve(JtJ, J.T @ r)
            except np.linalg.LinAlgError:
                return None
            adapt = float(np.sqrt((r @ r)
                                  / max(JtJ[0, 0], JtJ[1, 1])))

        def rule(order):
            nds, wts = duffy_quad(u0, order, adapt)
            X, n, Jq = self._geom(ch, nds)
            km = host_kernel_matrix(kernel, xt[None], X, n).reshape(
                len(X), k0, k1)
            basis = self._basis(nds)
            return np.einsum("p,pn,pab->nab", wts * Jq, basis, km)

        lo = rule(12)
        hi = rule(16)
        scale = max(np.abs(hi).max(), 1e-300)
        if np.abs(hi - lo).max() > 10 * tol * scale:
            return None                             # fallback
        return hi.reshape(nq * k0, k1)

    def _near_interac_adaptive(self, kernel: KernelSpec,
                               xt: np.ndarray, elem: int,
                               tol: float) -> np.ndarray:
        """Adaptive subdivision toward the near-singular point until
        the q- vs 2q-point panel rules agree to tol.  Cells are
        processed in WAVES (all cells of a refinement generation
        evaluated in one batched geometry + kernel call) — identical
        quadrature, ~10x fewer numpy/host dispatches than the naive
        per-cell loop (this is the setup-time hot loop,
        boundary_integral.txx:816+)."""
        ch = self.charts[elem]
        q8, w8 = leg_quad_rule(8)
        q16, w16 = leg_quad_rule(16)
        uv8 = np.stack(np.meshgrid(q8, q8, indexing="ij"), -1).reshape(
            -1, 2)
        uv16 = np.stack(np.meshgrid(q16, q16, indexing="ij"),
                        -1).reshape(-1, 2)
        ww8 = np.outer(w8, w8).reshape(-1)
        ww16 = np.outer(w16, w16).reshape(-1)
        k0, k1 = kernel.kdim0, kernel.kdim1
        nq = self.q ** 2
        n8, n16 = len(uv8), len(uv16)

        def wave_integrals(los, sizes, uv, ww):
            """(C, nq, k0, k1) cell integrals for all cells at once."""
            C = len(los)
            pts = (los[:, None, :]
                   + uv[None, :, :] * sizes[:, None, None]).reshape(
                -1, 2)
            X, n, J = self._geom(ch, pts)
            km = host_kernel_matrix(kernel, xt[None], X, n).reshape(
                C, len(uv), k0, k1)
            basis = self._basis(pts).reshape(C, len(uv), nq)
            wj = (ww[None, :] * J.reshape(C, len(uv))
                  * (sizes * sizes)[:, None])
            return np.einsum("cp,cpn,cpab->cnab", wj, basis, km)

        out = np.zeros((nq, k0, k1))
        los = np.zeros((1, 2))
        sizes = np.ones(1)
        max_cells = 3000
        cells = 0
        fmax = 0.0
        while len(los) and cells < max_cells:
            i8 = wave_integrals(los, sizes, uv8, ww8)
            i16 = wave_integrals(los, sizes, uv16, ww16)
            err = np.abs(i8 - i16).reshape(len(los), -1).max(1)
            fmax = max(fmax, np.abs(i16).max())
            cells += len(los)
            done = (err < tol * max(fmax, 1e-300)) | (sizes < 1e-7)
            out += i16[done].sum(0)
            # refine the rest: 4 children each
            lo_r, sz_r = los[~done], sizes[~done]
            h = sz_r / 2
            los = np.concatenate(
                [lo_r + np.stack([dx * h, dy * h], 1)
                 for dx in (0.0, 1.0) for dy in (0.0, 1.0)]) \
                if len(lo_r) else np.zeros((0, 2))
            sizes = np.tile(h, 4)
        return out.reshape(nq * k0, k1) if k0 == 1 else \
            out.transpose(0, 1, 2).reshape(nq * k0, k1)

    def _basis(self, uv: np.ndarray) -> np.ndarray:
        """Tensor Lagrange basis at (P,2) params -> (P, q^2)."""
        mu = interpolation_matrix(self._x1, uv[:, 0])  # (q, P)
        mv = interpolation_matrix(self._x1, uv[:, 1])
        return np.einsum("ip,jp->pij", mu, mv).reshape(
            len(uv), self.q ** 2)


# -- standard closed surfaces ---------------------------------------------

def sphere_patches(n_per_face: int = 1, q: int = 6, radius: float = 1.0,
                   upsample: int = 2) -> ParametricPatchList:
    """Cubed-sphere: 6*n^2 patches covering the sphere."""
    charts = []
    axes = [(0, 1, 2, +1), (0, 1, 2, -1), (1, 2, 0, +1),
            (1, 2, 0, -1), (2, 0, 1, +1), (2, 0, 1, -1)]

    def make(a, b, c, sgn, u0, v0, h):
        def chart(uv, a=a, b=b, c=c, sgn=sgn, u0=u0, v0=v0, h=h):
            uu = (u0 + uv[:, 0] * h) * 2 - 1
            vv = (v0 + uv[:, 1] * h) * 2 - 1
            p = np.zeros((len(uv), 3))
            p[:, a] = uu
            p[:, b] = vv * sgn     # sign flip keeps normals outward
            p[:, c] = sgn
            return radius * p / np.linalg.norm(p, axis=1)[:, None]
        return chart

    h = 1.0 / n_per_face
    for (a, b, c, sgn) in axes:
        for i in range(n_per_face):
            for j in range(n_per_face):
                charts.append(make(a, b, c, sgn, i * h, j * h, h))
    return ParametricPatchList(charts, q=q, upsample=upsample)


def torus_patches(nu: int = 4, nv: int = 2, q: int = 6,
                  R: float = 2.0, r: float = 0.5,
                  upsample: int = 2) -> ParametricPatchList:
    """Torus (major R, minor r) split into nu x nv patches."""
    charts = []

    def make(u0, v0, hu, hv):
        def chart(uv, u0=u0, v0=v0, hu=hu, hv=hv):
            th = 2 * np.pi * (u0 + uv[:, 0] * hu)
            ph = 2 * np.pi * (v0 + uv[:, 1] * hv)
            x = (R + r * np.cos(ph)) * np.cos(th)
            y = (R + r * np.cos(ph)) * np.sin(th)
            z = r * np.sin(ph)
            return np.stack([x, y, z], 1)
        return chart

    for i in range(nu):
        for j in range(nv):
            charts.append(make(i / nu, j / nv, 1 / nu, 1 / nv))
    # d(theta) x d(phi) gives the outward normal
    return ParametricPatchList(charts, q=q, upsample=upsample)
