"""Single-source kernel micro-specs ("one kernel spec, three
lowerings", VERDICT r3 #8).

The reference defines each kernel ONCE as a micro-kernel
(`uKerMatrix`/`uKerEval`, generic-kernel.hpp:33-52,
kernel_functions.hpp:15-198) and lets `GenericKernel` lower it into
every execution context.  This module is that analogue:

- `uker_matrix(name, d, rinv, ns, xp)` — the (..., k0, k1) kernel
  matrix blocks written once over an array namespace `xp`; the jnp
  matrix_fn (ops/kernels.py), the numpy host form
  (ops/kernels_np.py offset_blocks_np, f64 AND longdouble), all call
  it.
- `UKER_APPLY[name](L)` — the *applied* MXU decomposition (pairwise
  scalar fields + moment GEMMs, SURVEY.md §3.5) written once against
  a small layout-adapter protocol `L`; three adapters lower it:
    * ops/kernels.py `_ApplyLayout`  — (T,S) jnp.dot form
      (direct_eval, ring EvalDirect),
    * ops/pallas_p2p.py `_SubLayout` — Pallas tiles, sources in
      sublanes / targets in lanes (stencil P2P),
    * ops/pallas_p2p.py `_LaneLayout` — Pallas tiles, targets in
      sublanes / sources in lanes (per-box U-list kernel).

Adapter protocol (all arrays layout-native; `field` is the (pairs)
array of one pairwise scalar):

  L.r2()            pairwise squared distances
  L.rinv(r2)        masked reciprocal sqrt (layout's rsqrt path)
  L.rdotf() / L.rdotn()  pairwise (xt - xs) . f / . n
  L.f(i)            density component i as a source row
  L.s(d)            source coordinate component d as a source row
  L.ones()          source row of ones
  L.moments(field, ws)  [sum_s field[t,s] * w[s] for w in ws], ONE
                    moment GEMM where the layout allows it
  L.t(d)            target coordinate component d, broadcastable
                    against a moment row
  L.out(cols)       assemble k1 moment-shaped columns

Every kernel body below mirrors the derivation comments that lived in
the per-layout copies (e.g. out_i = xt_i*(rinv3@f) - rinv3@(xs_i*f)).
"""

from __future__ import annotations


def uker_matrix(name: str, d, rinv, ns, xp):
    """(..., k0, k1) kernel matrix blocks from displacements
    d = xt - xs (..., 3), precomputed masked 1/r, and optional
    per-pair source normals.  NO scale factor (callers place it, as
    generic-kernel.txx:182-188 places uKerScaleFactor)."""
    rinv3 = rinv * rinv * rinv
    if name == "Laplace3D-FxU":
        return rinv[..., None, None]
    if name == "Laplace3D-DxU":
        rdotn = (d * ns).sum(-1)
        return (rdotn * rinv3)[..., None, None]
    if name == "Laplace3D-FxdU":
        return (d * rinv3[..., None])[..., None, :]      # (...,1,3)
    eye = xp.eye(3, dtype=d.dtype)
    if name == "Stokes3D-FxU":
        return (eye * rinv[..., None, None]
                + d[..., :, None] * d[..., None, :]
                * rinv3[..., None, None])
    if name == "Stokes3D-DxU":
        rinv5 = rinv3 * rinv * rinv
        rdotn = (d * ns).sum(-1)
        return (d[..., :, None] * d[..., None, :]
                * (rdotn * rinv5)[..., None, None])
    if name == "Stokes3D-FxT":
        rinv5 = rinv3 * rinv * rinv
        rr = (d[..., :, None, None] * d[..., None, :, None]
              * d[..., None, None, :]
              * rinv5[..., None, None, None])            # (...,3,3,3)
        return rr.reshape(rr.shape[:-3] + (3, 9))
    if name == "Stokes3D-FSxU":
        stk = (eye * rinv[..., None, None]
               + d[..., :, None] * d[..., None, :]
               * rinv3[..., None, None])
        src = (d * rinv3[..., None])[..., None, :]       # (...,1,3)
        return xp.concatenate([stk, src], axis=-2)       # (...,4,3)
    if name == "Stokes3D-FxUP":
        stk = (eye * rinv[..., None, None]
               + d[..., :, None] * d[..., None, :]
               * rinv3[..., None, None])
        p = (d * rinv3[..., None])[..., :, None]         # (...,3,1)
        return xp.concatenate([stk, p], axis=-1)         # (...,3,4)
    raise NotImplementedError(name)


# ---------------------------------------------------------------------------
# applied form (MXU moment decomposition), one body per kernel
# ---------------------------------------------------------------------------

def _uk_lap_fxu(L):
    rinv = L.rinv(L.r2())
    (h,) = L.moments(rinv, [L.f(0)])
    return L.out([h])


def _uk_lap_dxu(L):
    rinv = L.rinv(L.r2())
    (h,) = L.moments(L.rdotn() * rinv * rinv * rinv, [L.f(0)])
    return L.out([h])


def _uk_lap_fxdu(L):
    # out_i = sum_s r_i rinv3 f = xt_i*(rinv3@f) - rinv3@(xs_i*f)
    rinv = L.rinv(L.r2())
    rinv3 = rinv * rinv * rinv
    f0 = L.f(0)
    H = L.moments(rinv3, [f0, L.s(0) * f0, L.s(1) * f0, L.s(2) * f0])
    return L.out([L.t(d) * H[0] - H[1 + d] for d in range(3)])


def _stk_u_cols(L, rinv, rinv3, fsl):
    """Shared Stokeslet columns: rinv@f + r (r.f) rinv3, expanded into
    [1, xs] moments of C = (r.f) rinv3."""
    C = L.rdotf(fsl) * rinv3
    Hr = L.moments(rinv, [L.f(i) for i in fsl])
    Hc = L.moments(C, [L.ones(), L.s(0), L.s(1), L.s(2)])
    cols = [Hr[d] + L.t(d) * Hc[0] - Hc[1 + d] for d in range(3)]
    return cols, Hc[0]


def _uk_stk_fxu(L):
    rinv = L.rinv(L.r2())
    cols, _ = _stk_u_cols(L, rinv, rinv * rinv * rinv, range(3))
    return L.out(cols)


def _uk_stk_dxu(L):
    # out_j = sum_s r_j (r.f)(r.n) rinv5
    rinv = L.rinv(L.r2())
    rinv2 = rinv * rinv
    D = L.rdotf(range(3)) * L.rdotn() * (rinv2 * rinv2 * rinv)
    H = L.moments(D, [L.ones(), L.s(0), L.s(1), L.s(2)])
    return L.out([L.t(d) * H[0] - H[1 + d] for d in range(3)])


def _uk_stk_fxt(L):
    # out_{jk} = sum_s (r.f) rinv5 r_j r_k ; r_j r_k -> [1, x, xx]
    rinv = L.rinv(L.r2())
    rinv2 = rinv * rinv
    E = L.rdotf(range(3)) * (rinv2 * rinv2 * rinv)
    ws = ([L.ones()] + [L.s(d) for d in range(3)]
          + [L.s(j) * L.s(k) for j in range(3) for k in range(3)])
    H = L.moments(E, ws)
    h0, hx, hxx = H[0], H[1:4], H[4:13]
    cols = []
    for j in range(3):
        for k in range(3):
            cols.append(L.t(j) * L.t(k) * h0 - L.t(j) * hx[k]
                        - hx[j] * L.t(k) + hxx[3 * j + k])
    return L.out(cols)


def _uk_stk_fsxu(L):
    rinv = L.rinv(L.r2())
    rinv3 = rinv * rinv * rinv
    cols, _ = _stk_u_cols(L, rinv, rinv3, range(3))
    # source/sink: u_j += sum_s r_j rinv3 q_s
    q = L.f(3)
    H = L.moments(rinv3, [q, L.s(0) * q, L.s(1) * q, L.s(2) * q])
    return L.out([cols[d] + L.t(d) * H[0] - H[1 + d]
                  for d in range(3)])


def _uk_stk_fxup(L):
    rinv = L.rinv(L.r2())
    cols, h0 = _stk_u_cols(L, rinv, rinv * rinv * rinv, range(3))
    return L.out(cols + [h0])        # pressure: p = sum (r.f) rinv3


UKER_APPLY = {
    "Laplace3D-FxU": _uk_lap_fxu,
    "Laplace3D-DxU": _uk_lap_dxu,
    "Laplace3D-FxdU": _uk_lap_fxdu,
    "Stokes3D-FxU": _uk_stk_fxu,
    "Stokes3D-DxU": _uk_stk_dxu,
    "Stokes3D-FxT": _uk_stk_fxt,
    "Stokes3D-FSxU": _uk_stk_fsxu,
    "Stokes3D-FxUP": _uk_stk_fxup,
}
