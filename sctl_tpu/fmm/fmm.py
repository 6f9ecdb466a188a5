"""ParticleFMM facade.

TPU-native equivalent of the reference's kernel-independent FMM facade
(reference: include/sctl/fmm-wrapper.hpp:73-194, fmm-wrapper.txx;
SURVEY.md §3.4): named source/target groups, per-pair S2T kernels,
`Eval` dispatching to the fast path (here: native uniform-tree KIFMM,
sctl_tpu.fmm.kifmm — the reference uses external PVFMM) with automatic
fallback to direct evaluation below a size cutoff (fmm-wrapper.txx:
798-801 uses 40,000 points) or for kernels without a tree path, and
`EvalDirect` — on a mesh, a ppermute ring rotating source shards
through all ranks (fmm-wrapper.txx:537-558).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .. import profile
from ..comm.comm import Comm
from ..ops.direct import direct_eval_blocked
from ..ops.kernels import (KernelSpec, Laplace3D_FxU, Laplace3D_FxdU,
                           Stokes3D_FSxU)
from .kifmm import KIFMM

DIRECT_CUTOFF = 40_000   # below this, direct eval (fmm-wrapper.txx:798)

# kernels with a native tree path and their L2T companion (the
# translation set is chosen inside KIFMM: Laplace monopoles or Stokes
# Stokeslet+source FSxU, cf. kernel_functions.hpp:213)
_TREE_L2T = {
    "Laplace3D-FxU": Laplace3D_FxU,
    "Laplace3D-DxU": Laplace3D_FxU,
    "Laplace3D-FxdU": Laplace3D_FxdU,
    "Stokes3D-FxU": Stokes3D_FSxU,
    "Stokes3D-DxU": Stokes3D_FSxU,
    "Stokes3D-FSxU": Stokes3D_FSxU,
}


class _Group:
    def __init__(self):
        self.coord = None
        self.normal = None
        self.density = None


class ParticleFMM:
    """Facade mirroring the reference API shape:

        fmm = ParticleFMM(comm=..., accuracy=digits)
        fmm.set_kernel_s2t("src", "trg", kernel)
        fmm.set_src_coord("src", X);  fmm.set_src_density("src", F)
        fmm.set_trg_coord("trg", Xt)
        U = fmm.eval("trg")          # tree FMM (or direct fallback)
        U = fmm.eval_direct("trg")   # O(N^2) reference oracle
    """

    def __init__(self, comm: Optional[Comm] = None, accuracy: int = 6):
        self.comm = comm or Comm.self_()
        self.accuracy = accuracy
        self.src: Dict[str, _Group] = {}
        self.trg: Dict[str, _Group] = {}
        self.s2t_kernels: Dict[tuple, KernelSpec] = {}
        self._kifmm_cache: Dict[tuple, KIFMM] = {}

    # -- configuration (reference: fmm-wrapper.hpp:73-150) ----------------
    def set_accuracy(self, digits: int):
        self.accuracy = digits
        self._kifmm_cache.clear()

    def add_src(self, name: str):
        self.src.setdefault(name, _Group())

    def add_trg(self, name: str):
        self.trg.setdefault(name, _Group())

    def set_kernel_s2t(self, src: str, trg: str, kernel: KernelSpec):
        self.add_src(src)
        self.add_trg(trg)
        self.s2t_kernels[(src, trg)] = kernel

    def set_src_coord(self, name: str, X, normal=None):
        self.add_src(name)
        self.src[name].coord = np.asarray(X, np.float64)
        if normal is not None:
            self.src[name].normal = np.asarray(normal, np.float64)
        self._kifmm_cache.clear()

    def set_src_density(self, name: str, F):
        self.add_src(name)
        self.src[name].density = np.asarray(F, np.float64)

    def set_trg_coord(self, name: str, X):
        self.add_trg(name)
        self.trg[name].coord = np.asarray(X, np.float64)
        self._kifmm_cache.clear()

    # -- evaluation --------------------------------------------------------
    def eval(self, trg_name: str) -> np.ndarray:
        """Fast evaluation into target group `trg_name`
        (reference: ParticleFMM::Eval, fmm-wrapper.txx:481)."""
        xt = self.trg[trg_name].coord
        total = sum(len(self.src[s].coord)
                    for (s, t) in self.s2t_kernels if t == trg_name)
        u = None
        for (s, t), ker in self.s2t_kernels.items():
            if t != trg_name:
                continue
            g = self.src[s]
            if (total < DIRECT_CUTOFF or ker.name not in _TREE_L2T):
                us = self._direct_pair(ker, xt, g)
            else:
                us = self._tree_pair(ker, xt, g, s, trg_name)
            u = us if u is None else u + us
        return u

    def eval_jnp(self, trg_name: str, densities: Dict[str, jnp.ndarray]
                 ) -> jnp.ndarray:
        """Traced evaluation: densities {src_name: (n, k0) jnp} ->
        (n_trg, k1) jnp with NO host round trip — the solver-loop
        path (a GMRES over the facade previously paid a host
        pad/un-sort per iteration through `eval`; reference:
        fmm-wrapper.txx:481 evaluates device-resident).  Tree pairs
        route through KIFMM.eval_jnp, small/direct pairs through
        the blocked direct sum; the whole call is jittable."""
        xt = self.trg[trg_name].coord
        total = sum(len(self.src[s].coord)
                    for (s, t) in self.s2t_kernels if t == trg_name)
        u = None
        for (s, t), ker in self.s2t_kernels.items():
            if t != trg_name:
                continue
            g = self.src[s]
            f = jnp.asarray(densities[s]).reshape(-1, ker.kdim0)
            if (total < DIRECT_CUTOFF or ker.name not in _TREE_L2T):
                us = direct_eval_blocked(
                    ker, jnp.asarray(xt), jnp.asarray(g.coord), f,
                    ns=None if g.normal is None
                    else jnp.asarray(g.normal),
                    block_t=1024, block_s=1024)
            else:
                kifmm = self._get_kifmm(ker, xt, g, s, trg_name)
                us = kifmm.eval_jnp(f)
            u = us if u is None else u + us
        return u

    def eval_direct(self, trg_name: str) -> np.ndarray:
        """O(N^2) direct evaluation (reference: EvalDirect,
        fmm-wrapper.txx:490) — the correctness oracle."""
        xt = self.trg[trg_name].coord
        u = None
        for (s, t), ker in self.s2t_kernels.items():
            if t != trg_name:
                continue
            us = self._direct_pair(ker, xt, self.src[s])
            u = us if u is None else u + us
        return u

    def _direct_pair(self, ker, xt, g) -> np.ndarray:
        u = direct_eval_blocked(
            ker, jnp.asarray(xt), jnp.asarray(g.coord),
            jnp.asarray(g.density),
            ns=None if g.normal is None else jnp.asarray(g.normal),
            block_t=1024, block_s=1024)
        return np.asarray(u)

    def _get_kifmm(self, ker, xt, g, s_name, t_name) -> KIFMM:
        key = (ker.name, s_name, t_name)
        if key not in self._kifmm_cache:
            p = max(4, min(10, self.accuracy))
            kifmm = KIFMM(ker, p=p, ker_l2t=_TREE_L2T[ker.name])
            kifmm.setup(g.coord, xt, n_src=g.normal)
            self._kifmm_cache[key] = kifmm
        return self._kifmm_cache[key]

    def _tree_pair(self, ker, xt, g, s_name, t_name) -> np.ndarray:
        return self._get_kifmm(ker, xt, g, s_name, t_name).eval(
            g.density)

    # -- distributed direct: ppermute ring -------------------------------
    def eval_direct_ring(self, kernel: KernelSpec, xt, xs, f, ns=None,
                         mesh=None):
        """Ring-pass distributed direct sum: each of p rounds shifts the
        source shard to the next rank and accumulates local interactions
        (reference: EvalDirect ring, fmm-wrapper.txx:537-558; the
        ppermute pipeline of SURVEY.md §5.7(a)).

        xt/xs/f/ns: arrays sharded over the comm's mesh axis (leading
        dim).  Returns the sharded potential.
        """
        comm = self.comm
        if comm.axis is None:
            u = direct_eval_blocked(kernel, xt, xs,
                                    f.reshape(xs.shape[0], kernel.kdim0),
                                    ns=ns)
            return u
        p = comm.size()
        spec3 = P("x", None)

        def ring(xt_l, xs_l, f_l, ns_l):
            def body(i, carry):
                u, xs_c, f_c, ns_c = carry
                u = u + kernel.apply_pairwise(xt_l, xs_c, ns_c, f_c)
                xs_c = comm.send_recv_shift(xs_c, 1)
                f_c = comm.send_recv_shift(f_c, 1)
                ns_c = comm.send_recv_shift(ns_c, 1)
                return (u, xs_c, f_c, ns_c)

            u0 = jnp.zeros((xt_l.shape[0], kernel.kdim1),
                           dtype=f_l.dtype)
            carry = (u0, xs_l, f_l, ns_l)
            for _ in range(p):
                carry = body(0, carry)
            return carry[0] * kernel.scale_factor

        f = f.reshape(xs.shape[0], kernel.kdim0)
        ns_arr = ns if ns is not None else jnp.zeros_like(xs)
        fn = comm.run(ring,
                      in_specs=(spec3, spec3, spec3, spec3),
                      out_specs=spec3)
        return fn(xt, xs, f, ns_arr)
