"""Pallas P2P kernel vs XLA direct oracle (interpret mode on CPU;
reference anchor: vec-test-style fast-vs-reference consistency +
ParticleFMM::test Eval-vs-EvalDirect, fmm-wrapper.txx:81)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu.ops import KERNELS, direct_eval
from sctl_tpu.ops.pallas_p2p import p2p

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("name", list(KERNELS))
def test_pallas_matches_direct(name):
    ker = KERNELS[name]
    nt, ns = 200, 300   # exercises padding (not tile-aligned)
    xt = jnp.asarray(RNG.normal(size=(nt, 3)))
    xs = jnp.asarray(RNG.normal(size=(ns, 3)) + 4.0)
    nrm = RNG.normal(size=(ns, 3))
    nrm = jnp.asarray(nrm / np.linalg.norm(nrm, axis=1, keepdims=True))
    f = jnp.asarray(RNG.normal(size=(ns, ker.kdim0)))
    u_ref = np.asarray(direct_eval(ker, xt, xs, f, ns=nrm))
    u_pl = np.asarray(p2p(ker, xt, xs, f, ns=nrm, block_t=128,
                          block_s=128, interpret=True))
    scale = np.abs(u_ref).max() + 1e-30
    np.testing.assert_allclose(u_pl / scale, u_ref / scale, atol=2e-5)


def test_p2p_ulist_all_kernels_vs_direct():
    """Per-box U-list kernel (lane-oriented tiles) against the dense
    direct sum, every kernel in the library (interpret mode)."""
    import jax.numpy as jnp
    from sctl_tpu.ops.pallas_p2p import p2p_ulist
    from sctl_tpu.ops.kernels import KERNELS
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(4)
    G, T, S = 2, 8, 128
    xt = rng.random((G, T, 3))
    xs = rng.random((G, S, 3))
    ns = rng.normal(size=(G, S, 3))
    ns /= np.linalg.norm(ns, axis=-1, keepdims=True)
    for name, ker in KERNELS.items():
        f = rng.normal(size=(G, S, ker.kdim0))
        # zero some tail densities (padding behavior)
        f[:, S - 5:] = 0.0
        u = np.asarray(p2p_ulist(
            ker,
            jnp.asarray(xt.transpose(0, 2, 1), jnp.float32),
            jnp.asarray(xs.transpose(0, 2, 1), jnp.float32),
            jnp.asarray(ns.transpose(0, 2, 1), jnp.float32),
            jnp.asarray(f.transpose(0, 2, 1), jnp.float32),
            interpret=True))
        for g in range(G):
            M = full_matrix_np(ker, xt[g], xs[g], ns[g])  # (S*k0, T*k1)
            u_ref = (M.T @ f[g].ravel()).reshape(T, ker.kdim1) \
                / ker.scale_factor
            scale = np.abs(u_ref).max()
            assert np.abs(u[g] - u_ref).max() < 2e-4 * scale, name


def test_p2p_stencil9_vs_direct():
    """Packed-slab stencil kernel (p2p_stencil9: all 9 neighbor
    columns pre-packed per 128-aligned slab group) against a per-box
    27-neighbor direct sum (interpret mode), including boundary boxes
    (zeros baked into the slab) and 8-granule caps."""
    from sctl_tpu.fmm.kifmm import KIFMM
    from sctl_tpu.ops.pallas_p2p import p2p_stencil9
    from sctl_tpu.ops import direct_eval

    rng = np.random.default_rng(13)
    n, cap_t, cap, npb = 4, 8, 16, 5
    ker = KERNELS["Stokes3D-FxU"]
    k0 = ker.kdim0
    SL = -(-9 * cap // 128) * 128
    w = 1.0 / n
    xs_box = np.zeros((n, n, n, cap, 3), np.float32)
    f_box = np.zeros((n, n, n, cap, k0), np.float32)
    xt_box = np.zeros((n, n, n, cap_t, 3), np.float32)
    for x in range(n):
        for y in range(n):
            for z in range(n):
                lo = np.array([x, y, z]) * w
                xs_box[x, y, z, :npb] = lo + w * rng.random((npb, 3))
                f_box[x, y, z, :npb] = rng.normal(size=(npb, k0))
                xt_box[x, y, z] = lo + w * rng.random((cap_t, 3))
    inv = np.arange(n ** 3)               # already raster-ordered
    xs_s = KIFMM._to_slab(xs_box.reshape(n ** 3, cap, 3), inv, n)
    f_s = KIFMM._to_slab(f_box.reshape(n ** 3, cap, k0), inv, n)
    u = np.asarray(p2p_stencil9(
        ker, n, SL, cap_t,
        jnp.asarray(xt_box.transpose(0, 1, 2, 4, 3)),
        jnp.asarray(xs_s), jnp.asarray(np.zeros_like(xs_s)),
        jnp.asarray(f_s), interpret=True))
    for x, y, z in [(0, 0, 0), (1, 2, 3), (3, 3, 3), (2, 1, 0)]:
        nb_xs, nb_f = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    bx, by, bz = x + dx, y + dy, z + dz
                    if not all(0 <= v < n for v in (bx, by, bz)):
                        continue
                    nb_xs.append(xs_box[bx, by, bz, :npb])
                    nb_f.append(f_box[bx, by, bz, :npb])
        u_ref = np.asarray(direct_eval(
            ker, jnp.asarray(xt_box[x, y, z]),
            jnp.asarray(np.concatenate(nb_xs)),
            jnp.asarray(np.concatenate(nb_f)))) / ker.scale_factor
        scale = np.abs(u_ref).max()
        assert np.abs(u[x, y, z] - u_ref).max() < 2e-4 * scale


def test_kifmm_stencil9_end_to_end():
    """Full KIFMM eval with the packed-slab stencil P2P engaged
    (interpret mode on CPU) matches the dense direct sum."""
    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops.kernels_np import full_matrix_np
    from sctl_tpu.ops.kernels import Laplace3D_FxU

    rng = np.random.default_rng(31)
    n = 1500
    x = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    u_d = (full_matrix_np(Laplace3D_FxU, x, x).T
           @ f.ravel()).reshape(n, 1)
    kf = KIFMM(Laplace3D_FxU, p=6, depth=3, dtype=jnp.float32,
               use_pallas_p2p=True, use_pallas_m2l=False,
               use_pallas_sl=False).setup(x, x)
    assert kf._p2p_packed9 and "xs_slab" in kf._data
    u = np.asarray(kf.eval(f))
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 5e-4, rel


@pytest.mark.parametrize("cap_s", [64, 128])
def test_p2p_stencil_vs_direct(cap_s):
    """Halo-stencil kernel against a per-box 27-neighbor direct sum,
    both the lane-aligned (cap_s=128) and the packed parity-window
    (cap_s=64, odd 64-multiple) paths (interpret mode)."""
    from sctl_tpu.ops.pallas_p2p import p2p_stencil
    from sctl_tpu.ops import direct_eval

    rng = np.random.default_rng(11)
    n, cap_t, npb = 4, 8, 5          # grid side, targets/box, srcs/box
    ker = KERNELS["Stokes3D-FxU"]
    k0, k1 = ker.kdim0, ker.kdim1
    w = 1.0 / n
    xs_box = np.zeros((n, n, n, cap_s, 3), np.float32)
    f_box = np.zeros((n, n, n, cap_s, k0), np.float32)
    xt_box = np.zeros((n, n, n, cap_t, 3), np.float32)
    for x in range(n):
        for y in range(n):
            for z in range(n):
                lo = np.array([x, y, z]) * w
                xs_box[x, y, z, :npb] = lo + w * rng.random((npb, 3))
                f_box[x, y, z, :npb] = rng.normal(size=(npb, k0))
                xt_box[x, y, z] = lo + w * rng.random((cap_t, 3))
    # halo layout: (n, n, 3, (n+2)*cap_s) columns, z-major + margins
    xs_g = np.pad(
        xs_box.transpose(0, 1, 4, 2, 3).reshape(n, n, 3, n * cap_s),
        ((0, 0), (0, 0), (0, 0), (cap_s, cap_s)))
    f_g = np.pad(
        f_box.transpose(0, 1, 4, 2, 3).reshape(n, n, k0, n * cap_s),
        ((0, 0), (0, 0), (0, 0), (cap_s, cap_s)))
    u = np.asarray(p2p_stencil(
        ker, n, cap_s, cap_t,
        jnp.asarray(xt_box.transpose(0, 1, 2, 4, 3)),
        jnp.asarray(xs_g), jnp.asarray(np.zeros_like(xs_g)),
        jnp.asarray(f_g), interpret=True))
    for x, y, z in [(0, 0, 0), (1, 2, 3), (3, 3, 3), (2, 1, 0)]:
        nb_xs, nb_f = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    bx, by, bz = x + dx, y + dy, z + dz
                    if not all(0 <= v < n for v in (bx, by, bz)):
                        continue
                    nb_xs.append(xs_box[bx, by, bz, :npb])
                    nb_f.append(f_box[bx, by, bz, :npb])
        u_ref = np.asarray(direct_eval(
            ker, jnp.asarray(xt_box[x, y, z]),
            jnp.asarray(np.concatenate(nb_xs)),
            jnp.asarray(np.concatenate(nb_f)))) / ker.scale_factor
        scale = np.abs(u_ref).max()
        assert np.abs(u[x, y, z] - u_ref).max() < 2e-4 * scale
