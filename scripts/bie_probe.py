"""Dev tool: instrumented run of the bench.py BIE leg (timestamps)."""
import os, sys, time
t0 = time.time()
def mark(s): print(f"[{time.time()-t0:8.1f}s] {s}", flush=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sctl_tpu.config import enable_compile_cache, config
enable_compile_cache()
from sctl_tpu.bie import BoundaryIntegralOp, torus_patches
from sctl_tpu.ops import Stokes3D_DxU, Stokes3D_FxU, direct_eval_blocked
from sctl_tpu.linalg import gmres, gmres_device
mark("imports")
nu, nv, q = 48, 20, 6
lst = torus_patches(nu=nu, nv=nv, q=q, R=2.0, r=0.5)
op = BoundaryIntegralOp(Stokes3D_DxU)
op.set_accuracy(1e-6)
op.add_elem_list(lst)
op.near_cache = os.path.join(config.data_path,
                             f"bie_near_torus{nu}x{nv}q{q}_stokes_v1.npz")
mark("patches built")
op.setup()
mark("op.setup done")
assert op._far_fmm is not None
X, _, _ = lst.get_node_coord()
src = np.array([[6.0, 0.0, 0.0]]); qs = np.array([[1.0, -0.5, 0.8]])
bc = np.asarray(direct_eval_blocked(Stokes3D_FxU, jnp.asarray(X),
                                    jnp.asarray(src), jnp.asarray(qs))).reshape(-1)
mark("bc built")
params = op.apply_params()
mark("apply_params")
@jax.jit
def solve(b, params):
    def A(sig):
        return op.compute_potential_jnp(sig, params).reshape(-1) - 0.5*sig
    return gmres_device(A, b, tol=1e-6, max_iter=120)
x, it, err = solve(jnp.asarray(bc), params)
float(jnp.sum(x))
mark("solve compile+first")
t1 = time.perf_counter()
x2, it2, err2 = solve(jnp.asarray(bc)*(1+1e-6), params)
float(jnp.sum(x2)) + float(err2)
mark(f"solve warm: {time.perf_counter()-t1:.3f}s it={int(it2)}")
apply_jit = jax.jit(lambda s, p: op.compute_potential_jnp(s, p).reshape(-1) - 0.5*s)
t1 = time.perf_counter()
x_h, it_h = gmres(lambda s: apply_jit(s, params), jnp.asarray(bc)*(1+5e-7),
                  tol=1e-6, max_iter=120)
float(jnp.sum(x_h))
mark(f"host-loop gmres: {time.perf_counter()-t1:.3f}s it={int(it_h)}")
