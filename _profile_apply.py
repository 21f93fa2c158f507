import os, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import __graft_entry__ as g
from exsaddle_tpu import matfree

mx = int(os.environ.get("MX", 32))
mesh, op, F, diag = g._build_flagship_parity(mx=mx, dtype=jnp.float32)
aux = matfree.tree_aux(op)
x0 = matfree.to_tree(op, jnp.asarray(np.random.default_rng(0).standard_normal(op.ndof), jnp.float32))

@jax.jit
def run_full(op, aux, t):
    return lax.fori_loop(0, 50, lambda i, t: matfree.mult_tree(op, aux, t), t)

# gather+scatter only (no GEMMs): gather xe, scatter xe's first 81 cols back
@jax.jit
def run_gs(op, aux, t):
    def one(t):
        subs, pg = t
        xe = op._gather_u(subs)
        pe = matfree._gather_q1(pg, op.m_el)
        outs = op._scatter_u(xe)
        yp = matfree._scatter_q1(pe, op.m_el, op.nn_p)
        return (outs, yp)
    return lax.fori_loop(0, 50, lambda i, t: one(t), t)

nel = int(np.prod(op.m_el))
xe0 = jnp.asarray(np.random.standard_normal((nel, op.Bs.shape[1])), jnp.float32)
pe0 = jnp.asarray(np.random.standard_normal((nel, op.Np.shape[1])), jnp.float32)

@jax.jit
def run_core(op, xe, pe):
    def one(c):
        xe, pe = c
        strain = (xe @ op.Bs.T).reshape(nel, op.nqp, op.ncomp)
        yue = (strain * op.scale_visc).reshape(nel, -1) @ op.Bs
        ptmp = pe @ op.Np.T
        yue = yue - (ptmp * op.fac[None, :]) @ op.Dm
        div = xe @ op.Dm.T
        ype = -(div * op.fac[None, :]) @ op.Np
        # feed outputs back to keep loop honest
        return (yue, ype)
    return lax.fori_loop(0, 50, lambda i, c: one(c), (xe, pe))

def timeit(name, f, *a):
    r = f(*a); jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = f(*a); jax.block_until_ready(r)
        ts.append((time.perf_counter()-t0)/50)
    print(f"{name}: {min(ts)*1e6:.1f} us/apply")

timeit("full mult_tree", run_full, op, aux, x0)
timeit("gather+scatter only", run_gs, op, aux, x0)
timeit("GEMM core only", run_core, op, xe0, pe0)
print("nel", nel, "platform", jax.devices()[0].device_kind)
