"""ex23: 1D tridiagonal KSP smoke test (the reference's ex23mod.c).

Solves the [-1 2 -1] tridiagonal system with exact solution of all ones,
through the full options-driven KSP/PC stack -- including the custom
ildl/ilupack preconditioners, which is the reason the reference carries
this modified tutorial (ex23mod.c:69-74). Prints the PETSc-format result
line "Norm of error <e>, Iterations <n>"."""

import numpy as np
import jax.numpy as jnp

from exsaddle_tpu import solver_config as sc
from exsaddle_tpu.krylov import KSPConfig
from exsaddle_tpu.options import Options


def solve_ex23(opts, log=print):
    import scipy.sparse as sp
    n = opts.get_int("n", 10)
    A = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
    u = np.ones(n)
    b = A @ u

    amat = sc.MatShell(n, lambda v: jnp.asarray(A @ np.asarray(v)),
                       diagonal=lambda: A.diagonal(), csr=lambda: A,
                       dense=lambda: A.toarray())
    # ex23 sets rtol 1e-7 programmatically (ex23mod.c:175)
    ksp = sc.make_ksp(opts, "", amat,
                      ksp_defaults=KSPConfig(type="gmres", rtol=1e-7),
                      pc_default="jacobi", log=log)
    res = ksp.solve(jnp.asarray(b))
    err = float(np.linalg.norm(np.asarray(res.x) - u))
    tol = 1000.0 * np.finfo(float).eps
    if err > tol:                      # ex23mod.c:241-243: silent when tiny
        log(f"Norm of error {err:g}, Iterations {res.its}")
    return res, err


def main(argv=None):
    import sys
    import jax
    jax.config.update("jax_enable_x64", True)
    args = sys.argv[1:] if argv is None else argv
    return solve_ex23(Options.from_args(args))


if __name__ == "__main__":
    main()
