"""Right-preconditioned restarted GMRES, jit/vmap/shard-friendly.

Written in-house because ``jax.scipy.sparse.linalg.gmres`` mishandles the
preconditioned complex-symmetric Helmholtz system (returns x=0), and because
the sharded solver (fdtd2d_tpu/parallel/) needs full control over where the
global reductions (dot products) happen.

Right preconditioning solves A M^{-1} u = b, x = M^{-1} u, so the convergence
test is on the TRUE residual ||b - A x||, independent of the preconditioner's
scaling. Arnoldi uses modified Gram-Schmidt; the small least-squares problem
is solved densely per cycle (restart <= ~64, negligible cost next to the
stencil applies).

Works on any pytree-shaped field x (here: (Nx, Ny) complex arrays).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GmresResult(NamedTuple):
    x: jax.Array
    relative_residual: jax.Array
    iterations: jax.Array


def _identity(r):
    return r


def fgmres(matvec: Callable, b: jax.Array, minv: Optional[Callable] = None,
           *, x0: Optional[jax.Array] = None, restart: int = 40,
           maxiter: int = 2000, tol: float = 1e-6) -> GmresResult:
    """Solve A x = b with restarted right-preconditioned GMRES(restart)."""
    if minv is None:
        minv = _identity
    dtype = b.dtype
    m = restart
    bnorm = jnp.linalg.norm(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    max_cycles = -(-maxiter // m)

    def cycle(state):
        x, _, it = state
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        # Arnoldi on A M^{-1} with modified Gram-Schmidt.
        V = jnp.zeros((m + 1,) + b.shape, dtype)
        Z = jnp.zeros((m,) + b.shape, dtype)       # preconditioned basis M^{-1} v_j
        H = jnp.zeros((m + 1, m), dtype)
        V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))

        def arnoldi(j, carry):
            V, Z, H = carry
            z = minv(V[j])
            w = matvec(z)

            def mgs(i, carry):
                w, H = carry
                hij = jnp.vdot(V[i], w)
                return w - hij * V[i], H.at[i, j].set(hij)

            w, H = jax.lax.fori_loop(0, j + 1, mgs, (w, H))
            hn = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hn.astype(dtype))
            V = V.at[j + 1].set(w / jnp.where(hn == 0, 1.0, hn))
            Z = Z.at[j].set(z)
            return V, Z, H

        V, Z, H = jax.lax.fori_loop(0, m, arnoldi, (V, Z, H))

        # Solve min ||beta e1 - H y|| (small dense LS).
        e1 = jnp.zeros((m + 1,), dtype).at[0].set(beta.astype(dtype))
        y, *_ = jnp.linalg.lstsq(H, e1)
        x = x + jnp.tensordot(y, Z, axes=1)
        res = jnp.linalg.norm(b - matvec(x)) / bnorm
        return x, res, it + m

    def cond(state):
        _, res, it = state
        return jnp.logical_and(res > tol, it < max_cycles * m)

    r0 = jnp.linalg.norm(b - matvec(x)) / jnp.where(bnorm == 0, 1.0, bnorm)
    x, res, it = jax.lax.while_loop(cond, cycle, (x, r0, jnp.asarray(0)))
    return GmresResult(x=x, relative_residual=res, iterations=it)
