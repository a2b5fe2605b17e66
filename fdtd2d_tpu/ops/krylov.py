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

from fdtd2d_tpu.ops.cplx import cdot, cnorm


class GmresResult(NamedTuple):
    x: jax.Array
    relative_residual: jax.Array
    iterations: jax.Array


def _identity(r):
    return r


def _ls_solve(H, rhs):
    """min ||rhs - H y|| for small complex H via normal equations on the
    real-block embedding (complex factorizations and even complex matmuls
    are unimplemented on this TPU; H comes from Arnoldi so its condition
    number is modest)."""
    m = H.shape[1]
    Hr, Hi = jnp.real(H), jnp.imag(H)
    He = jnp.block([[Hr, -Hi], [Hi, Hr]])                    # (2(m+1), 2m)
    ge = jnp.concatenate([jnp.real(rhs), jnp.imag(rhs)])
    G = He.T @ He
    g = He.T @ ge
    # Tikhonov guard for breakdown columns (H column exactly zero)
    G = G + jnp.eye(2 * m, dtype=G.dtype) * jnp.asarray(
        jnp.finfo(G.dtype).eps, G.dtype) * jnp.max(jnp.abs(G))
    y = jnp.linalg.solve(G, g)
    return y[:m] + 1j * y[m:]


def fgmres(matvec: Callable, b: jax.Array, minv: Optional[Callable] = None,
           *, x0: Optional[jax.Array] = None, restart: int = 40,
           maxiter: int = 2000, tol: float = 1e-6) -> GmresResult:
    """Solve A x = b with restarted right-preconditioned GMRES(restart)."""
    if minv is None:
        minv = _identity
    dtype = b.dtype
    m = restart
    bnorm = cnorm(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    max_cycles = -(-maxiter // m)

    def cycle(state):
        x, _, it = state
        r = b - matvec(x)
        beta = cnorm(r)
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
                hij = cdot(V[i], w)
                return w - hij * V[i], H.at[i, j].set(hij.astype(dtype))

            w, H = jax.lax.fori_loop(0, j + 1, mgs, (w, H))
            hn = cnorm(w)
            H = H.at[j + 1, j].set(hn.astype(dtype))
            V = V.at[j + 1].set(w / jnp.where(hn == 0, 1.0, hn))
            Z = Z.at[j].set(z)
            return V, Z, H

        V, Z, H = jax.lax.fori_loop(0, m, arnoldi, (V, Z, H))

        # Solve min ||beta e1 - H y|| (small dense LS).
        e1 = jnp.zeros((m + 1,), dtype).at[0].set(beta.astype(dtype))
        y = _ls_solve(H, e1).astype(dtype)
        upd_shape = (slice(None),) + (None,) * (Z.ndim - 1)
        x = x + jnp.sum(y[upd_shape] * Z, axis=0)
        res = cnorm(b - matvec(x)) / bnorm
        return x, res, it + m

    def cond(state):
        _, res, it = state
        return jnp.logical_and(res > tol, it < max_cycles * m)

    r0 = cnorm(b - matvec(x)) / jnp.where(bnorm == 0, 1.0, bnorm)
    x, res, it = jax.lax.while_loop(cond, cycle, (x, r0, jnp.asarray(0)))
    return GmresResult(x=x, relative_residual=res, iterations=it)
