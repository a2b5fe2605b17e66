"""On-device surrogate training data generation (vmapped, no host loop).

Reference semantics (python-src/diffusion_training.py:36-193): per sample a
random binary permittivity field (Gaussian-blurred uniform noise thresholded
at 0.5 -> eps0 or 5*eps0, kernel 15, sigma ~ U[2,6]), a random line-or-point
source in the middle 80% of the grid, omega ~ U[18,30] GHz, and the label is
the real part of the FDFD solve with b = -1j*omega*src. The reference loops
one scipy ``spsolve`` per sample on the host; here the whole batch is one
``vmap`` of the matrix-free preconditioned Krylov solve on device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fdtd2d_tpu import constants
from fdtd2d_tpu.ops.helmholtz import HelmholtzOperator, pml_sigma_profile
from fdtd2d_tpu.ops.fdm import fdm_preconditioner
from fdtd2d_tpu.ops.krylov import fgmres

KERNEL_SIZE = 15
EPS_LO = constants.EPSILON_0_DATAGEN
EPS_HI = 5.0 * constants.EPSILON_0_DATAGEN
MU_REF = constants.MU_0_DATAGEN


def random_permittivity(key, shape: Tuple[int, int]):
    """Blur-threshold binary permittivity (reference :54-93)."""
    k_noise, k_sigma = jax.random.split(key)
    noise = jax.random.uniform(k_noise, shape)
    sigma = jax.random.uniform(k_sigma, ()) * 4.0 + 2.0
    coords = jnp.arange(KERNEL_SIZE) - KERNEL_SIZE // 2
    xg, yg = jnp.meshgrid(coords, coords, indexing="ij")
    kern = jnp.exp(-(xg**2 + yg**2) / (2.0 * sigma**2))
    kern = kern / jnp.sum(kern)
    blurred = jax.scipy.signal.convolve2d(noise, kern, mode="same")
    eps = jnp.where(blurred > 0.5, EPS_HI, EPS_LO)
    mu = jnp.full(shape, MU_REF)
    return eps, mu


def random_source(key, shape: Tuple[int, int]):
    """Random line (<=10% span) or point source in the middle 80%
    (reference :96-146)."""
    H, W = shape
    sx0, sx1 = max(5, H // 10), min(H - 5, H - H // 10)
    sy0, sy1 = max(5, W // 10), min(W - 5, W - W // 10)
    L = max((min(sx1 - sx0, sy1 - sy0)) // 10, 1)

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    is_line = jax.random.uniform(k1, ()) < 0.5
    is_horiz = jax.random.uniform(k2, ()) < 0.5
    r = jax.random.randint(k3, (), sx0, sx1)
    c = jax.random.randint(k4, (), sy0, sy1)
    # line starts are drawn independently and uniformly over the valid range
    # (reference :109-146 draws them separately from the fixed coordinate;
    # clipping the point coordinate instead would pile probability mass at
    # the interval ends and skew the training distribution)
    c_start = jax.random.randint(k5, (), sy0, max(sy1 - L, sy0 + 1))
    r_start = jax.random.randint(k6, (), sx0, max(sx1 - L, sx0 + 1))

    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    horiz_line = (rows == r) & (cols >= c_start) & (cols < c_start + L)
    vert_line = (cols == c) & (rows >= r_start) & (rows < r_start + L)
    point = (rows == r) & (cols == c)
    mask = jnp.where(is_line, jnp.where(is_horiz, horiz_line, vert_line), point)
    return mask.astype(jnp.float32)


def random_omega(key):
    """omega ~ U[18, 30] GHz (reference :177; its comment says 9-30 but the
    code draws 18e9..30e9)."""
    return jax.random.uniform(key, ()) * (30e9 - 18e9) + 18e9


def make_operator_traced(eps, mu, dx, dy, omega, pml_thickness: int,
                         sigma_max: float = 2.0, m: int = 3,
                         dtype=jnp.complex64) -> HelmholtzOperator:
    """Operator with a *traced* omega (vmappable over frequency batches).

    Same semantics as fdtd2d_tpu.ops.helmholtz.make_operator, but the PML
    stretch factors are computed in jnp from the (static) sigma profiles.
    """
    Nx, Ny = eps.shape
    sig_r = jnp.asarray(pml_sigma_profile(Nx, pml_thickness, sigma_max, m))
    sig_c = jnp.asarray(pml_sigma_profile(Ny, pml_thickness, sigma_max, m))
    s_r = 1.0 + 1j * sig_r / (omega * constants.EPSILON_0)
    s_c = 1.0 + 1j * sig_c / (omega * constants.EPSILON_0)
    real = jnp.finfo(dtype).dtype
    return HelmholtzOperator(
        eps=jnp.asarray(eps, real), inv_mu=(1.0 / jnp.asarray(mu)).astype(real),
        inv_s_row=(1.0 / s_r).astype(dtype), inv_s_col=(1.0 / s_c).astype(dtype),
        omega=jnp.asarray(omega, real),
        inv_2dx=jnp.asarray(1.0 / (2.0 * dx), real),
        inv_2dy=jnp.asarray(1.0 / (2.0 * dy), real),
        pml_thickness=pml_thickness, sigma_max=sigma_max, m=m,
    )


@partial(jax.jit, static_argnames=("shape", "batch", "pml_thickness", "maxiter", "dx"))
def generate_batch(key, *, batch: int, shape: Tuple[int, int], dx: float = 1e-3,
                   pml_thickness: int = 40, maxiter: int = 400, M=None):
    """One batch of (eps, mu, src, omega, Ez) training samples, all on device.

    ``M``: optional shared FDM preconditioner (built at a representative
    mid-band omega — per-sample omegas differ, so it is approximate, which
    only costs Krylov iterations, not correctness).

    Note on label accuracy: the reference's datagen scenes (5x binary
    contrast at 18-30 GHz on dx=1mm) are under-resolved — ~4.5 cells per
    wavelength at the top of the band, violating the lambda/10 rule the
    reference itself enforces elsewhere (fdfd.py:97-105). Krylov residuals
    of ~1e-2 on such scenes sit far below their discretization error; the
    per-sample residuals are returned so callers can filter if desired.
    """
    keys = jax.random.split(key, batch)

    def one(k):
        k_eps, k_src, k_om = jax.random.split(k, 3)
        eps, mu = random_permittivity(k_eps, shape)
        src = random_source(k_src, shape)
        omega = random_omega(k_om)
        op = make_operator_traced(eps, mu, dx, dx, omega, pml_thickness)
        b = (jnp.asarray(-1j, jnp.complex64) * omega.astype(jnp.complex64)
             * src.astype(jnp.complex64))
        out = fgmres(op.apply, b, M, restart=40, maxiter=maxiter, tol=1e-4)
        Ez = jnp.real(out.x).astype(jnp.float32)
        return eps.astype(jnp.float32), mu.astype(jnp.float32), src, \
            omega.astype(jnp.float32), Ez, out.relative_residual

    eps, mu, src, omega, Ez, res = jax.vmap(one)(keys)
    return dict(eps=eps, mu=mu, src=src, omega=omega, Ez=Ez, residuals=res)


def default_preconditioner(shape: Tuple[int, int], dx: float = 1e-3,
                           pml_thickness: int = 40, omega_ref: float = 24e9):
    """Shared mid-band FDM preconditioner for datagen batches."""
    return fdm_preconditioner(shape[0], shape[1], dx, dx, omega_ref,
                              pml_thickness, eps_ref=2.0 * EPS_LO, mu_ref=MU_REF)


def generate_dataset(key, num_samples: int, shape: Tuple[int, int],
                     batch: int = 64, to_host: bool | None = None, **kwargs):
    """Generate ``num_samples`` in device-sized batches; returns stacked dict.

    ``to_host``: accumulate batches as numpy on the HOST (the path for
    datasets past HBM — 10k scenes at 250^2 are ~12.5 GB). Defaults to
    automatic: host accumulation above ~2 GB. The result feeds
    ``train(..., stream_chunk=...)`` without ever materializing on device.
    """
    M = kwargs.pop("M", None)
    if M is None:
        M = default_preconditioner(shape, kwargs.get("dx", 1e-3),
                                   kwargs.get("pml_thickness", 40))
    if to_host is None:
        to_host = num_samples * shape[0] * shape[1] * 5 * 4 > 2 * 1024**3
    outs = []
    n = 0
    while n < num_samples:
        key, k = jax.random.split(key)
        b = min(batch, num_samples - n)
        out = generate_batch(k, batch=b, shape=shape, M=M, **kwargs)
        if to_host:
            out = jax.tree.map(np.asarray, out)
        outs.append(out)
        n += b
    cat = np.concatenate if to_host else jnp.concatenate
    return jax.tree.map(lambda *xs: cat(xs), *outs)
