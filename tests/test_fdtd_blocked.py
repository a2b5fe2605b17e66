"""Golden-oracle chain, FDTD leg 3: blocked panel kernel vs NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from fdtd2d_tpu import constants
from fdtd2d_tpu.fdtd.reference import numpy_simulate
from fdtd2d_tpu.fdtd.step import precompute_coefficients
from fdtd2d_tpu.ops.pallas_fdtd_blocked import fdtd_multistep_blocked

DT, DX = 5e-14, 1e-4


def test_blocked_kernel_matches_oracle():
    rows, cols = 64, 128   # 4 panels of 16 rows
    eps = np.full((rows, cols), constants.EPSILON_0)
    eps[20:40, 50:70] *= 3.0
    mu = np.full((rows, cols), constants.MU_0)
    nsteps, fc = 25, 30e9

    ce, ch, coef = precompute_coefficients(eps, mu, DT, DX, jnp.float32)
    Ez = jnp.zeros((rows, cols), jnp.float32)
    Hx = jnp.zeros((rows, cols - 1), jnp.float32)
    Hy = jnp.zeros((rows - 1, cols), jnp.float32)
    Ez, Hx, Hy = fdtd_multistep_blocked(
        Ez, Hx, Hy, ce, ch, coef, DT, fc, rows // 2, cols // 2,
        nsteps, "ricker", 0, PH=16, interpret=True)

    ref = numpy_simulate(eps, mu, DT, DX, nsteps, (rows // 2, cols // 2), fc)
    err = np.max(np.abs(np.asarray(Ez, np.float64) - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, f"relative field error {err:.3e}"
    assert Hx.shape == (rows, cols - 1) and Hy.shape == (rows - 1, cols)
