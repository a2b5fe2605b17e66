"""Golden-oracle chain, FDTD leg 2: Pallas kernel vs NumPy oracle.

Runs the fused multi-step kernel in interpreter mode on CPU (the real-TPU
run of the same kernel is exercised by bench.py); grids are kept tiny
because interpret mode is slow.
"""

import numpy as np
import jax.numpy as jnp

from fdtd2d_tpu import constants
from fdtd2d_tpu.fdtd.reference import numpy_simulate
from fdtd2d_tpu.fdtd.step import precompute_coefficients
from fdtd2d_tpu.ops.pallas_fdtd import fdtd_multistep_pallas

DT, DX = 5e-14, 1e-4


def test_pallas_multistep_matches_oracle():
    rows, cols = 48, 64
    eps = np.full((rows, cols), constants.EPSILON_0)
    eps[20:30, 40:50] *= 3.0
    mu = np.full((rows, cols), constants.MU_0)
    nsteps, fc = 30, 30e9

    ce, ch, coef = precompute_coefficients(eps, mu, DT, DX, jnp.float32)
    Ez = jnp.zeros((rows, cols), jnp.float32)
    Hx = jnp.zeros((rows, cols - 1), jnp.float32)
    Hy = jnp.zeros((rows - 1, cols), jnp.float32)
    Ez, Hx, Hy = fdtd_multistep_pallas(
        Ez, Hx, Hy, ce, ch, coef, DT, fc, rows // 2, cols // 2,
        nsteps, "ricker", 0, interpret=True,
    )
    ref = numpy_simulate(eps, mu, DT, DX, nsteps, (rows // 2, cols // 2), fc)
    err = np.max(np.abs(np.asarray(Ez, np.float64) - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, f"relative field error {err:.3e}"
    # staggered shapes preserved
    assert Hx.shape == (rows, cols - 1) and Hy.shape == (rows - 1, cols)


def test_pallas_chunked_offsets_match_single_run():
    """Two chunks with a step offset == one contiguous run (source timing)."""
    rows = cols = 32
    eps = np.full((rows, cols), constants.EPSILON_0)
    mu = np.full((rows, cols), constants.MU_0)
    ce, ch, coef = precompute_coefficients(eps, mu, DT, DX, jnp.float32)

    def zeros():
        return (jnp.zeros((rows, cols), jnp.float32),
                jnp.zeros((rows, cols - 1), jnp.float32),
                jnp.zeros((rows - 1, cols), jnp.float32))

    a = fdtd_multistep_pallas(*zeros(), ce, ch, coef, DT, 30e9, 16, 16,
                              20, "ricker", 0, interpret=True)
    b = zeros()
    b = fdtd_multistep_pallas(*b, ce, ch, coef, DT, 30e9, 16, 16,
                              10, "ricker", 0, interpret=True)
    b = fdtd_multistep_pallas(*b, ce, ch, coef, DT, 30e9, 16, 16,
                              10, "ricker", 10, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)
