"""Multi-device parity on the 8-device virtual CPU mesh.

The golden-oracle chain's distributed leg: sharded runs must reproduce the
single-device results exactly (same program, partitioned by GSPMD) or to
roundoff (explicit shard_map halos).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P, NamedSharding

from fdtd2d_tpu import constants
from fdtd2d_tpu.parallel import (
    make_mesh, shard_operator, solve_fdfd_sharded, simulate_sharded,
    sharded_matvec_shardmap,
)
from fdtd2d_tpu.ops.helmholtz import make_operator
from fdtd2d_tpu.fdfd.solver import solve_fdfd
from fdtd2d_tpu.fdtd.simulate import simulate, FDTDConfig


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8
    m2 = make_mesh((4, 2))
    assert m2.devices.shape == (4, 2)


def _scene(N):
    rng = np.random.default_rng(21)
    eps = constants.EPSILON_0 * (1.0 + rng.random((N, N)))
    mu = np.full((N, N), constants.MU_0)
    src = np.zeros((N, N)); src[N // 2, N // 3] = 5.0
    return eps, mu, src


def test_shardmap_matvec_matches_single_device():
    N = 64
    eps, mu, _ = _scene(N)
    op = make_operator(eps, mu, 1e-3, 1e-3, 17e9, pml_thickness=10,
                       dtype=jnp.complex128)
    mesh = make_mesh((8,), axis_names=("x",))
    mv = sharded_matvec_shardmap(op, mesh)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    xs = jax.device_put(x, NamedSharding(mesh, P("x", None)))
    want = np.asarray(op.apply(x))
    got = np.asarray(mv(xs))
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-13, f"shard_map matvec mismatch: {err:.2e}"


def test_sharded_fdfd_solve_matches_single_device():
    N = 96
    eps, mu, src = _scene(N)
    omega = 17e9
    op = make_operator(eps, mu, 1e-3, 1e-3, omega, pml_thickness=16,
                       dtype=jnp.complex128)
    b = jnp.asarray(-1j * omega * src, jnp.complex128)

    want = solve_fdfd(op, b, tol=1e-10, maxiter=120)
    mesh = make_mesh((2, 4))
    got = solve_fdfd_sharded(op, b, mesh, tol=1e-10, maxiter=120)

    assert float(got.relative_residual) < 1e-9
    err = np.max(np.abs(np.asarray(got.x) - np.asarray(want.x)))
    scale = np.max(np.abs(np.asarray(want.x)))
    assert err / scale < 1e-8, f"sharded solve mismatch: {err / scale:.2e}"


def test_sharded_fdtd_matches_single_device():
    N = 96
    eps, mu, _ = _scene(N)
    cfg = FDTDConfig(dt=5e-14, dx=1e-4, nsteps=60, source_xy=(N // 2, N // 2),
                     source_fc=30e9, backend="jax", dtype=jnp.float64)
    (want, _, _), _ = simulate(eps, mu, cfg)

    mesh = make_mesh((2, 4))
    (got, _, _), _ = simulate_sharded(eps, mu, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-12)
