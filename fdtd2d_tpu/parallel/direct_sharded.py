"""Mesh-sharded direct Helmholtz solve: sublattices distributed over devices.

The four (i mod 2, j mod 2) sublattices of the block-Thomas factorization
(fdtd2d_tpu/fdfd/direct.py) are INDEPENDENT linear systems that only meet
at the RHS split / solution merge. For even grid sizes all four have
identical (N/2, N/2) shapes, so they stack into a leading length-4 batch
axis that shards over a device mesh: `jit(vmap(...))` with the batch axis
placed on the mesh runs each sublattice's factor/solve scan on its own
device with zero communication until the final merge — factor wall-clock
and per-device W-inverse storage both drop ~4x, which moves the direct
solver's HBM ceiling from ~1024^2 per chip toward 2048^2 on a 4-device
slice (34 GB of factors -> 8.5 GB per device).

This is a third distributed leg next to the sharded FDTD kernel
(parallel/fdtd_sharded.py) and the patch-sharded Schwarz solve
(parallel/tiled_sharded.py); the reference has no distributed anything
(SURVEY.md section 2.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fdtd2d_tpu.ops.helmholtz import HelmholtzOperator
from fdtd2d_tpu.fdfd.compressed import (
    CompressedSublatticeFactors, _factor_sub_compressed,
    _solve_sub_compressed, hodlr_plan, make_test_matrices,
)
from fdtd2d_tpu.fdfd.direct import (
    CkptSublatticeFactors, SublatticeFactors, _factor_sub, _factor_sub_ckpt,
    _solve_sub, _solve_sub_ckpt, five_point_coefficients, _PARITIES,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StackedFactors:
    """The four sublattice factor sets stacked on a leading axis (even N)."""
    stacked: SublatticeFactors          # leaves have leading axis 4
    shape: tuple = dataclasses.field(metadata=dict(static=True))


@jax.jit
def _stack_coefficients(op: HelmholtzOperator):
    d, e, w, s, n = five_point_coefficients(op)

    def subs(a):
        return jnp.stack([a[px::2, py::2] for (px, py) in _PARITIES])

    return subs(d), subs(e), subs(w), subs(n), subs(s)


@jax.jit
def _factor_stacked(d4, e4, w4, n4, s4) -> SublatticeFactors:
    return jax.vmap(_factor_sub)(d4, e4, w4, n4, s4)


@partial(jax.jit, static_argnames=("stride",))
def _factor_stacked_ckpt(d4, e4, w4, n4, s4, *, stride: int):
    Wc = jax.vmap(
        lambda d, e, w, n, s: _factor_sub_ckpt(d, e, w, n, s, stride=stride)
    )(d4, e4, w4, n4, s4)
    return CkptSublatticeFactors(Wc=Wc, d=d4, e=e4, w=w4,
                                 nvals=n4, svals=s4, stride=stride)


@partial(jax.jit, static_argnames=("L",))
def _factor_stacked_compressed(d4, e4, w4, n4, s4, omegas, *, L: int):
    return jax.vmap(
        lambda d, e, w, n, s: _factor_sub_compressed(d, e, w, n, s, omegas, L)
    )(d4, e4, w4, n4, s4)


@jax.jit
def _solve_stacked(stacked, b) -> jax.Array:
    if isinstance(stacked, CkptSublatticeFactors):
        solve_one = _solve_sub_ckpt
    elif isinstance(stacked, CompressedSublatticeFactors):
        solve_one = _solve_sub_compressed
    else:
        solve_one = _solve_sub
    b4 = jnp.stack([b[px::2, py::2] for (px, py) in _PARITIES])
    x4 = jax.vmap(solve_one)(stacked, b4)
    x = jnp.zeros_like(b)
    for k, (px, py) in enumerate(_PARITIES):
        x = x.at[px::2, py::2].set(x4[k])
    return x


def factor_sharded(op: HelmholtzOperator, mesh: Mesh, *,
                   checkpointed: bool = False, stride: int = 32,
                   compressed: bool = False, rank: int = 20,
                   leaf: int = 128) -> StackedFactors:
    """Factor with the sublattice axis sharded over ``mesh`` axis 0 (use 1,
    2, or 4 devices; even Nx/Ny only).

    ``checkpointed=True`` composes the two memory levers: the sublattice
    axis divides storage over devices AND W is stored only every ``stride``
    rows (fdfd/direct.py). At 4096^2 that is ~2.1 GB of checkpoints per
    device on 4 devices, vs 272 GB store-all on one — the configuration
    that makes exact hard-media solves reachable on a pod slice.

    ``compressed=True`` shards the HODLR store (fdfd/compressed.py)
    instead: repeat solves stay two matvec scans (no recursion re-runs)
    while per-device memory drops by the sublattice split TIMES the HODLR
    compression — ~8.7 GB/device at 4096^2 rank 20 on 4 devices."""
    if checkpointed and compressed:
        raise ValueError("choose one of checkpointed/compressed")
    Nx, Ny = op.shape
    assert Nx % 2 == 0 and Ny % 2 == 0, "sharded direct solve needs even N"
    assert mesh.devices.ndim == 1 and 4 % mesh.devices.shape[0] == 0, \
        "use a 1D mesh of 1, 2, or 4 devices (the sublattice axis)"
    ax = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(ax))
    coeffs = _stack_coefficients(op)
    coeffs = tuple(jax.device_put(c, sh) for c in coeffs)
    if checkpointed:
        stacked = _factor_stacked_ckpt(*coeffs, stride=stride)
    elif compressed:
        nc = Ny // 2
        L = hodlr_plan(nc, leaf=leaf, rank=rank)
        omegas = make_test_matrices(nc, L, rank, dtype=op.dtype)
        stacked = _factor_stacked_compressed(*coeffs, omegas, L=L)
    else:
        stacked = _factor_stacked(*coeffs)
    return StackedFactors(stacked=stacked, shape=(Nx, Ny))


def solve_factored_sharded(f: StackedFactors, b) -> jax.Array:
    """x = A^{-1} b from sharded factors; b (Nx, Ny) complex (any layout —
    the sublattice split redistributes it)."""
    return _solve_stacked(f.stacked, b.reshape(f.shape))
