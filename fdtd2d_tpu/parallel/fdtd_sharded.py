"""Multi-chip FDTD at Pallas-kernel speed: shard_map + ppermute halos around
the temporally-tiled row-panel kernel.

Round-2's ``simulate_sharded`` pinned ``backend="jax"`` — the moment a run
sharded, per-chip throughput dropped ~15x from the ~70-90 GCells/s Pallas
kernels to the ~5.6 GCells/s XLA step. This module composes the ttiled
kernel (fdtd2d_tpu/ops/pallas_fdtd_ttiled.py) with a 1D row mesh:

- Each device owns ``ln = N/D`` grid rows, stored ghost-padded to
  ``(PH + ln + PH, M)`` — the exact layout the kernel's Element-indexed
  panel windows expect, so the per-device compute IS the single-chip kernel.
- Once per K-step sweep, each device sends its top/bottom GH own rows to its
  neighbors over ICI (``jax.lax.ppermute``; 3 fields x 2 directions) and
  splices the received rows into its ghost region: the kernel's panel-halo
  recursion then crosses chip boundaries exactly as it crosses panel
  boundaries. Edge devices receive ppermute zeros, and the kernel's
  ``is_top/is_bot`` flags (device-varying scalars, passed through SMEM)
  keep the Mur boundary treatment on the true domain edges only.
- The source row is dynamic (``src_g`` in device-local ghosted coords), so
  every device whose panel windows overlap the injection row adds it — the
  same exactly-once ownership argument as intra-device panels.

Communication cost: 2 * GH rows * M cols * 4 B * 3 fields per K steps
(= 1.5 MB per sweep at 4096^2, K=16 — microseconds on ICI vs ~4 ms of
compute), so per-chip throughput stays at kernel speed.

The reference has no distributed FDTD at all (its loop is
python-src/fdtd.py:30-40, single NumPy process); SURVEY.md section 2.3 maps
this to the spatial-domain-decomposition row of the parallelism inventory.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fdtd2d_tpu.ops.pallas_fdtd_ttiled import (
    S, _PH_CANDIDATES, _ttiled_sweep,
)


def pick_exact_panel_height(ln: int, M: int, GH: int, dtype_bytes: int = 4,
                            budget: int = 100 * 1024 * 1024) -> Optional[int]:
    """Largest PH dividing ``ln`` exactly (no padding: interior devices'
    rows continue on the neighbor, only the last device's bottom may pad —
    we keep it uniform and require exact division) with PH >= GH and the
    kernel's VMEM windows within budget. None if nothing fits."""
    for PH in _PH_CANDIDATES:
        if ln % PH or PH < max(GH, S):
            continue
        H = PH + 2 * GH
        if (2 * (5 * H + 3 * PH) + 3 * H) * M * dtype_bytes <= budget:
            return PH
    return None


def plan_sharded_ttiled(N: int, M: int, D: int):
    """(K, GH, PH) admitting the sharded ttiled path, or None.

    Deeper temporal tiles (K=32/24) are preferred when the local panel
    keeps the redundant-halo compute 2K/PH <= 25% — the same knee the
    single-device driver uses (ops/pallas_fdtd_ttiled.pick_sweep_depth,
    measured +25% at 4096^2); they also mean fewer, larger ppermute
    exchanges per step (same rows/step, fewer messages). K=16/8 remain
    the unconditional fallbacks."""
    if N % D or M < 128:
        return None
    ln = N // D
    for K in (32, 24, 16, 8):
        GH = max(8, -(-K // 8) * 8)
        PH = pick_exact_panel_height(ln, M, GH)
        if PH is not None and (K <= 16 or 2 * K / PH <= 0.25):
            return K, GH, PH
    return None


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "ax", "D", "ln", "M", "K", "GH", "PH",
                     "source_kind", "sy", "nsweeps", "rem", "nframes",
                     "interpret"))
def _sharded_run(ez3, hx3, hy3, ce3, ch3, fparams, sx, *, mesh, ax, D, ln, M,
                 K, GH, PH, source_kind, sy, nsweeps, rem, nframes,
                 interpret):
    """One jitted SPMD program: scan of (halo exchange -> K-step sweep)."""

    spf_sweeps = nsweeps // max(nframes, 1) if nframes else 0

    def local_run(ez3, hx3, hy3, ce3, ch3, fparams, sx):
        ez, hx, hy = ez3[0], hx3[0], hy3[0]
        ce, ch = ce3[0], ch3[0]
        idx = jax.lax.axis_index(ax)
        is_top = (idx == 0).astype(jnp.int32)
        is_bot = (idx == D - 1).astype(jnp.int32)
        # source row in this device's ghosted coords (may fall in the halo
        # or outside the window range entirely — the kernel's range check
        # handles both)
        src_g = (PH + sx - idx * ln).astype(jnp.int32)

        fwd = [(i, i + 1) for i in range(D - 1)]
        bwd = [(i + 1, i) for i in range(D - 1)]

        def exchange(f):
            if D == 1:
                return f
            from_above = jax.lax.ppermute(f[PH + ln - GH : PH + ln], ax, fwd)
            from_below = jax.lax.ppermute(f[PH : PH + GH], ax, bwd)
            f = f.at[PH - GH : PH].set(from_above)
            return f.at[PH + ln : PH + ln + GH].set(from_below)

        def sweep(carry, k, nk):
            ez, hx, hy = carry
            ez, hx, hy = exchange(ez), exchange(hx), exchange(hy)
            iparams = jnp.stack(
                [(k * K).astype(jnp.int32), src_g, is_top, is_bot])
            ez, hx, hy = _ttiled_sweep(
                ez, hx, hy, ce, ch, fparams, iparams,
                K=nk, PH=PH, GH=GH, BOT=PH, source_kind=source_kind, sy=sy,
                interpret=interpret)
            return ez, hx, hy

        carry = (ez, hx, hy)
        if nframes > 0:
            def frame(carry, fi):
                def body(c, j):
                    return sweep(c, fi * spf_sweeps + j, K), None

                carry, _ = jax.lax.scan(body, carry,
                                        jnp.arange(spf_sweeps))
                return carry, carry[0][PH : PH + ln, :]

            carry, snaps = jax.lax.scan(frame, carry, jnp.arange(nframes))
            leftover = nsweeps - nframes * spf_sweeps
        else:
            snaps = None
            leftover = nsweeps

        if leftover > 0:
            def body(c, j):
                return sweep(c, (nsweeps - leftover) + j, K), None

            carry, _ = jax.lax.scan(body, carry, jnp.arange(leftover))
        if rem > 0:
            carry = sweep(carry, jnp.asarray(nsweeps), rem)

        ez, hx, hy = carry
        own = lambda f: f[None, PH : PH + ln, :]
        outs = (own(ez), own(hx), own(hy))
        if nframes > 0:
            return outs + (snaps[:, None],)
        return outs

    spec = P(ax, None, None)
    out_specs = (spec, spec, spec)
    if nframes > 0:
        out_specs = out_specs + (P(None, ax, None, None),)
    # check_vma=False: pallas_call's out_shape carries no varying-manual-axes
    # annotation, which the vma type check rejects inside shard_map; the
    # computation is sound (each device steps only its own ghosted block).
    f = shard_map(
        local_run, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P(), P()),
        out_specs=out_specs, check_vma=False)
    return f(ez3, hx3, hy3, ce3, ch3, fparams, sx)


@functools.partial(jax.jit, static_argnames=("D", "ln", "PH", "M"))
def _prep(eps, mu, Ez, Hx, Hy, dt, dx, *, D, ln, PH, M):
    """Coefficients + overlapped ghost blocks as ONE program — eagerly this
    is ~25 tunnel-round-trip dispatches per call (measured: it halved the
    driver-level throughput at 512-step granularity)."""
    from fdtd2d_tpu.fdtd.step import precompute_coefficients

    dtype = Ez.dtype
    N = D * ln
    ce, ch, coef = precompute_coefficients(eps, mu, dt, dx, dtype)
    # validity masks live in the coefficients (cf. single-device driver):
    # zero ce on the boundary ring, zero-pad ch to (N, M)
    ce = ce.at[0, :].set(0.0).at[-1, :].set(0.0)
    ce = ce.at[:, 0].set(0.0).at[:, -1].set(0.0)
    ch = jnp.pad(ch, ((0, 1), (0, 1)))

    def ghost_stack(a):
        """(D, 2PH + ln, M) overlapped row blocks of the globally
        ghost-padded array — device d's block holds its own rows plus PH
        rows of context each side (true neighbor values for coefficients
        and initial fields; the GH halo rows are refreshed per sweep)."""
        g = jnp.zeros((N + 2 * PH, M), dtype)
        g = g.at[PH : PH + a.shape[0], : a.shape[1]].set(a)
        return jnp.stack([g[d * ln : d * ln + ln + 2 * PH] for d in range(D)])

    fparams = jnp.stack([coef.astype(dtype), jnp.asarray(dt, dtype)[...],
                         jnp.zeros((), dtype)])  # fc filled by caller
    return (ghost_stack(Ez), ghost_stack(Hx), ghost_stack(Hy),
            ghost_stack(ce), ghost_stack(ch), fparams)


def simulate_sharded_ttiled(eps, mu, config, mesh: Mesh, state=None):
    """FDTD rollout row-sharded over a 1D mesh, each device running the
    temporally-tiled Pallas kernel on its row block (see module docstring).

    Returns ``((Ez, Hx, Hy), snapshots)`` with the single-device staggered
    shapes; snapshots is (nframes, N, M) or None (frame boundaries land on
    K-step sweep multiples). Call :func:`plan_sharded_ttiled` first — raises
    if the shape does not admit the decomposition (callers fall back to the
    GSPMD jax path)."""
    dtype = jnp.float32
    eps = jnp.asarray(eps, dtype)
    mu = jnp.asarray(mu, dtype)
    N, M = eps.shape
    assert mesh.devices.ndim == 1, "ttiled sharding uses a 1D (row) mesh"
    D = mesh.devices.shape[0]
    ax = mesh.axis_names[0]
    plan = plan_sharded_ttiled(N, M, D)
    if plan is None:
        raise ValueError(f"grid {N}x{M} over {D} devices admits no "
                         "ttiled row decomposition")
    K, GH, PH = plan
    ln = N // D

    # pin every _prep input to one canonical sharding: a state round-tripped
    # from a previous call carries the shard_map output sharding, and a
    # differently-placed argument is a different jit cache entry — the
    # silent recompile cost ~3 min on the remote-compile stack (measured)
    rowsh = NamedSharding(mesh, P(ax, None))
    rput = lambda a: jax.device_put(jnp.asarray(a, dtype), rowsh)
    eps, mu = rput(eps), rput(mu)
    if state is None:
        Ez = rput(jnp.zeros((N, M), dtype))
        Hx = rput(jnp.zeros((N, M - 1), dtype))
        Hy = rput(jnp.zeros((N, M), dtype))
    else:
        Ez, Hx, Hy = state
        # Hy's staggered (N-1, M) rows shard unevenly over D — pad to N rows
        # (the pad row only feeds coefficient-masked updates)
        Hy = jnp.pad(jnp.asarray(Hy, dtype), ((0, 1), (0, 0)))
        Ez, Hx, Hy = rput(Ez), rput(Hx), rput(Hy)

    sh = NamedSharding(mesh, P(ax, None, None))
    rep = NamedSharding(mesh, P())
    dt = jnp.asarray(config.dt, dtype)
    dxs = jnp.asarray(config.dx, dtype)
    ez3, hx3, hy3, ce3, ch3, fparams = _prep(
        eps, mu, Ez, Hx, Hy, dt, dxs, D=D, ln=ln, PH=PH, M=M)
    put = lambda a: jax.device_put(a, sh)
    ez3, hx3, hy3, ce3, ch3 = (put(a) for a in (ez3, hx3, hy3, ce3, ch3))
    fparams = jax.device_put(
        fparams.at[2].set(jnp.asarray(config.source_fc, dtype)), rep)
    sx_arr = jax.device_put(jnp.asarray(config.source_xy[0], jnp.int32), rep)

    nsweeps, rem = divmod(config.nsteps, K)
    nframes = 0
    if config.nframes > 0 and nsweeps > 0:
        nframes = min(config.nframes, nsweeps)

    interpret = jax.default_backend() != "tpu"
    out = _sharded_run(
        ez3, hx3, hy3, ce3, ch3, fparams, sx_arr, mesh=mesh, ax=ax, D=D,
        ln=ln, M=M, K=K, GH=GH, PH=PH, source_kind=config.source_kind,
        sy=config.source_xy[1], nsweeps=nsweeps, rem=rem, nframes=nframes,
        interpret=interpret)
    ez, hx, hy = out[0].reshape(N, M), out[1].reshape(N, M), out[2].reshape(N, M)
    snaps = out[3].reshape(-1, N, M) if nframes > 0 else None
    return (ez, hx[:, : M - 1], hy[: N - 1, :]), snaps
