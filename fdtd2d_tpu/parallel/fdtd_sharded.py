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

        one = jnp.ones((), jnp.int32)

        def sweep(carry, k, nk):
            ez, hx, hy = carry
            ez, hx, hy = exchange(ez), exchange(hx), exchange(hy)
            iparams = jnp.stack(
                [(k * K).astype(jnp.int32), src_g, is_top, is_bot,
                 one, one, jnp.asarray(sy, jnp.int32)])
            ez, hx, hy = _ttiled_sweep(
                ez, hx, hy, ce, ch, fparams, iparams,
                K=nk, PH=PH, GH=GH, BOT=PH, source_kind=source_kind,
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


# ---------------------------------------------------------------------------
# 2D-mesh variant: rows AND columns sharded, kernel speed on both axes
# ---------------------------------------------------------------------------


def plan_sharded_ttiled_2d(N: int, M: int, Dr: int, Dc: int):
    """(K, GH, PH, GW) admitting the 2D-sharded ttiled path, or None.

    Column ghosts GW = GH (>= K, like rows: one column of validity recedes
    per in-VMEM step). Extra redundant compute vs 1D: the 2 GW ghost
    columns per device, 2 GW / lm (e.g. 6% at 4096^2 on a 2x4 mesh,
    GW = 32, lm = 1024)."""
    if N % Dr or M % Dc:
        return None
    ln, lm = N // Dr, M // Dc
    if lm < 4 * S:
        return None
    for K in (32, 24, 16, 8):
        GH = max(8, -(-K // 8) * 8)
        GW = GH
        if lm <= 2 * GW:
            continue
        PH = pick_exact_panel_height(ln, lm + 2 * GW, GH)
        if PH is not None and (K <= 16 or 2 * K / PH <= 0.25):
            return K, GH, PH, GW
    return None


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axr", "axc", "Dr", "Dc", "ln", "lm", "M",
                     "K", "GH", "PH", "GW", "source_kind", "nsweeps", "rem",
                     "interpret"))
def _sharded_run_2d(ez4, hx4, hy4, ce4, ch4, fparams, sx, sy, *, mesh, axr,
                    axc, Dr, Dc, ln, lm, M, K, GH, PH, GW, source_kind,
                    nsweeps, rem, interpret):
    """One jitted SPMD program over the 2D mesh: scan of (two-phase halo
    exchange -> K-step sweep). The column exchange runs FIRST so the row
    exchange's full-width sends carry fresh column-ghost data into the
    corners (the K-step in-VMEM recursion consumes a triangle of corner
    halo, i + j <= K)."""

    def local_run(ez4, hx4, hy4, ce4, ch4, fparams, sx, sy):
        ez, hx, hy = ez4[0, 0], hx4[0, 0], hy4[0, 0]
        ce, ch = ce4[0, 0], ch4[0, 0]
        ir = jax.lax.axis_index(axr)
        ic = jax.lax.axis_index(axc)
        i32 = lambda v: v.astype(jnp.int32)
        is_top, is_bot = i32(ir == 0), i32(ir == Dr - 1)
        is_left, is_right = i32(ic == 0), i32(ic == Dc - 1)
        src_g = (PH + sx - ir * ln).astype(jnp.int32)
        src_c = (GW + sy - ic * lm).astype(jnp.int32)

        fwd_r = [(i, i + 1) for i in range(Dr - 1)]
        bwd_r = [(i + 1, i) for i in range(Dr - 1)]
        fwd_c = [(i, i + 1) for i in range(Dc - 1)]
        bwd_c = [(i + 1, i) for i in range(Dc - 1)]

        def exchange(f):
            if Dc > 1:
                from_left = jax.lax.ppermute(
                    f[:, lm : lm + GW], axc, fwd_c)
                from_right = jax.lax.ppermute(
                    f[:, GW : 2 * GW], axc, bwd_c)
                f = f.at[:, 0:GW].set(from_left)
                f = f.at[:, GW + lm : GW + lm + GW].set(from_right)
            if Dr > 1:
                from_above = jax.lax.ppermute(
                    f[PH + ln - GH : PH + ln, :], axr, fwd_r)
                from_below = jax.lax.ppermute(
                    f[PH : PH + GH, :], axr, bwd_r)
                f = f.at[PH - GH : PH, :].set(from_above)
                f = f.at[PH + ln : PH + ln + GH, :].set(from_below)
            return f

        def sweep(carry, k, nk):
            ez, hx, hy = carry
            ez, hx, hy = exchange(ez), exchange(hx), exchange(hy)
            iparams = jnp.stack(
                [(k * K).astype(jnp.int32), src_g, is_top, is_bot,
                 is_left, is_right, src_c])
            ez, hx, hy = _ttiled_sweep(
                ez, hx, hy, ce, ch, fparams, iparams,
                K=nk, PH=PH, GH=GH, BOT=PH, source_kind=source_kind,
                GW=GW, interpret=interpret)
            return ez, hx, hy

        carry = (ez, hx, hy)
        if nsweeps > 0:
            def body(c, j):
                return sweep(c, j, K), None

            carry, _ = jax.lax.scan(body, carry, jnp.arange(nsweeps))
        if rem > 0:
            carry = sweep(carry, jnp.asarray(nsweeps), rem)

        ez, hx, hy = carry
        own = lambda f: f[None, None, PH : PH + ln, GW : GW + lm]
        return own(ez), own(hx), own(hy)

    spec = P(axr, axc, None, None)
    f = shard_map(
        local_run, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P(), P(), P()),
        out_specs=(spec, spec, spec), check_vma=False)
    return f(ez4, hx4, hy4, ce4, ch4, fparams, sx, sy)


@functools.partial(jax.jit,
                   static_argnames=("Dr", "Dc", "ln", "lm", "PH", "GW"))
def _prep_2d(eps, mu, Ez, Hx, Hy, dt, dx, *, Dr, Dc, ln, lm, PH, GW):
    """Coefficients + doubly-overlapped ghost blocks as ONE program.

    Row context is PH deep (panel-aligned output windows, like the 1D
    driver), column context GW deep. Coefficient ghost cells hold TRUE
    neighbor values permanently (never exchanged); field ghost cells are
    refreshed per sweep."""
    from fdtd2d_tpu.fdtd.step import precompute_coefficients

    dtype = Ez.dtype
    N, M = Dr * ln, Dc * lm
    ce, ch, coef = precompute_coefficients(eps, mu, dt, dx, dtype)
    ce = ce.at[0, :].set(0.0).at[-1, :].set(0.0)
    ce = ce.at[:, 0].set(0.0).at[:, -1].set(0.0)
    ch = jnp.pad(ch, ((0, 1), (0, 1)))

    def ghost_blocks(a):
        g = jnp.zeros((N + 2 * PH, M + 2 * GW), dtype)
        g = g.at[PH : PH + a.shape[0], GW : GW + a.shape[1]].set(a)
        return jnp.stack([
            jnp.stack([g[r * ln : r * ln + ln + 2 * PH,
                         c * lm : c * lm + lm + 2 * GW]
                       for c in range(Dc)])
            for r in range(Dr)])

    fparams = jnp.stack([coef.astype(dtype), jnp.asarray(dt, dtype)[...],
                         jnp.zeros((), dtype)])  # fc filled by caller
    return (ghost_blocks(Ez), ghost_blocks(Hx), ghost_blocks(Hy),
            ghost_blocks(ce), ghost_blocks(ch), fparams)


def simulate_sharded_ttiled_2d(eps, mu, config, mesh: Mesh, state=None):
    """FDTD rollout sharded over a 2D (rows x columns) device mesh, each
    device running the temporally-tiled Pallas kernel on its block with
    two-phase ppermute halo exchange once per K-step sweep (see
    :func:`_sharded_run_2d`). Snapshots are not supported on this path
    (config.nframes must be 0); returns ``((Ez, Hx, Hy), None)`` with the
    single-device staggered shapes.

    SURVEY.md section 2.3's spatial domain decomposition row in full
    generality: 4096^2 on a 2x4 mesh admits K=32, PH=256, GW=32."""
    dtype = jnp.float32
    eps = jnp.asarray(eps, dtype)
    mu = jnp.asarray(mu, dtype)
    N, M = eps.shape
    assert mesh.devices.ndim == 2, "use simulate_sharded_ttiled for 1D meshes"
    if config.nframes:
        raise ValueError("snapshots are not supported on the 2D ttiled path")
    Dr, Dc = mesh.devices.shape
    axr, axc = mesh.axis_names
    plan = plan_sharded_ttiled_2d(N, M, Dr, Dc)
    if plan is None:
        raise ValueError(f"grid {N}x{M} over {Dr}x{Dc} devices admits no "
                         "ttiled 2D decomposition")
    K, GH, PH, GW = plan
    ln, lm = N // Dr, M // Dc

    gridsh = NamedSharding(mesh, P(axr, axc))
    gput = lambda a: jax.device_put(jnp.asarray(a, dtype), gridsh)
    eps, mu = gput(eps), gput(mu)
    if state is None:
        Ez = gput(jnp.zeros((N, M), dtype))
        Hx = gput(jnp.zeros((N, M), dtype))
        Hy = gput(jnp.zeros((N, M), dtype))
    else:
        Ez, Hx, Hy = state
        # pad the staggered shapes to (N, M); the pad row/col only feeds
        # coefficient-masked updates
        Hx = jnp.pad(jnp.asarray(Hx, dtype), ((0, 0), (0, 1)))
        Hy = jnp.pad(jnp.asarray(Hy, dtype), ((0, 1), (0, 0)))
        Ez, Hx, Hy = gput(Ez), gput(Hx), gput(Hy)

    sh = NamedSharding(mesh, P(axr, axc, None, None))
    rep = NamedSharding(mesh, P())
    dt = jnp.asarray(config.dt, dtype)
    dxs = jnp.asarray(config.dx, dtype)
    ez4, hx4, hy4, ce4, ch4, fparams = _prep_2d(
        eps, mu, Ez, Hx, Hy, dt, dxs, Dr=Dr, Dc=Dc, ln=ln, lm=lm, PH=PH,
        GW=GW)
    put = lambda a: jax.device_put(a, sh)
    ez4, hx4, hy4, ce4, ch4 = (put(a) for a in (ez4, hx4, hy4, ce4, ch4))
    fparams = jax.device_put(
        fparams.at[2].set(jnp.asarray(config.source_fc, dtype)), rep)
    sx_arr = jax.device_put(jnp.asarray(config.source_xy[0], jnp.int32), rep)
    sy_arr = jax.device_put(jnp.asarray(config.source_xy[1], jnp.int32), rep)

    nsweeps, rem = divmod(config.nsteps, K)
    interpret = jax.default_backend() != "tpu"
    ez, hx, hy = _sharded_run_2d(
        ez4, hx4, hy4, ce4, ch4, fparams, sx_arr, sy_arr, mesh=mesh,
        axr=axr, axc=axc, Dr=Dr, Dc=Dc, ln=ln, lm=lm, M=M, K=K, GH=GH,
        PH=PH, GW=GW, source_kind=config.source_kind, nsweeps=nsweeps,
        rem=rem, interpret=interpret)
    # (Dr, Dc, ln, lm) -> (Dr*ln, Dc*lm): interleave block and local axes
    unblock = lambda a: jnp.transpose(a, (0, 2, 1, 3)).reshape(N, M)
    ez, hx, hy = unblock(ez), unblock(hx), unblock(hy)
    return (ez, hx[:, : M - 1], hy[: N - 1, :]), None
