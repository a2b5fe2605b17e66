"""Row-panel-blocked FDTD Pallas kernel for grids beyond VMEM residency.

The VMEM-resident multi-step kernel (fdtd2d_tpu/ops/pallas_fdtd.py) covers
grids up to ~2300^2; above that the fields no longer fit on-chip. This kernel
processes one leapfrog step as a sweep of row panels: each panel DMAs its
rows plus halo into VMEM, recomputes the halo H row locally (instead of
communicating it), applies the staged update, and writes back exactly its
own rows. One HBM read+write pass per step — the XLA path at 4096^2 needs
several.

Performance structure (v2):
- The bulk H/E updates run UNMASKED: validity is encoded in the coefficient
  arrays (``ch`` is zero outside its staggered domain by construction; ``ce``
  has its boundary ring zeroed by the wrapper), so invalid cells update by
  +0 — no iota/mask passes over the panel.
- Mur left/right bands touch only two 8-column slices per panel; top/bottom
  bands and corner averaging run only in the first/last panels on 8-row
  slices, gated with ``pl.when``.
- Fields carry GH=8 permanent ghost rows of zeros top and bottom so every
  panel's DMA window has static, 8-aligned offsets/extents (TPU HBM slicing
  requires row-tile alignment), and the panel's own rows sit at a fixed
  local offset.

Update semantics are identical to fdtd2d_tpu/fdtd/step.py (validated against
the float64 NumPy oracle).

Performance status (v5e, this environment): 1.1 GCells/s at 4096^2 — slower
than the XLA-fused jax path (5.6). SUPERSEDED by the temporally-tiled v3
kernel (fdtd2d_tpu/ops/pallas_fdtd_ttiled.py, 69 GCells/s at 4096^2), which
`simulate(backend="auto")` selects for >VMEM grids; this one-step-per-pass
kernel is kept as the simpler oracle-validated reference for the panel
decomposition. Root causes of its ceiling, measured here: manual
make_async_copy DMA reaches only ~43 GB/s on this stack while Element-
indexed BlockSpec pipelining reaches ~240 GB/s, and one HBM pass per step
caps any single-step sweep at (43 GB/s) / (32 B/cell) = 1.3 GCells/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 5    # Mur band width
GH = 8   # ghost/halo rows per side (8-aligned DMA windows)
SW = 8   # boundary slice width (>= B + 1, 8-aligned)


def _shift_dn(f):
    """f[l+1] at row l (zero fill at the bottom)."""
    return jnp.concatenate([f[1:, :], jnp.zeros_like(f[:1, :])], axis=0)


def _shift_up(f):
    """f[l-1] at row l (zero fill at the top)."""
    return jnp.concatenate([jnp.zeros_like(f[:1, :]), f[:-1, :]], axis=0)


def _shift_l(f):
    """f[:, c+1] at column c."""
    return jnp.concatenate([f[:, 1:], jnp.zeros_like(f[:, :1])], axis=1)


def _shift_r(f):
    """f[:, c-1] at column c."""
    return jnp.concatenate([jnp.zeros_like(f[:, :1]), f[:, :-1]], axis=1)


def _source_amp(kind: str, t, fc):
    if kind == "ricker":
        tau = jnp.pi * fc * (t - 1.0 / fc)
        return (1.0 - 2.0 * tau**2) * jnp.exp(-(tau**2))
    env = 1.0 - jnp.exp(-((t - 3000.0 / fc) ** 2) / (2.0 * (2.0 / fc) ** 2))
    return env * jnp.sin(2.0 * jnp.pi * fc * t)


def _kernel(PH: int, N: int, M: int, source_kind: str, sx: int, sy: int,
            fparams, iparams,
            ez_hbm, hx_hbm, hy_hbm, ce_hbm, ch_hbm,
            ezo_hbm, hxo_hbm, hyo_hbm,
            ez, hx, hy, ce, ch, pl_s, pr_s, pt_s, pb_s, sems):
    p = pl.program_id(0)
    num_panels = pl.num_programs(0)
    row0 = p * PH            # padded-row start of the DMA window
    H = PH + 2 * GH
    coef = fparams[0]
    dt = fparams[1]
    fc = fparams[2]
    t0 = iparams[0]

    loads = [
        pltpu.make_async_copy(ez_hbm.at[pl.ds(row0, H), :], ez, sems.at[0]),
        pltpu.make_async_copy(hx_hbm.at[pl.ds(row0, H), :], hx, sems.at[1]),
        pltpu.make_async_copy(hy_hbm.at[pl.ds(row0, H), :], hy, sems.at[2]),
        pltpu.make_async_copy(ce_hbm.at[pl.ds(row0, H), :], ce, sems.at[3]),
        pltpu.make_async_copy(ch_hbm.at[pl.ds(row0, H), :], ch, sems.at[4]),
    ]
    for c in loads:
        c.start()
    for c in loads:
        c.wait()

    # save pre-update boundary strips for the Mur scheme
    pl_s[:, :] = ez[:, 0:SW]
    pr_s[:, :] = ez[:, M - SW : M]

    @pl.when(p == 0)
    def _():
        pt_s[:, :] = ez[GH : GH + SW, :]

    @pl.when(p == num_panels - 1)
    def _():
        pb_s[:, :] = ez[GH + PH - SW : GH + PH, :]

    # --- bulk H + interior E updates (validity via zero coefficients) ------
    P = ez[:, :]
    hx1 = hx[:, :] - ch[:, :] * (_shift_dn(P) - P)
    hy1 = hy[:, :] + ch[:, :] * (_shift_l(P) - P)
    curl = (hy1 - _shift_r(hy1)) - (hx1 - _shift_up(hx1))
    ez[:, :] = P + curl * ce[:, :]
    hx[:, :] = hx1
    hy[:, :] = hy1

    # --- Mur left/right bands (B skinny column updates, mirroring the
    # reference's sequential loop: iteration j reads column j+1 before it is
    # ever written. Applied on every loaded row: rows outside [1, N-1) exist
    # only in the first/last panels, where the top/bottom band and corner
    # stages overwrite every cell these values could reach, and halo rows
    # are never written back) ----------------------------------------------
    for j in range(B):
        ez[:, j : j + 1] = (pl_s[:, j + 1 : j + 2]
                            + coef * (ez[:, j + 1 : j + 2] - pl_s[:, j : j + 1]))
    for i in range(B):
        c = M - 1 - i
        lc = SW - 1 - i
        ez[:, c : c + 1] = (pr_s[:, lc - 1 : lc]
                            + coef * (ez[:, c - 1 : c] - pr_s[:, lc : lc + 1]))

    # --- Mur top/bottom bands + corners (boundary panels only) -------------
    rr8 = jax.lax.broadcasted_iota(jnp.int32, (SW, SW), 0)
    cc8 = jax.lax.broadcasted_iota(jnp.int32, (SW, SW), 1)

    @pl.when(p == 0)
    def _():
        for i in range(B):
            r = GH + i
            ez[r : r + 1, 1 : M - 1] = (
                pt_s[i + 1 : i + 2, 1 : M - 1]
                + coef * (ez[r + 1 : r + 2, 1 : M - 1] - pt_s[i : i + 1, 1 : M - 1]))
        # corners (read post-band values; rolls stay inside the 8x8 block,
        # the circular wrap rows/cols are masked out)
        tl = ez[GH : GH + SW, 0:SW]
        ez[GH : GH + SW, 0:SW] = jnp.where(
            (rr8 < B) & (cc8 < B),
            (pltpu.roll(tl, SW - 1, 1) + pltpu.roll(tl, SW - 1, 0)) * 0.5, tl)
        tr = ez[GH : GH + SW, M - SW : M]
        ez[GH : GH + SW, M - SW : M] = jnp.where(
            (rr8 < B) & (cc8 >= SW - B),
            (pltpu.roll(tr, 1, 1) + pltpu.roll(tr, SW - 1, 0)) * 0.5, tr)

    @pl.when(p == num_panels - 1)
    def _():
        for i in range(B):
            r = GH + PH - 1 - i
            li = SW - 1 - i
            ez[r : r + 1, 1 : M - 1] = (
                pb_s[li - 1 : li, 1 : M - 1]
                + coef * (ez[r - 1 : r, 1 : M - 1] - pb_s[li : li + 1, 1 : M - 1]))
        r0 = GH + PH - SW
        bl = ez[r0 : r0 + SW, 0:SW]
        ez[r0 : r0 + SW, 0:SW] = jnp.where(
            (rr8 >= SW - B) & (cc8 < B),
            (pltpu.roll(bl, 1, 0) + pltpu.roll(bl, SW - 1, 1)) * 0.5, bl)
        br = ez[r0 : r0 + SW, M - SW : M]
        ez[r0 : r0 + SW, M - SW : M] = jnp.where(
            (rr8 >= SW - B) & (cc8 >= SW - B),
            (pltpu.roll(br, 1, 0) + pltpu.roll(br, 1, 1)) * 0.5, br)

    # --- additive point source (aligned 8x128 read-modify-write) -----------
    sp = sx // PH                      # panel owning the source row
    @pl.when(p == sp)
    def _():
        lrow = GH + sx - sp * PH
        r8 = (lrow // 8) * 8
        c128 = (sy // 128) * 128
        t = t0.astype(dt.dtype) * dt
        amp = _source_amp(source_kind, t, fc)
        blk = ez[r8 : r8 + 8, c128 : c128 + 128]
        rr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        hit = (rr == lrow - r8) & (cc == sy - c128)
        ez[r8 : r8 + 8, c128 : c128 + 128] = blk + jnp.where(hit, amp, 0.0).astype(blk.dtype)

    # --- write back own rows -------------------------------------------------
    stores = [
        pltpu.make_async_copy(ez.at[pl.ds(GH, PH), :],
                              ezo_hbm.at[pl.ds(row0 + GH, PH), :], sems.at[0]),
        pltpu.make_async_copy(hx.at[pl.ds(GH, PH), :],
                              hxo_hbm.at[pl.ds(row0 + GH, PH), :], sems.at[1]),
        pltpu.make_async_copy(hy.at[pl.ds(GH, PH), :],
                              hyo_hbm.at[pl.ds(row0 + GH, PH), :], sems.at[2]),
    ]
    for c in stores:
        c.start()
    for c in stores:
        c.wait()

    # the output buffers are fresh allocations: the first/last panels also
    # write the permanent ghost rows (zeros) so the next step's halo reads
    # are defined. Scratch rows [0, GH) hold E values computed from ghost
    # zeros with zero coefficients -> still zero; same at the bottom.
    @pl.when(p == 0)
    def _():
        for src, dst in ((ez, ezo_hbm), (hx, hxo_hbm), (hy, hyo_hbm)):
            c = pltpu.make_async_copy(src.at[pl.ds(0, GH), :],
                                      dst.at[pl.ds(0, GH), :], sems.at[1])
            c.start()
            c.wait()

    @pl.when(p == num_panels - 1)
    def _():
        for src, dst in ((ez, ezo_hbm), (hx, hxo_hbm), (hy, hyo_hbm)):
            c = pltpu.make_async_copy(src.at[pl.ds(PH + GH, GH), :],
                                      dst.at[pl.ds(row0 + PH + GH, GH), :], sems.at[2])
            c.start()
            c.wait()


@functools.partial(
    jax.jit,
    static_argnames=("PH", "source_kind", "sx", "sy", "interpret"),
)
def _blocked_step(ezp, hxp, hyp, cep, chp, fparams, iparams, *,
                  PH: int, source_kind: str, sx: int, sy: int,
                  interpret: bool = False):
    """One step on ghost-padded (N+2*GH, M) arrays; returns new (ez, hx, hy)."""
    Np2, M = ezp.shape
    N = Np2 - 2 * GH
    assert N % PH == 0, f"N={N} must be a multiple of panel height {PH}"
    assert PH >= 2 * SW, f"panel height {PH} too small (need >= {2 * SW})"
    dtype = ezp.dtype
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = functools.partial(_kernel, PH, N, M, source_kind, sx, sy)
    H = PH + 2 * GH
    out = pl.pallas_call(
        kern,
        grid=(N // PH,),
        out_shape=(
            jax.ShapeDtypeStruct((Np2, M), dtype),
            jax.ShapeDtypeStruct((Np2, M), dtype),
            jax.ShapeDtypeStruct((Np2, M), dtype),
        ),
        in_specs=[smem, smem] + [anyspec] * 5,
        out_specs=(anyspec, anyspec, anyspec),
        scratch_shapes=[
            pltpu.VMEM((H, M), dtype),    # ez
            pltpu.VMEM((H, M), dtype),    # hx
            pltpu.VMEM((H, M), dtype),    # hy
            pltpu.VMEM((H, M), dtype),    # ce
            pltpu.VMEM((H, M), dtype),    # ch
            pltpu.VMEM((H, SW), dtype),   # pre-update left strip
            pltpu.VMEM((H, SW), dtype),   # pre-update right strip
            pltpu.VMEM((SW, M), dtype),   # pre-update top strip
            pltpu.VMEM((SW, M), dtype),   # pre-update bottom strip
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fparams, iparams, ezp, hxp, hyp, cep, chp)
    return out


def fdtd_multistep_blocked(Ez, Hx, Hy, ce, ch, coef, dt, fc, sx, sy,
                           nsteps: int, source_kind: str, step_offset,
                           PH: int = 512, interpret: bool = False):
    """Multi-step advance with standard staggered shapes (one kernel sweep
    per step under ``lax.scan``). For grids that do not fit VMEM."""
    N, M = Ez.shape
    dtype = Ez.dtype

    def ghost(a):
        out = jnp.zeros((N + 2 * GH, M), dtype)
        return out.at[GH : GH + a.shape[0], : a.shape[1]].set(a)

    # validity masks are encoded in the coefficients: ch is zero outside its
    # staggered (N-1, M-1) domain by padding; ce gets its boundary ring
    # zeroed (the reference never interior-updates the outermost ring)
    ce_m = jnp.asarray(ce, dtype)
    ce_m = ce_m.at[0, :].set(0.0).at[-1, :].set(0.0)
    ce_m = ce_m.at[:, 0].set(0.0).at[:, -1].set(0.0)

    ezp = ghost(Ez)
    hxp = ghost(Hx)
    hyp = ghost(Hy)
    cep = ghost(ce_m)
    chp = ghost(jnp.asarray(ch, dtype))
    fparams = jnp.stack([jnp.asarray(coef, dtype), jnp.asarray(dt, dtype),
                         jnp.asarray(fc, dtype)])
    off = jnp.asarray(step_offset, jnp.int32)

    def body(carry, i):
        ezp, hxp, hyp = carry
        iparams = (off + i).reshape(1)
        ezp, hxp, hyp = _blocked_step(ezp, hxp, hyp, cep, chp, fparams, iparams,
                                      PH=PH, source_kind=source_kind,
                                      sx=sx, sy=sy, interpret=interpret)
        return (ezp, hxp, hyp), None

    (ezp, hxp, hyp), _ = jax.lax.scan(body, (ezp, hxp, hyp), jnp.arange(nsteps))
    return (ezp[GH : GH + N, :], hxp[GH : GH + N, : M - 1],
            hyp[GH : GH + N - 1, :M])
