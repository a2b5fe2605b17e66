"""Temporally-tiled row-panel FDTD Pallas kernel for grids beyond VMEM.

The v2 blocked kernel (fdtd2d_tpu/ops/pallas_fdtd_blocked.py) re-reads HBM
every step and loses to the XLA path (manual pallas DMA reaches ~43 GB/s on
this stack vs XLA's ~320). This v3 kernel changes the arithmetic intensity
instead of the transport: each sweep advances K leapfrog steps per panel
pass (trapezoidal/temporal tiling), so HBM sees

    (5 reads * (PH + 2K)/PH + 3 writes) * 4 bytes / K steps
    ~ 2.2 bytes/cell/step at K=16, PH=256      (vs ~32 for one-step passes)

and the transport uses Element-indexed overlapping BlockSpec windows, which
Mosaic pipelines at ~240 GB/s here (measured; manual make_async_copy: 43).
The in-VMEM step body uses the staging of the VMEM-resident kernel
(fdtd2d_tpu/ops/pallas_fdtd.py — ranged subarray indexing and strip-
vectorized Mur bands; concatenate-based shifts and single-column band
updates measure ~10x slower through Mosaic).

Scheme
------
- Fields live ghost-padded to (PAD + N + PAD, M) with PAD = PH so each
  panel's OWN rows land on a Blocked output window (Element output specs do
  not compile on this backend; Element INPUT windows with non-negative
  8-aligned offsets do).
- Panel p's input window covers its rows plus GH >= K halo rows each side;
  the fields are copied to VMEM scratch and stepped there (mutating the
  input buffers leaks into the neighbor's overlap region — measured, not
  theoretical). One leapfrog step has a row-dependency radius of 1, so
  after K in-VMEM steps exactly the panel's own rows are valid and written
  back; the halo compute is redundant work (2K/PH overhead), which buys the
  K-fold HBM amortization.
- Validity never shrinks at true domain boundaries (the Mur bands are
  row-local there), so the first/last panels' own rows stay exact; their
  out-of-domain halo rows are zeroed in-kernel each sweep because the
  ghost blocks of the previous sweep's OUTPUT arrays are never written
  (coefficient pad rows are genuinely zero, so zeros evolve as zeros —
  the zeroing guards against NaN garbage in unwritten HBM, where 0*NaN
  would poison adjacent real rows).
- The source is added by EVERY panel whose window contains the source row
  (its halo evolution needs it too); each panel only writes its own rows,
  so the injection lands exactly once in the output. Owning panels and
  local offsets are static (compile-time) constants.

Update semantics are identical to fdtd2d_tpu/fdtd/step.py and the VMEM
kernel (both validated against the float64 NumPy oracle, which itself is
bit-faithful to the reference's update order: python-src/main.py:12-76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 5      # Mur band width
S = B + 1  # strip width saved for the boundary scheme


def _source_amp(kind: str, t, fc):
    if kind == "ricker":
        tau = jnp.pi * fc * (t - 1.0 / fc)
        return (1.0 - 2.0 * tau**2) * jnp.exp(-(tau**2))
    env = 1.0 - jnp.exp(-((t - 3000.0 / fc) ** 2) / (2.0 * (2.0 / fc) ** 2))
    return env * jnp.sin(2.0 * jnp.pi * fc * t)


def _kernel(K: int, PH: int, GH: int, M: int, BOT: int, source_kind: str,
            GW: int,
            fparams, iparams,
            ez_in, hx_in, hy_in, ce, ch,
            ezo, hxo, hyo,
            ez, hx, hy, p_l, p_r, p_t, p_b, cur_lr, cur_tb, cblk):
    p = pl.program_id(0)
    last = pl.num_programs(0) - 1
    H = PH + 2 * GH
    # column layout: [GW ghost | Ml own | GW ghost]; GW = 0 single-device
    # and on 1D row meshes, GW >= K on column-sharded 2D meshes (the ghost
    # columns recede one cell of validity per in-VMEM step, like rows)
    Ml = M - 2 * GW
    cl = GW            # first true-domain column (when is_left)
    cr = GW + Ml       # one past the last true-domain column (when is_right)
    coef = fparams[0]
    dt = fparams[1]
    fc = fparams[2]
    t0 = iparams[0]
    # src_g/src_c: source row/col in GHOSTED array coords; dynamic so the
    # sharded driver can pass device-varying values under shard_map
    src_g = iparams[1]
    # is_top/is_bot/is_left/is_right: does this program's block border the
    # TRUE domain boundary on that side (Mur bands + halo zeroing)? All 1
    # single-device; a sharded interior device borders neighbor halo.
    is_top = iparams[2]
    is_bot = iparams[3]
    is_left = iparams[4]
    is_right = iparams[5]
    src_c = iparams[6]

    ez[:, :] = ez_in[:, :]
    hx[:, :] = hx_in[:, :]
    hy[:, :] = hy_in[:, :]

    # Zero the out-of-domain halo rows on the boundary panels (they alias
    # never-written ghost blocks of the previous sweep's output buffers).
    # On sharded interior devices those rows hold ppermute'd neighbor data
    # instead and must NOT be zeroed.
    @pl.when((p == 0) & (is_top != 0))
    def _():
        for f in (ez, hx, hy):
            f[0:GH, :] = jnp.zeros((GH, M), f.dtype)

    @pl.when((p == last) & (is_bot != 0))
    def _():
        for f in (ez, hx, hy):
            f[H - GH : H, :] = jnp.zeros((GH, M), f.dtype)

    def step(i, _):
        # Save previous-step boundary strips for the Mur scheme (at the
        # TRUE domain edge columns; with GW = 0 these are the array edges).
        p_l[:, :] = ez[:, cl : cl + S]
        p_r[:, :] = ez[:, cr - S : cr]

        @pl.when((p == 0) & (is_top != 0))
        def _():
            p_t[:, :] = ez[GH : GH + S, :]

        @pl.when((p == last) & (is_bot != 0))
        def _():
            # BOT < PH when the domain was zero-padded to a panel multiple:
            # the true bottom boundary sits BOT rows into the last panel
            p_b[:, :] = ez[GH + BOT - S : GH + BOT, :]

        # H update over [0:H-1, 0:M-1]; hy additionally over the last row
        # (validity is encoded in the zero coefficients: ch vanishes outside
        # the staggered (N-1, M-1) domain and in the ghost pad).
        e00 = ez[0 : H - 1, 0 : M - 1]
        chv = ch[0 : H - 1, 0 : M - 1]
        hx[0 : H - 1, 0 : M - 1] = hx[0 : H - 1, 0 : M - 1] - chv * (
            ez[1:H, 0 : M - 1] - e00)
        hy[0 : H - 1, 0 : M - 1] = hy[0 : H - 1, 0 : M - 1] + chv * (
            ez[0 : H - 1, 1:M] - e00)
        hy[H - 1 : H, 0 : M - 1] = hy[H - 1 : H, 0 : M - 1] + ch[H - 1 : H, 0 : M - 1] * (
            ez[H - 1 : H, 1:M] - ez[H - 1 : H, 0 : M - 1])

        # Interior Ez update (window rows [1, H-1); the untouched window-edge
        # rows are halo — never written back — or the domain boundary ring,
        # where ce is zeroed by the wrapper).
        curl = (hy[1 : H - 1, 1 : M - 1] - hy[1 : H - 1, 0 : M - 2]) - (
            hx[1 : H - 1, 1 : M - 1] - hx[0 : H - 2, 1 : M - 1])
        ez[1 : H - 1, 1 : M - 1] = ez[1 : H - 1, 1 : M - 1] + curl * ce[1 : H - 1, 1 : M - 1]

        # Mur left/right bands on ALL rows (strip-vectorized): rows that are
        # domain rows 0 / N-1 exist only in the boundary panels, where the
        # top/bottom band + corner stages below overwrite every cell these
        # writes could reach; halo rows are never written back. On a column-
        # sharded mesh only the devices bordering the true left/right edges
        # apply them (interior devices' ghost columns just evolve, mirroring
        # the neighbor's own computation).
        @pl.when(is_left != 0)
        def _():
            cur_lr[:, :] = ez[:, cl : cl + S]
            ez[:, cl : cl + B] = p_l[:, 1:S] + coef * (
                cur_lr[:, 1:S] - p_l[:, 0:B])

        @pl.when(is_right != 0)
        def _():
            cur_lr[:, :] = ez[:, cr - S : cr]
            ez[:, cr - B : cr] = p_r[:, 0:B] + coef * (
                cur_lr[:, 0:B] - p_r[:, 1:S])

        # Mur top/bottom bands + corner averaging (boundary panels only).
        # The band spans [1, M-1): on a column-sharded device that includes
        # the ghost columns (whose true owner applies the same row-local
        # update), minus the stale outermost ghost column each side; the
        # true corner cells are overwritten by the gated averaging stages.
        @pl.when((p == 0) & (is_top != 0))
        def _():
            cur_tb[:, :] = ez[GH : GH + S, :]
            ez[GH : GH + B, 1 : M - 1] = p_t[1:S, 1 : M - 1] + coef * (
                cur_tb[1:S, 1 : M - 1] - p_t[0:B, 1 : M - 1])

            @pl.when(is_left != 0)
            def _():
                cblk[:, :] = ez[GH : GH + S, cl : cl + S]
                ez[GH : GH + B, cl : cl + B] = (
                    cblk[0:B, 1:S] + cblk[1:S, 0:B]) * 0.5

            @pl.when(is_right != 0)
            def _():
                cblk[:, :] = ez[GH : GH + S, cr - S : cr]
                ez[GH : GH + B, cr - B : cr] = (
                    cblk[0:B, 0:B] + cblk[1:S, 1:S]) * 0.5

        @pl.when((p == last) & (is_bot != 0))
        def _():
            r0 = GH + BOT
            cur_tb[:, :] = ez[r0 - S : r0, :]
            ez[r0 - B : r0, 1 : M - 1] = p_b[0:B, 1 : M - 1] + coef * (
                cur_tb[0:B, 1 : M - 1] - p_b[1:S, 1 : M - 1])

            @pl.when(is_left != 0)
            def _():
                cblk[:, :] = ez[r0 - S : r0, cl : cl + S]
                ez[r0 - B : r0, cl : cl + B] = (
                    cblk[0:B, 0:B] + cblk[1:S, 1:S]) * 0.5

            @pl.when(is_right != 0)
            def _():
                cblk[:, :] = ez[r0 - S : r0, cr - S : cr]
                ez[r0 - B : r0, cr - B : cr] = (
                    cblk[0:B, 1:S] + cblk[1:S, 0:B]) * 0.5

        # Additive point source: every panel whose window holds the source
        # CELL (own rows/cols or halo — its halo evolution needs it too)
        # adds it locally; each panel writes back only its own rows and the
        # driver extracts only own columns, so the injection lands exactly
        # once in the assembled output. Both coordinates are DYNAMIC
        # (device-varying under shard_map); Mosaic only supports ALIGNED
        # dynamic loads, so the injection goes through an 8-row-aligned
        # full-width block with a one-hot mask (the (8, M) VMEM touch per
        # step is noise next to the field updates).
        t = (t0 + i).astype(dt.dtype) * dt
        amp = _source_amp(source_kind, t, fc)
        lrow = src_g - (PH + p * PH - GH)

        @pl.when((lrow >= 0) & (lrow < H) & (src_c >= 0) & (src_c < M))
        def _():
            r8 = (lrow // 8) * 8
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, M), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (8, M), 1)
            hot = ((rows == lrow - r8) & (cols == src_c)).astype(ez.dtype)
            blk = ez[pl.ds(r8, 8), :]
            ez[pl.ds(r8, 8), :] = blk + amp * hot

        return ()

    jax.lax.fori_loop(0, K, step, ())

    ezo[:, :] = ez[GH : GH + PH, :]
    hxo[:, :] = hx[GH : GH + PH, :]
    hyo[:, :] = hy[GH : GH + PH, :]


@functools.partial(
    jax.jit,
    static_argnames=("K", "PH", "GH", "BOT", "source_kind", "GW",
                     "interpret"),
)
def _ttiled_sweep(ezp, hxp, hyp, cep, chp, fparams, iparams, *,
                  K: int, PH: int, GH: int, BOT: int, source_kind: str,
                  GW: int = 0, interpret: bool = False):
    """One K-step sweep on (PAD + N + PAD, GW + Ml + GW) ghost-padded
    arrays, PAD = PH.

    ``N`` here is the PADDED row count (a panel multiple); ``BOT`` is where
    the true bottom boundary sits inside the last panel (BOT = PH unless the
    caller zero-padded the domain, then BOT = PH - pad). The pad rows carry
    zero coefficients, so they evolve as zeros; the bottom Mur band is
    applied at local rows [GH + BOT - 5, GH + BOT). ``GW`` is the column
    ghost width for column-sharded meshes (0 = no column ghosts; GW >= K
    otherwise, one column of validity recedes per in-VMEM step).

    ``iparams`` (SMEM int32, length 7): [global step offset, source row in
    ghosted coords, is_top, is_bot, is_left, is_right, source col in
    ghosted coords]. All but the offset are dynamic so the sharded driver
    (fdtd2d_tpu/parallel/fdtd_sharded.py) can pass device-varying values
    under shard_map — an SPMD program cannot specialize them statically
    per device."""
    Npad, M = ezp.shape
    N = Npad - 2 * PH
    assert N % PH == 0, f"N={N} must be a multiple of panel height {PH}"
    assert GH >= K, f"halo GH={GH} must cover K={K} steps"
    assert GW == 0 or GW >= K, f"column ghost GW={GW} must cover K={K} steps"
    assert M - 2 * GW >= 2 * S, f"own columns {M - 2 * GW} below 2*{S}"
    assert GH % 8 == 0 and PH % 8 == 0
    assert PH >= GH, (
        f"PH={PH} < GH={GH}: the first panel's Element input-window offset "
        "PH - GH would be negative (undefined on Mosaic)")
    assert S <= BOT <= PH, f"bottom boundary offset BOT={BOT} out of range"
    num_panels = N // PH
    H = PH + 2 * GH
    dtype = ezp.dtype

    # the multiple_of hint is load-bearing: Mosaic's divisibility checker
    # cannot prove 8 | (PH + p*PH - GH) through the affine expression
    in_spec = pl.BlockSpec(
        (pl.Element(H), pl.Element(M)),
        lambda p: (pl.multiple_of(PH + p * PH - GH, 8), 0))
    out_spec = pl.BlockSpec((PH, M), lambda p: (p + 1, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = functools.partial(_kernel, K, PH, GH, M, BOT, source_kind, GW)

    out = pl.pallas_call(
        kern,
        grid=(num_panels,),
        out_shape=(
            jax.ShapeDtypeStruct((Npad, M), dtype),
            jax.ShapeDtypeStruct((Npad, M), dtype),
            jax.ShapeDtypeStruct((Npad, M), dtype),
        ),
        in_specs=[smem, smem] + [in_spec] * 5,
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((H, M), dtype),    # ez working copy
            pltpu.VMEM((H, M), dtype),    # hx working copy
            pltpu.VMEM((H, M), dtype),    # hy working copy
            pltpu.VMEM((H, S), dtype),    # pre-step left strip
            pltpu.VMEM((H, S), dtype),    # pre-step right strip
            pltpu.VMEM((S, M), dtype),    # pre-step top strip
            pltpu.VMEM((S, M), dtype),    # pre-step bottom strip
            pltpu.VMEM((H, S), dtype),    # post-update l/r strip
            pltpu.VMEM((S, M), dtype),    # post-update t/b strip
            pltpu.VMEM((S, S), dtype),    # corner block
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fparams, iparams, ezp, hxp, hyp, cep, chp)
    return out


_PH_CANDIDATES = (1024, 768, 512, 384, 256, 192, 128, 96, 64, 48, 40, 32,
                  24, 16, 8)


def pick_panel_height(N: int, M: int, GH: int, dtype_bytes: int = 4,
                      budget: int = 100 * 1024 * 1024) -> int:
    """Largest admissible PH that fits the double-buffered VMEM windows plus
    the three field working copies:
    (2 * (5 inputs * H + 3 outputs * PH) + 3 scratch * H) * M * bytes.

    Admissible: PH >= GH (a smaller PH makes the first panel's Element
    window offset negative — undefined on Mosaic), and N % PH either 0 (no
    padding) or >= S (the driver zero-pads the domain to a panel multiple;
    the bottom Mur band, S rows deep, must then land entirely inside the
    last panel's own rows). With multiple-of-8 candidates down to GH this
    admits every N >= 64 in practice; pathological N fall back to the XLA
    path via the caller.

    Candidates larger than N are kept only as a last resort (smallest
    such): an oversized panel zero-pads the whole domain up to PH rows —
    returning 1024 for a 64-row grid would run 16x redundant compute."""
    best_over = None
    for PH in _PH_CANDIDATES:   # descending
        rem = N % PH
        if PH < max(GH, S) or (rem != 0 and rem < S):
            continue
        H = PH + 2 * GH
        if (2 * (5 * H + 3 * PH) + 3 * H) * M * dtype_bytes > budget:
            continue
        if PH > N:
            best_over = PH      # overwritten as we descend: smallest fit
            continue
        return PH               # largest admissible PH <= N
    if best_over is not None:
        return best_over
    raise ValueError(f"no panel height fits: N={N}, M={M}")


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "rem", "K", "PH", "GH", "BOT", "source_kind",
                     "sx", "sy", "interpret"),
)
def _ttiled_run(ezp, hxp, hyp, cep, chp, fparams, off, *, nsweeps: int,
                rem: int, K: int, PH: int, GH: int, BOT: int,
                source_kind: str, sx: int, sy: int, interpret: bool):
    """scan over sweeps, as ONE jitted program. Driving the eager
    ``lax.scan`` from un-jitted code ran ~50x slower on this stack
    (260 vs 4.7 ms/sweep at 4096^2 — measured; the same scan inside jit is
    full speed), so the whole sweep loop lives behind this jit boundary."""
    # src row (ghosted), top, bot, left, right, src col (GW = 0 -> plain sy)
    tail = jnp.asarray([PH + sx, 1, 1, 1, 1, sy], jnp.int32)
    if nsweeps > 0:
        def body(carry, k):
            ezp, hxp, hyp = carry
            iparams = jnp.concatenate([(off + k * K).reshape(1), tail])
            ezp, hxp, hyp = _ttiled_sweep(
                ezp, hxp, hyp, cep, chp, fparams, iparams,
                K=K, PH=PH, GH=GH, BOT=BOT, source_kind=source_kind,
                interpret=interpret)
            return (ezp, hxp, hyp), None

        (ezp, hxp, hyp), _ = jax.lax.scan(body, (ezp, hxp, hyp),
                                          jnp.arange(nsweeps))
    if rem > 0:
        iparams = jnp.concatenate([(off + nsweeps * K).reshape(1), tail])
        ezp, hxp, hyp = _ttiled_sweep(
            ezp, hxp, hyp, cep, chp, fparams, iparams,
            K=rem, PH=PH, GH=GH, BOT=BOT, source_kind=source_kind,
            interpret=interpret)
    return ezp, hxp, hyp


def pick_sweep_depth(N: int, M: int, dtype_bytes: int = 4):
    """Jointly choose (K, PH): the deepest temporal tile whose panel still
    keeps the redundant-halo compute 2K/PH at or below 25%. Measured at
    4096^2 on v5e (examples/ttiled_tune.py): K=32/PH=256 runs 75 GCells/s
    vs 60 for K=16/PH=256 — deeper tiles amortize both HBM traffic and
    per-sweep scratch copies until the halo overhead eats the gain
    (K=48/PH=256 drops to 66). Where VMEM forces small panels (8192^2 ->
    PH=128) the cap keeps K=16."""
    for K in (32, 24, 16):
        GH = max(8, -(-K // 8) * 8)
        try:
            PH = pick_panel_height(N, M, GH, dtype_bytes)
        except ValueError:
            continue
        if 2 * K / PH <= 0.25:
            return K, PH, GH
    GH = 16
    return 16, pick_panel_height(N, M, GH, dtype_bytes), GH


def fdtd_multistep_ttiled(Ez, Hx, Hy, ce, ch, coef, dt, fc, sx, sy,
                          nsteps: int, source_kind: str, step_offset,
                          K: int | None = None, PH: int | None = None,
                          interpret: bool = False):
    """Multi-step advance with standard staggered shapes: ceil(nsteps/K)
    temporally-tiled sweeps (each one pallas_call over row panels).

    ``K``/``PH`` default to :func:`pick_sweep_depth`'s jointly-chosen
    temporal depth and panel height; passing either overrides it.

    Row counts that are not a panel multiple are zero-padded at the bottom
    to the next one (the pad rows carry zero coefficients so they stay
    exactly zero; the bottom Mur band is repositioned via the kernel's BOT
    offset) — arbitrary N runs the fast kernel instead of silently falling
    back to the ~12x-slower XLA path."""
    N, M = Ez.shape
    dtype = Ez.dtype
    if K is None:
        K, auto_PH, GH = pick_sweep_depth(N, M, jnp.dtype(dtype).itemsize)
        if PH is None:
            PH = auto_PH
    else:
        GH = max(8, -(-K // 8) * 8)
        if PH is None:
            PH = pick_panel_height(N, M, GH, jnp.dtype(dtype).itemsize)
    pad = (-N) % PH
    BOT = PH - pad
    Nd = N + pad  # padded domain rows (panel multiple)

    def ghost(a):
        out = jnp.zeros((Nd + 2 * PH, M), dtype)
        return out.at[PH : PH + a.shape[0], : a.shape[1]].set(a)

    # validity masks live in the coefficients (cf. blocked kernel): ch is
    # zero outside its staggered (N-1, M-1) domain; ce's boundary ring is
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

    nsweeps, rem = divmod(nsteps, K)
    ezp, hxp, hyp = _ttiled_run(
        ezp, hxp, hyp, cep, chp, fparams, off, nsweeps=nsweeps, rem=rem,
        K=K, PH=PH, GH=GH, BOT=BOT, source_kind=source_kind, sx=sx, sy=sy,
        interpret=interpret)

    return (ezp[PH : PH + N, :], hxp[PH : PH + N, : M - 1],
            hyp[PH : PH + N - 1, :M])
