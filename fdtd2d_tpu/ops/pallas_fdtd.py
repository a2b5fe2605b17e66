"""Fused multi-step FDTD Pallas kernel (VMEM-resident fields).

The reference's hot loop is a Python loop of NumPy passes with a full-field
copy per step (reference: python-src/fdtd.py:30-34, python-src/main.py:18).
The TPU-native design inverts the memory hierarchy: the kernel DMAs all three
fields plus both coefficient maps from HBM into VMEM once, runs ``nsteps``
leapfrog iterations back-to-back entirely in VMEM, and DMAs the state back —
HBM is touched once per chunk instead of ~8 full arrays per step. The Mur ABC
needs previous-step values only on the 4 boundary bands, so they are saved
into thin VMEM strip scratch buffers each step instead of copying the field
(the reference copies the whole field every step, python-src/main.py:18).

VMEM budget at 2048x2048 f32: 5 full arrays = 84 MB, within a TPU v5e's
128 MB. Larger grids fall back to the pure-JAX path (fdtd2d_tpu/fdtd/simulate.py).

Update semantics are identical to fdtd2d_tpu/fdtd/step.py (itself validated
against the float64 NumPy oracle), with fields padded to (N, M): Hx's phantom
last column and Hy's phantom last row are never read or written.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 5  # Mur band width
S = B + 1  # strip width saved for the boundary scheme


def _source_amp(kind: str, t, fc):
    if kind == "ricker":
        tau = jnp.pi * fc * (t - 1.0 / fc)
        return (1.0 - 2.0 * tau**2) * jnp.exp(-(tau**2))
    env = 1.0 - jnp.exp(-((t - 3000.0 / fc) ** 2) / (2.0 * (2.0 / fc) ** 2))
    return env * jnp.sin(2.0 * jnp.pi * fc * t)


def _kernel(nsteps: int, source_kind: str, sx: int, sy: int,
            fparams, iparams, ce_hbm, ch_hbm, ez_hbm, hx_hbm, hy_hbm,
            ez_out, hx_out, hy_out,
            ce, ch, ez, hx, hy,
            p_l, p_r, p_t, p_b, cur_lr, cur_tb, cblk, sems):
    """Multi-step kernel body; field state lives in VMEM scratch ez/hx/hy."""
    N, M = ez.shape
    coef = fparams[0]
    dt = fparams[1]
    fc = fparams[2]
    t0 = iparams[0]

    loads = [
        pltpu.make_async_copy(ce_hbm, ce, sems.at[0]),
        pltpu.make_async_copy(ch_hbm, ch, sems.at[1]),
        pltpu.make_async_copy(ez_hbm, ez, sems.at[2]),
        pltpu.make_async_copy(hx_hbm, hx, sems.at[3]),
        pltpu.make_async_copy(hy_hbm, hy, sems.at[4]),
    ]
    for c in loads:
        c.start()
    for c in loads:
        c.wait()

    def step(i, _):
        # Save previous-step boundary strips for the Mur scheme.
        p_l[:, :] = ez[:, 0:S]
        p_r[:, :] = ez[:, M - S : M]
        p_t[:, :] = ez[0:S, :]
        p_b[:, :] = ez[N - S : N, :]

        # H update over [0:N-1, 0:M-1].
        e00 = ez[0 : N - 1, 0 : M - 1]
        chv = ch[0 : N - 1, 0 : M - 1]
        hx[0 : N - 1, 0 : M - 1] = hx[0 : N - 1, 0 : M - 1] - chv * (ez[1:N, 0 : M - 1] - e00)
        hy[0 : N - 1, 0 : M - 1] = hy[0 : N - 1, 0 : M - 1] + chv * (ez[0 : N - 1, 1:M] - e00)

        # Interior Ez update.
        curl = (hy[1 : N - 1, 1 : M - 1] - hy[1 : N - 1, 0 : M - 2]) - (
            hx[1 : N - 1, 1 : M - 1] - hx[0 : N - 2, 1 : M - 1]
        )
        ez[1 : N - 1, 1 : M - 1] = ez[1 : N - 1, 1 : M - 1] + curl * ce[1 : N - 1, 1 : M - 1]

        # Mur left/right bands (read post-interior values via a strip copy to
        # avoid overlapping read/write of ez within one store).
        cur_lr[:, :] = ez[:, 0:S]
        ez[1 : N - 1, 0:B] = p_l[1 : N - 1, 1:S] + coef * (cur_lr[1 : N - 1, 1:S] - p_l[1 : N - 1, 0:B])
        cur_lr[:, :] = ez[:, M - S : M]
        ez[1 : N - 1, M - B : M] = p_r[1 : N - 1, 0:B] + coef * (cur_lr[1 : N - 1, 0:B] - p_r[1 : N - 1, 1:S])

        # Mur top/bottom bands (read post-left/right values).
        cur_tb[:, :] = ez[0:S, :]
        ez[0:B, 1 : M - 1] = p_t[1:S, 1 : M - 1] + coef * (cur_tb[1:S, 1 : M - 1] - p_t[0:B, 1 : M - 1])
        cur_tb[:, :] = ez[N - S : N, :]
        ez[N - B : N, 1 : M - 1] = p_b[0:B, 1 : M - 1] + coef * (cur_tb[0:B, 1 : M - 1] - p_b[1:S, 1 : M - 1])

        # Corner averaging (reads post-boundary values).
        cblk[:, :] = ez[0:S, 0:S]
        ez[0:B, 0:B] = (cblk[0:B, 1:S] + cblk[1:S, 0:B]) * 0.5
        cblk[:, :] = ez[0:S, M - S : M]
        ez[0:B, M - B : M] = (cblk[0:B, 0:B] + cblk[1:S, 1:S]) * 0.5
        cblk[:, :] = ez[N - S : N, 0:S]
        ez[N - B : N, 0:B] = (cblk[0:B, 0:B] + cblk[1:S, 1:S]) * 0.5
        cblk[:, :] = ez[N - S : N, M - S : M]
        ez[N - B : N, M - B : M] = (cblk[0:B, 1:S] + cblk[1:S, 0:B]) * 0.5

        # Additive point source at global step index t0 + i.
        t = (t0 + i).astype(dt.dtype) * dt
        amp = _source_amp(source_kind, t, fc)
        ez[sx : sx + 1, sy : sy + 1] = ez[sx : sx + 1, sy : sy + 1] + amp

        return ()

    jax.lax.fori_loop(0, nsteps, step, ())

    stores = [
        pltpu.make_async_copy(ez, ez_out, sems.at[0]),
        pltpu.make_async_copy(hx, hx_out, sems.at[1]),
        pltpu.make_async_copy(hy, hy_out, sems.at[2]),
    ]
    for c in stores:
        c.start()
    for c in stores:
        c.wait()


@functools.partial(
    jax.jit,
    static_argnames=("nsteps", "source_kind", "sx", "sy", "interpret"),
)
def _padded_multistep(ez, hx, hy, ce, ch, fparams, iparams, *,
                      nsteps: int, source_kind: str, sx: int, sy: int,
                      interpret: bool = False):
    """All arrays padded to (N, M) f32; runs nsteps inside one pallas_call."""
    N, M = ez.shape
    dtype = ez.dtype
    kern = functools.partial(_kernel, nsteps, source_kind, sx, sy)
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((N, M), dtype),
            jax.ShapeDtypeStruct((N, M), dtype),
            jax.ShapeDtypeStruct((N, M), dtype),
        ),
        in_specs=[smem, smem, anyspec, anyspec, anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec, anyspec),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        scratch_shapes=[
            pltpu.VMEM((N, M), dtype),   # ce
            pltpu.VMEM((N, M), dtype),   # ch
            pltpu.VMEM((N, M), dtype),   # ez
            pltpu.VMEM((N, M), dtype),   # hx
            pltpu.VMEM((N, M), dtype),   # hy
            pltpu.VMEM((N, S), dtype),   # p_l
            pltpu.VMEM((N, S), dtype),   # p_r
            pltpu.VMEM((S, M), dtype),   # p_t
            pltpu.VMEM((S, M), dtype),   # p_b
            pltpu.VMEM((N, S), dtype),   # cur_lr
            pltpu.VMEM((S, M), dtype),   # cur_tb
            pltpu.VMEM((S, S), dtype),   # cblk
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fparams, iparams, ce, ch, ez, hx, hy)
    return out


def pad_state(Ez, Hx, Hy):
    """Pad staggered fields to common (N, M) shape (phantom cells unused)."""
    N, M = Ez.shape
    Hx = jnp.pad(Hx, ((0, 0), (0, M - Hx.shape[1])))
    Hy = jnp.pad(Hy, ((0, N - Hy.shape[0]), (0, 0)))
    return Ez, Hx, Hy


def unpad_state(Ez, Hxp, Hyp):
    N, M = Ez.shape
    return Ez, Hxp[:, : M - 1], Hyp[: N - 1, :]


def fdtd_multistep_pallas(Ez, Hx, Hy, ce, ch, coef, dt, fc, sx, sy,
                          nsteps: int, source_kind: str, step_offset,
                          interpret: bool = False):
    """Drop-in multi-step advance with standard staggered shapes."""
    N, M = Ez.shape
    dtype = Ez.dtype
    Ez, Hxp, Hyp = pad_state(Ez, Hx, Hy)
    chp = jnp.pad(ch, ((0, N - ch.shape[0]), (0, M - ch.shape[1])))
    fparams = jnp.stack([
        jnp.asarray(coef, dtype), jnp.asarray(dt, dtype), jnp.asarray(fc, dtype)
    ])
    iparams = jnp.asarray(step_offset, jnp.int32).reshape(1)
    Ez, Hxp, Hyp = _padded_multistep(
        Ez, Hxp, Hyp, ce, chp, fparams, iparams,
        nsteps=nsteps, source_kind=source_kind, sx=sx, sy=sy, interpret=interpret,
    )
    return unpad_state(Ez, Hxp, Hyp)
