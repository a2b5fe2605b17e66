"""FDTD rollout driver: ``lax.scan`` over frames, source injection, snapshots.

Replaces the reference's Python time loop with per-frame PNG writes
(reference: python-src/fdtd.py:30-40) by a fully on-device scan: an outer
scan over frames emits strided Ez snapshots as scan outputs, an inner
``fori_loop`` advances ``steps_per_frame`` leapfrog steps, and the source is
a scalar amplitude scatter-add (no per-step full-grid allocation like
reference python-src/main.py:185).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fdtd2d_tpu.core.sources import ricker_amplitude, sinusoidal_amplitude
from fdtd2d_tpu.fdtd.step import fdtd_step, precompute_coefficients


@dataclasses.dataclass(frozen=True)
class FDTDConfig:
    dt: float
    dx: float
    nsteps: int
    source_xy: Tuple[int, int]
    source_fc: float
    source_kind: str = "ricker"        # "ricker" | "sinusoidal"
    nframes: int = 0                   # 0 = no snapshots
    backend: str = "jax"               # "jax" | "pallas"
    dtype: object = jnp.float32


def _source_amp(kind: str, t, fc):
    if kind == "ricker":
        return ricker_amplitude(t, fc)
    return sinusoidal_amplitude(t, fc)


@partial(jax.jit, static_argnames=("nsteps", "source_kind", "step_offset", "backend"))
def _run_chunk(Ez, Hx, Hy, ce, ch, coef, dt, fc, sx, sy, nsteps: int,
               source_kind: str, step_offset: int, backend: str):
    """Advance ``nsteps`` steps starting at global step index ``step_offset``."""
    if backend == "pallas":
        from fdtd2d_tpu.ops.pallas_fdtd import fdtd_multistep_pallas

        return fdtd_multistep_pallas(
            Ez, Hx, Hy, ce, ch, coef, dt, fc, sx, sy, nsteps, source_kind, step_offset
        )

    def body(i, carry):
        Ez, Hx, Hy = carry
        Ez, Hx, Hy = fdtd_step(Ez, Hx, Hy, ce, ch, coef)
        t = (step_offset + i).astype(ce.dtype) * dt
        amp = _source_amp(source_kind, t, fc)
        Ez = Ez.at[sx, sy].add(amp.astype(Ez.dtype))
        return Ez, Hx, Hy

    return jax.lax.fori_loop(0, nsteps, body, (Ez, Hx, Hy))


def simulate(eps, mu, config: FDTDConfig, state=None):
    """Run an FDTD rollout.

    Returns ``(Ez, Hx, Hy), snapshots`` where ``snapshots`` is a
    ``(nframes, N, M)`` array of strided Ez frames (or None if nframes=0).
    """
    dtype = config.dtype
    eps = jnp.asarray(eps, dtype)
    mu = jnp.asarray(mu, dtype)
    rows, cols = eps.shape
    if state is None:
        Ez = jnp.zeros((rows, cols), dtype)
        Hx = jnp.zeros((rows, cols - 1), dtype)
        Hy = jnp.zeros((rows - 1, cols), dtype)
    else:
        Ez, Hx, Hy = state

    ce, ch, coef = precompute_coefficients(eps, mu, config.dt, config.dx, dtype)
    dt = jnp.asarray(config.dt, dtype)
    fc = jnp.asarray(config.source_fc, dtype)
    sx, sy = config.source_xy

    if config.nframes <= 0:
        fields = _run_chunk(Ez, Hx, Hy, ce, ch, coef, dt, fc, sx, sy,
                            config.nsteps, config.source_kind, 0, config.backend)
        return fields, None

    steps_per_frame = max(config.nsteps // config.nframes, 1)
    nframes = config.nsteps // steps_per_frame
    remainder = config.nsteps - nframes * steps_per_frame

    @partial(jax.jit, static_argnames=())
    def scan_frames(Ez, Hx, Hy):
        def frame(carry, k):
            Ez, Hx, Hy = carry

            def body(i, c):
                Ez, Hx, Hy = c
                Ez, Hx, Hy = fdtd_step(Ez, Hx, Hy, ce, ch, coef)
                t = (k * steps_per_frame + i).astype(dtype) * dt
                amp = _source_amp(config.source_kind, t, fc)
                return Ez.at[sx, sy].add(amp.astype(Ez.dtype)), Hx, Hy

            Ez, Hx, Hy = jax.lax.fori_loop(0, steps_per_frame, body, (Ez, Hx, Hy))
            return (Ez, Hx, Hy), Ez

        return jax.lax.scan(frame, (Ez, Hx, Hy), jnp.arange(nframes))

    (Ez, Hx, Hy), snaps = scan_frames(Ez, Hx, Hy)
    if remainder:
        Ez, Hx, Hy = _run_chunk(Ez, Hx, Hy, ce, ch, coef, dt, fc, sx, sy,
                                remainder, config.source_kind,
                                nframes * steps_per_frame, config.backend)
    return (Ez, Hx, Hy), snaps
