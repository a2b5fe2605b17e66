"""Excitation sources.

The reference materializes a full (rows, cols) array per step just to add a
single point value (reference: python-src/main.py:182-195, injected additively
at python-src/fdtd.py:34). Here sources are *scalar amplitude functions* plus
an injection site, so a jitted step injects with one scatter-add — no per-step
allocation.
"""

from __future__ import annotations

import jax.numpy as jnp


def ricker_amplitude(t, fc):
    """Ricker wavelet amplitude at time ``t`` for center frequency ``fc``.

    Matches reference python-src/main.py:182-187:
    ``tau = pi*fc*(t - 1/fc); (1 - 2 tau^2) exp(-tau^2)``.
    """
    tau = jnp.pi * fc * (t - 1.0 / fc)
    return (1.0 - 2.0 * tau**2) * jnp.exp(-(tau**2))


def sinusoidal_amplitude(t, fc):
    """Gaussian-ramped sinusoid (reference python-src/main.py:190-195)."""
    envelope = 1.0 - jnp.exp(-((t - 3000.0 / fc) ** 2) / (2.0 * (2.0 / fc) ** 2))
    return envelope * jnp.sin(2.0 * jnp.pi * fc * t)


def point_source(Ez, x, y, amplitude):
    """Additively inject a scalar amplitude at one grid node."""
    return Ez.at[x, y].add(amplitude.astype(Ez.dtype))
