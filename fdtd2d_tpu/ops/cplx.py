"""TPU-compatible complex contraction helpers.

This TPU backend supports elementwise complex arithmetic but NOT complex
contractions (``dot_general`` on complex — so ``@``, ``jnp.vdot``,
``jnp.tensordot``, ``jnp.linalg.norm`` on complex inputs all fail with
UNIMPLEMENTED). These helpers express the same operations through real
contractions (which also land on the MXU, where the FLOPs belong).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def to_device_complex(x, dtype=jnp.complex64) -> jax.Array:
    """Host -> device transfer of a complex array via its real/imag parts.

    Direct complex-array transfers intermittently hang or fail through this
    environment's TPU tunnel; real transfers + an on-device ``lax.complex``
    are reliable (and halve the bytes when downcasting c128 -> c64).
    """
    import numpy as np

    x = np.asarray(x)
    real = jnp.finfo(dtype).dtype  # host-side (0-d complex device arrays are
    # unimplemented on this TPU backend and poison the process)
    if not np.iscomplexobj(x):
        z = jnp.asarray(x.astype(real))
        return jax.lax.complex(z, jnp.zeros_like(z))
    re = jnp.asarray(np.ascontiguousarray(x.real).astype(real))
    im = jnp.asarray(np.ascontiguousarray(x.imag).astype(real))
    return jax.lax.complex(re, im)


def cgather(a: jax.Array, *idx) -> jax.Array:
    """Fancy-index a complex array via separate real/imag gathers (complex
    gather is unimplemented on this TPU backend)."""
    if not jnp.iscomplexobj(a):
        return a[tuple(idx)]
    return jax.lax.complex(jnp.real(a)[tuple(idx)], jnp.imag(a)[tuple(idx)])


def czeros(shape, dtype=jnp.complex64) -> jax.Array:
    """Eager complex zeros via lax.complex of real zeros (eager complex
    constants are unimplemented on this TPU backend outside jit)."""
    real = jnp.finfo(dtype).dtype
    z = jnp.zeros(shape, real)
    return jax.lax.complex(z, z)


def fetch_complex(x: jax.Array):
    """Device -> host transfer of a complex array via its real/imag parts."""
    import numpy as np

    return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))


def cdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """<a, b> = sum(conj(a) * b) without a complex dot_general."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    re = jnp.sum(ar * br + ai * bi)
    if not jnp.iscomplexobj(a) and not jnp.iscomplexobj(b):
        return re
    im = jnp.sum(ar * bi - ai * br)
    return jax.lax.complex(re, im)


def cnorm(a: jax.Array) -> jax.Array:
    """||a||_2 as a real scalar (complex-safe)."""
    return jnp.sqrt(jnp.sum(jnp.real(a) ** 2 + jnp.imag(a) ** 2))


def cmatmul(A: jax.Array, B: jax.Array) -> jax.Array:
    """A @ B via four real matmuls when either operand is complex.

    Uses HIGHEST matmul precision: the TPU default runs f32 matmuls through
    bf16 passes, which destroys preconditioner quality and Krylov recurrences.
    """
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    if not (jnp.iscomplexobj(A) or jnp.iscomplexobj(B)):
        return mm(A, B)
    Ar, Ai = jnp.real(A), jnp.imag(A)
    Br, Bi = jnp.real(B), jnp.imag(B)
    re = mm(Ar, Br) - mm(Ai, Bi)
    im = mm(Ar, Bi) + mm(Ai, Br)
    return jax.lax.complex(re, im)
