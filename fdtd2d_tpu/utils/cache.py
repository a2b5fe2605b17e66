"""Persistent XLA compilation cache wiring.

First-call compiles of the big tiled/FDFD programs take minutes on this
remote-compile TPU stack (STATUS.md, round-2 limitation 2), and every fresh
process used to pay that price again. The reference has no compiled
artifacts at all (pure NumPy/scipy); on TPU the compiled executable IS the
expensive artifact, so it is cached on disk keyed by HLO hash and reloaded
across processes.

Every process-level entry point (CLI, bench, examples, graft entry) calls
:func:`enable_compilation_cache` before building programs. Safe to call any
time — JAX applies the setting to subsequent compiles.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "fdtd2d_tpu", "xla")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path``.

    Resolution order: explicit arg, $FDTD2D_CACHE_DIR, ~/.cache/fdtd2d_tpu/xla.
    Set FDTD2D_CACHE_DIR=0 to disable. Returns the directory used (or None).
    """
    env = os.environ.get("FDTD2D_CACHE_DIR")
    if env == "0":
        return None

    import jax

    if path is None and env is None and jax.default_backend() == "cpu":
        # default-enable only where the cache pays for itself: the remote
        # TPU compile service (minutes-long first compiles). On CPU the
        # persistent cache is a hazard, not a win — XLA:CPU serializes
        # machine-specific AOT executables whose cross-machine loads warn
        # "could lead to execution errors such as SIGILL", and a cache
        # WRITE segfaulted the full test suite in this container (pytest
        # 2026-08-19: crash in compilation_cache.put_executable_and_time).
        # Opt in explicitly via the arg or FDTD2D_CACHE_DIR if wanted.
        return None
    path = path or env or _DEFAULT
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None

    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the tunnel round-trip makes every remote
    # compile worth skipping, and entries are small relative to the payoff
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
