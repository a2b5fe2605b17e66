"""Sweep the temporally-tiled FDTD kernel's (K, PH) on the real chip.

Round-3 numbers: 74 GCells/s at 4096^2 / 68-71 at 8192^2 vs 111-115 for the
VMEM-resident kernel at 2048^2. At K=16/PH=256 the per-step HBM traffic is
~2.2 B/cell (transport ceiling ~111 GCells/s at the measured 240 GB/s
Element-window rate) and the halo compute overhead is 2K/PH = 12.5%
(compute ceiling ~102): the measured 74 means transport and compute only
partially overlap. Larger K cuts traffic per step and amortizes per-sweep
scratch copies at the cost of more halo compute; this sweep measures where
the knee is.

Usage: python examples/ttiled_tune.py [N] [steps]  (one line per config)
"""
import sys
import time

import numpy as np

from fdtd2d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from fdtd2d_tpu import constants  # noqa: E402
from fdtd2d_tpu.fdtd.step import precompute_coefficients  # noqa: E402
from fdtd2d_tpu.ops.pallas_fdtd_ttiled import (  # noqa: E402
    fdtd_multistep_ttiled, pick_panel_height)


def main(N=4096, steps=2048):
    dt, dx, fc = 5e-14, 1e-4, 30e9
    eps = np.full((N, N), constants.EPSILON_0, np.float32)
    eps[N // 4 : N // 2, N // 4 : N // 3] *= 4.0
    mu = np.full((N, N), constants.MU_0, np.float32)
    ce, ch, coef = precompute_coefficients(jnp.asarray(eps), jnp.asarray(mu),
                                           dt, dx)
    Ez = jnp.zeros((N, N), jnp.float32)
    Hx = jnp.zeros((N, N - 1), jnp.float32)
    Hy = jnp.zeros((N - 1, N), jnp.float32)

    for K in (8, 16, 24, 32, 48):
        GH = max(8, -(-K // 8) * 8)
        default_PH = pick_panel_height(N, N, GH)
        for PH in sorted({default_PH, 128, 192, 256, 512}):
            rem = N % PH
            if PH < GH or (rem != 0 and rem < 6):
                continue
            try:
                args = dict(K=K, PH=PH)
                out = fdtd_multistep_ttiled(
                    Ez, Hx, Hy, ce, ch, coef, dt, fc, N // 2, N // 2,
                    steps, "ricker", 0, **args)
                float(jnp.max(jnp.abs(out[0])))  # sync (compile + warm)
                best = 0.0
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = fdtd_multistep_ttiled(
                        out[0], out[1], out[2], ce, ch, coef, dt, fc,
                        N // 2, N // 2, steps, "ricker", 0, **args)
                    float(jnp.max(jnp.abs(out[0])))
                    best = max(best,
                               N * N * steps / (time.perf_counter() - t0) / 1e9)
                print(f"K={K:3d} GH={GH:3d} PH={PH:5d}: {best:7.2f} GCells/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"K={K:3d} GH={GH:3d} PH={PH:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2048)
