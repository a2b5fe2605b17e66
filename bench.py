"""Headline benchmark: FDTD Yee-cell update throughput at 2048^2 (GCells/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference repo's NumPy kernels measured in this container at
2048^2 = 17.7 MCells/s = 0.0177 GCells/s (BASELINE.md). The north-star target
is >=10 GCells/s/chip (BASELINE.json).

Runs the fused Pallas VMEM-resident kernel on the real chip when a TPU is
present, else the pure-JAX path on CPU.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fdtd2d_tpu import constants
    from fdtd2d_tpu.fdtd.simulate import simulate, FDTDConfig

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    N = 2048 if on_tpu else 512
    steps = 2000 if on_tpu else 50

    eps = np.full((N, N), constants.EPSILON_0, np.float32)
    eps[N // 4 : N // 2, N // 4 : N // 3] *= 4.0
    mu = np.full((N, N), constants.MU_0, np.float32)
    # pin scene on device once — host->device transfers ride a slow tunnel
    # in this environment and must not pollute the step timing
    eps = jnp.asarray(eps)
    mu = jnp.asarray(mu)
    cfg = FDTDConfig(
        dt=5e-14, dx=1e-4, nsteps=steps, source_xy=(N // 2, N // 2),
        source_fc=30e9, backend="pallas" if on_tpu else "jax",
    )

    # warm-up/compile
    (Ez, Hx, Hy), _ = simulate(eps, mu, cfg)
    float(jnp.max(jnp.abs(Ez)))  # force completion (block_until_ready is
    # unreliable for aliased ANY-memory-space pallas outputs)

    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        (Ez, Hx, Hy), _ = simulate(eps, mu, cfg, state=(Ez, Hx, Hy))
        float(jnp.max(jnp.abs(Ez)))
        dt = time.perf_counter() - t0
        best = max(best, N * N * steps / dt / 1e9)

    baseline = 0.0177  # GCells/s, reference NumPy kernels at 2048^2 (BASELINE.md)
    print(json.dumps({
        "metric": f"fdtd_yee_updates_{N}x{N}",
        "value": round(best, 3),
        "unit": "GCells/s",
        "vs_baseline": round(best / baseline, 1),
    }))


if __name__ == "__main__":
    # the TPU tunnel in this environment occasionally fails transiently;
    # a failed attempt poisons the process, so retry in a fresh interpreter
    import os
    import subprocess
    import sys

    if os.environ.get("FDTD2D_BENCH_CHILD") == "1":
        main()
    else:
        env = dict(os.environ, FDTD2D_BENCH_CHILD="1")
        for attempt in range(3):
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, capture_output=True, text=True)
            lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if proc.returncode == 0 and lines:
                print(lines[-1])
                break
        else:
            sys.stderr.write(proc.stdout + proc.stderr)
            sys.exit(1)
