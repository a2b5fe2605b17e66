"""Reference workflow 4 at full ambition: the 10-100 GHz decade sweep.

The reference INTENDED this sweep (reference: python-src/inverse_design.py:44
builds omegas over 10-100 GHz) but its code never ran (stub imports), and at
its literal units the fields underflow (see apps/inverse_design.py). Running
the decade for real requires resolving 100 GHz: dx <= lambda/10 ~ 0.3 mm on
the same 250 mm device => an ~848^2 grid, 11.5x the cells of the reference's
250^2 scene.

This drives the omega-batched differentiable FDFD stack at that scale on one
TPU chip (~21 s per optimization step: 10 forward + 10 adjoint solves at
848^2 per value_and_grad) and writes the converged low-pass frequency
response + design.

Run: python examples/inverse_design_decade.py [steps]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from fdtd2d_tpu.apps.inverse_design import decade_lowpass_problem, optimize
from fdtd2d_tpu.viz.plots import plot_frequency_response


def main(steps: int = 50):
    problem = decade_lowpass_problem(N=848, n_freqs=10, tol=1e-4, maxiter=600)
    print(f"decade sweep: N=848, dx={problem.dx*1e3:.4f} mm, "
          f"omegas {problem.omegas[0]/1e9:.0f}-{problem.omegas[-1]/1e9:.0f} GHz")

    t0 = time.perf_counter()
    design, responses, history = optimize(
        problem, steps=steps, lr=0.05,
        callback=lambda s, v, d: print(
            f"step {s}: loss {v:.6f} ({time.perf_counter()-t0:.0f}s)",
            flush=True))
    print(f"final loss: {history[-1]:.6f} in {time.perf_counter()-t0:.0f}s")

    r = np.asarray(responses)
    print("normalized response:", np.round(r / r.max(), 3))
    plot_frequency_response(problem.omegas, r,
                            np.asarray(problem.ideal_response),
                            "frequency_response_decade.png")
    np.save("design_decade.npy", np.asarray(design))
    print("wrote frequency_response_decade.png, design_decade.npy")


if __name__ == "__main__":
    from fdtd2d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
