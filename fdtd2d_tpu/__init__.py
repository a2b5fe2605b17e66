"""fdtd2d_tpu — a TPU-native 2D Maxwell solver framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference repo skunnavakkam/fdtd-2d (see SURVEY.md at the repo root):

- ``core``     — scenes: Yee grids, materials (image -> permittivity),
                 sources, geometry rasterization, physics guards.
- ``fdtd``     — TE-mode leapfrog time stepping: NumPy oracle, pure-JAX
                 ``lax.scan`` driver, fused Pallas TPU kernel.
- ``fdfd``     — steady-state Helmholtz solves: matrix-free UPML operator,
                 preconditioned Krylov solvers, differentiable ``custom_vjp``
                 solve, tiled (Schwarz) domain decomposition.
- ``ops``      — numeric kernels: stencil applies, Pallas kernels, sparse
                 primitives (scipy-parity layer), DST-based fast solvers.
- ``parallel`` — device meshes, sharded solvers (halo exchange over ICI),
                 additive-Schwarz preconditioning across chips.
- ``models``   — diffusion surrogate: Flax UNet, DDPM schedule, SNR-weighted
                 training, vmapped on-device data generation.
- ``viz``      — field snapshot rendering, video export, diagnostic plots.
"""

__version__ = "0.1.0"

from fdtd2d_tpu import constants as constants
