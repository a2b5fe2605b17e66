"""Command-line drivers for every workload.

The reference's "CLI" is five ``if __name__ == "__main__"`` blocks with
hardcoded constants (reference: python-src/fdtd.py:13-40, fdfd.py:81-118,
inverse_design.py:38-132, diffusion_training.py:326-406,
region_drawer.py:91-129). Here each workload is a subcommand with flags:

    fdtd2d fdtd    --size 200 --steps 1000 [--structure img.png] [--video out.mp4]
    fdtd2d fdfd    --size 512 --omega 17e9 [--structure img.png] [--out Ez.png]
    fdtd2d tiled   --size 512 --omega 17e9 [--mode krylov|additive|multiplicative]
    fdtd2d invdes  --size 250 --steps 100 [--out design.png]
    fdtd2d datagen --samples 1000 --size 250 --out data.npz
    fdtd2d train   --data data.npz --epochs 100 [--ckpt-dir ckpts]
    fdtd2d bench
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load_scene(args, black_point=10.0):
    """Build the :class:`~fdtd2d_tpu.core.grid.Scene` a subcommand runs on."""
    from fdtd2d_tpu.core.grid import Scene

    return Scene.from_image(getattr(args, "structure", None), args.size,
                            args.size, dx=args.dx, black_point=black_point)


def cmd_fdtd(args):
    import jax.numpy as jnp

    from fdtd2d_tpu.core.guards import check_courant
    from fdtd2d_tpu.fdtd.simulate import simulate, FDTDConfig
    from fdtd2d_tpu.viz.render import render_video

    scene = _load_scene(args)
    courant = check_courant(scene.eps, scene.mu, args.dt, scene.dx)
    print(f"courant number: {courant:.4f}")
    cfg = FDTDConfig(dt=args.dt, dx=scene.dx, nsteps=args.steps,
                     source_xy=(args.size // 2, args.size // 2),
                     source_fc=args.fc, nframes=args.frames,
                     backend=args.backend)
    (Ez, _, _), snaps = simulate(scene.eps, scene.mu, cfg)
    print(f"max |Ez| = {float(jnp.max(jnp.abs(Ez))):.4e}")
    if args.video and snaps is not None:
        out = render_video(np.asarray(snaps), np.asarray(scene.eps), args.video, fps=15)
        print(f"wrote {out}")


def cmd_fdfd(args):
    import jax.numpy as jnp

    from fdtd2d_tpu.core.guards import check_resolution
    from fdtd2d_tpu.viz.render import plot_Ez

    scene = _load_scene(args, black_point=3.0)
    check_resolution(scene.eps, scene.mu, args.omega, scene.dx)
    source = scene.point_source(args.size // 5, args.size // 5)
    if args.solver == "direct":
        from fdtd2d_tpu.fdfd.direct import DirectSolver

        solver = DirectSolver(np.asarray(scene.eps), np.asarray(scene.mu),
                              scene.dx, scene.dx, args.omega)
        x, trace = solver.solve(np.asarray(source), rhs_scale=args.omega,
                                refine_target=args.tol)
        Ez = np.asarray(jnp.real(x))
        print(f"relative residual: {trace[-1]:.3e} "
              f"(f64 iterate: {trace[-2]:.3e})")
    elif args.solver == "timedomain":
        from fdtd2d_tpu.fdfd.timedomain import TimeDomainSolver

        solver = TimeDomainSolver(np.asarray(scene.eps), np.asarray(scene.mu),
                                  scene.dx, scene.dx, args.omega)
        x, trace = solver.solve(np.asarray(source), rhs_scale=args.omega,
                                refine_target=args.tol)
        Ez = np.asarray(jnp.real(x))
        print(f"relative residual: {trace[-1]:.3e} "
              f"(f64 iterate: {trace[-2]:.3e}; "
              f"{solver.steps_per_apply} wave steps/apply)")
    else:
        from fdtd2d_tpu.fdfd.solver import run_fdfd

        res = run_fdfd(scene.eps, scene.mu, scene.dx, scene.dx, args.omega,
                       source,
                       rhs_scale=args.omega,  # reference convention (fdfd.py:112)
                       tol=args.tol, maxiter=args.maxiter)
        Ez = np.asarray(jnp.real(res.x))
        print(f"relative residual: {float(res.relative_residual):.3e}")
    if args.out:
        m = float(np.abs(Ez).max()) or 1.0
        plot_Ez(Ez, np.asarray(scene.eps), args.out, vmax=m, vmin=-m)
        print(f"wrote {args.out}")


def cmd_tiled(args):
    from fdtd2d_tpu.fdfd.tiled import run_fdfd_tiled, generate_patches, bfs_order
    from fdtd2d_tpu.viz.render import plot_Ez

    scene = _load_scene(args, black_point=3.0)
    source = np.asarray(scene.point_source(args.size // 2, args.size // 2))
    if args.plot_patches:
        from fdtd2d_tpu.viz.plots import plot_patch_distances

        W = args.patch_size + 2 * args.padding
        origins = generate_patches(args.size, args.size, args.patch_size,
                                   args.padding)
        dists = bfs_order(origins, W, source, halo=10)
        plot_patch_distances(origins, dists, W, scene.shape,
                             args.plot_patches, source=source)
        print(f"wrote {args.plot_patches}")
    sol, trace = run_fdfd_tiled(
        np.asarray(scene.eps), np.asarray(scene.mu), scene.dx, scene.dx,
        args.omega, source, mode=args.mode,
        patch_size=args.patch_size, padding=args.padding,
        refine_target=args.refine_target or None, verbose=True)
    print(f"convergence trace: {[f'{t:.2e}' for t in trace]}")
    if args.out:
        import jax.numpy as jnp

        Ez = np.asarray(jnp.real(sol))
        m = float(np.abs(Ez).max()) or 1.0
        plot_Ez(Ez, np.asarray(scene.eps), args.out, vmax=m, vmin=-m)
        print(f"wrote {args.out}")


def cmd_invdes(args):
    from fdtd2d_tpu.apps.inverse_design import (decade_lowpass_problem,
                                                lowpass_problem, optimize)
    from fdtd2d_tpu.viz.plots import plot_frequency_response

    if args.decade:
        problem = decade_lowpass_problem(N=max(args.size, 848),
                                         n_freqs=args.freqs,
                                         tol=args.tol, maxiter=args.maxiter)
    else:
        problem = lowpass_problem(N=args.size, n_freqs=args.freqs,
                                  tol=args.tol, maxiter=args.maxiter)
    design, responses, history = optimize(
        problem, steps=args.steps, lr=args.lr,
        callback=lambda s, v, d: print(f"step {s}: loss {v:.6f}"))
    print(f"final loss: {history[-1]:.6f}")
    if args.out:
        plot_frequency_response(problem.omegas, np.asarray(responses),
                                np.asarray(problem.ideal_response), args.out)
        print(f"wrote {args.out}")


def cmd_datagen(args):
    import jax

    from fdtd2d_tpu.models.datagen import (generate_dataset,
                                           generate_dataset_shards,
                                           save_dataset)

    if args.shard_size:
        # resumable sharded run: --out names a DIRECTORY of shard_*.npz;
        # train/report accept it directly (models.datagen.load_dataset)
        n = generate_dataset_shards(
            jax.random.PRNGKey(args.seed), args.samples,
            (args.size, args.size), args.out, shard_size=args.shard_size,
            batch=args.batch, compact=args.compact, pml_thickness=args.pml)
        print(f"wrote {n} new shard(s) to {args.out}/")
        return
    data = generate_dataset(jax.random.PRNGKey(args.seed), args.samples,
                            (args.size, args.size), batch=args.batch,
                            pml_thickness=args.pml)
    worst = float(np.max(np.asarray(data["residuals"])))
    print(f"{args.samples} samples; worst solve residual {worst:.2e}")
    save_dataset(args.out, data, compact=args.compact)
    print(f"wrote {args.out}")


def cmd_train(args):
    import os

    import jax
    import jax.numpy as jnp

    from fdtd2d_tpu.models.train import TrainConfig, train

    from fdtd2d_tpu.models.datagen import load_dataset

    compact = args.device_cache == "compact"
    # plain npz, compact npz, or shard dir; compact cache keeps raw masks
    raw = load_dataset(args.data, decode=not compact)
    keys = ("eps", "mu", "src", "omega", "Ez")
    if compact:
        data = raw                          # uint8 masks; train() decodes
    elif args.stream_chunk or args.device_cache:
        data = {k: raw[k] for k in keys}    # host numpy; train() transfers
    else:
        data = {k: jnp.asarray(raw[k]) for k in keys}
    cfg = TrainConfig(lr=args.lr, batch_size=args.batch, num_epochs=args.epochs,
                      ckpt_dir=args.ckpt_dir,
                      prediction_type=args.prediction_type,
                      t_sampling=args.t_sampling,
                      loss_weighting=args.weighting,
                      ema_decay=args.ema_decay, augment=args.augment,
                      ckpt_every=args.ckpt_every,
                      max_dispatch_steps=args.max_dispatch_steps,
                      compute_dtype=args.compute_dtype)
    print(f"recipe: prediction_type={cfg.prediction_type} "
          f"t_sampling={cfg.t_sampling} weighting={cfg.loss_weighting} "
          f"ema_decay={cfg.ema_decay} augment={cfg.augment} "
          f"compute_dtype={cfg.compute_dtype}")

    eval_callback = holdout_callback = None
    if args.eval_every:
        from fdtd2d_tpu.viz.plots import plot_noisy_sample, plot_ref_v_inference

        os.makedirs(args.eval_dir, exist_ok=True)

        # the reference's noise-schedule grid (diffusion_training.py:215-235,
        # its diffusion_data.png): dataset sample 0 across forward-noising
        # timesteps
        from fdtd2d_tpu.models.diffusion import DDPMSchedule

        sched = DDPMSchedule.create(cfg.num_train_timesteps)
        ez0 = jnp.asarray(np.asarray(raw["Ez"][0]), jnp.float32)
        ez0 = ez0 / (float(np.std(np.asarray(raw["Ez"][0]))) + 1e-30)
        ts = np.linspace(0, cfg.num_train_timesteps - 1, 6).astype(int)
        frames = jnp.stack([
            sched.add_noise(ez0[None], jax.random.normal(
                jax.random.PRNGKey(t), ez0[None].shape), jnp.asarray([t]))[0]
            for t in ts])
        noisy_path = os.path.join(args.eval_dir, "noise_schedule.png")
        plot_noisy_sample(np.asarray(frames), noisy_path)
        print(f"wrote {noisy_path}")

        def eval_callback(epoch, pred, true):
            path = os.path.join(args.eval_dir, f"eval_epoch_{epoch:05d}.png")
            plot_ref_v_inference(true, pred, path)
            print(f"epoch {epoch}: wrote {path}")

        metrics_path = os.path.join(args.eval_dir, "holdout_metrics.csv")

        def holdout_callback(epoch, rel):
            line = (f"{epoch},{float(np.mean(rel)):.6f},"
                    f"{float(np.median(rel)):.6f},{float(np.min(rel)):.6f}")
            with open(metrics_path, "a") as fh:
                fh.write(line + "\n")
            print(f"epoch {epoch}: holdout rel-L2 mean {np.mean(rel):.4f} "
                  f"median {np.median(rel):.4f}")

    state, losses, _scales = train(
        jax.random.PRNGKey(args.seed), data, cfg,
        eval_every=args.eval_every, eval_callback=eval_callback,
        stream_chunk=args.stream_chunk, holdout=args.holdout,
        holdout_callback=holdout_callback,
        device_dtype=("compact" if compact
                      else jnp.float16 if args.device_cache else None),
        callback=lambda e, l, s: print(f"epoch {e}: loss {l:.6f}", flush=True))
    print(f"final loss {losses[-1]:.6f}")


def cmd_infer(args):
    """Restore a checkpoint (weights + normalization scales) and run DDPM
    inference on a scene — no access to the training data required."""
    import jax
    import jax.numpy as jnp

    from fdtd2d_tpu.models.diffusion import DDPMSchedule
    from fdtd2d_tpu.models.train import (TrainConfig, create_state, ema_state,
                                         inference, restore_checkpoint)
    from fdtd2d_tpu.viz.plots import plot_ref_v_inference
    from fdtd2d_tpu.viz.render import plot_Ez

    raw = np.load(args.data)
    i = args.index
    eps, mu, src = (jnp.asarray(raw[k][i])[None] for k in ("eps", "mu", "src"))
    omega = jnp.asarray(raw["omega"][i]).reshape(1)

    cfg = TrainConfig(ckpt_dir=args.ckpt_dir)
    state = create_state(jax.random.PRNGKey(0), eps.shape[1:], cfg)
    state, epoch, scales = restore_checkpoint(args.ckpt_dir, state)
    if epoch == 0:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    if scales is None:
        raise SystemExit("checkpoint has no normalization scales (pre-scales "
                         "format); re-save with models.train.save_checkpoint")
    schedule = DDPMSchedule.create(cfg.num_train_timesteps)
    # EMA-trained checkpoints read out through the EMA iterate (no-op otherwise)
    pred = inference(ema_state(state), schedule, jax.random.PRNGKey(args.seed),
                     eps, mu, src, omega, scales=scales,
                     num_inference_steps=args.steps,
                     prediction_type=args.prediction_type,
                     t_start=args.t_start)
    pred = np.asarray(pred[0])
    print(f"restored epoch {epoch - 1}; predicted field std {pred.std():.3e}")
    if "Ez" in raw.files:
        plot_ref_v_inference(raw["Ez"][i], pred, args.out)
    else:
        m = float(np.abs(pred).max()) or 1.0
        plot_Ez(pred, np.asarray(raw["eps"][i]), args.out, vmax=m, vmin=-m)
    print(f"wrote {args.out}")


def cmd_bench(args):
    del args
    import runpy
    import pathlib

    runpy.run_path(str(pathlib.Path(__file__).resolve().parents[1] / "bench.py"),
                   run_name="__main__")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fdtd2d", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    f = sub.add_parser("fdtd", help="time-domain rollout")
    f.add_argument("--size", type=int, default=200)
    f.add_argument("--steps", type=int, default=1000)
    f.add_argument("--dt", type=float, default=5e-14)
    f.add_argument("--dx", type=float, default=1e-4)
    f.add_argument("--fc", type=float, default=30e9)
    f.add_argument("--frames", type=int, default=200)
    f.add_argument("--structure", type=str, default=None)
    f.add_argument("--backend", type=str, default="auto")
    f.add_argument("--video", type=str, default=None)
    f.set_defaults(fn=cmd_fdtd)

    f = sub.add_parser("fdfd", help="steady-state solve")
    f.add_argument("--size", type=int, default=512)
    f.add_argument("--omega", type=float, default=17e9)
    f.add_argument("--dx", type=float, default=1e-3)
    f.add_argument("--tol", type=float, default=1e-6)
    f.add_argument("--maxiter", type=int, default=1000)
    f.add_argument("--solver", type=str, default="krylov",
                   choices=["krylov", "direct", "timedomain"],
                   help="krylov: FDM-FGMRES (scales past the direct "
                        "solver's memory); direct: exact sublattice "
                        "block-Thomas factorization (any contrast); "
                        "timedomain: frequency-locked wave run to steady "
                        "state (wavelength-robust, no factor memory)")
    f.add_argument("--structure", type=str, default=None)
    f.add_argument("--out", type=str, default="Ez.png")
    f.set_defaults(fn=cmd_fdfd)

    f = sub.add_parser("tiled", help="domain-decomposed solve")
    f.add_argument("--size", type=int, default=512)
    f.add_argument("--omega", type=float, default=17e9)
    f.add_argument("--dx", type=float, default=1e-3)
    f.add_argument("--mode", type=str, default="krylov",
                   choices=["krylov", "additive", "multiplicative"])
    f.add_argument("--patch-size", type=int, default=100)
    f.add_argument("--padding", type=int, default=30)
    f.add_argument("--refine-target", type=float, default=1e-6,
                   help="true-f64-residual target for iterative refinement "
                        "(krylov mode; 0 disables refinement)")
    f.add_argument("--structure", type=str, default=None)
    f.add_argument("--out", type=str, default="Ez_tiled.png")
    f.add_argument("--plot-patches", type=str, default=None,
                   help="write the BFS patch-distance diagnostic map here")
    f.set_defaults(fn=cmd_tiled)

    f = sub.add_parser("invdes", help="inverse design (low-pass filter)")
    f.add_argument("--size", type=int, default=250)
    f.add_argument("--steps", type=int, default=100)
    f.add_argument("--freqs", type=int, default=10)
    f.add_argument("--lr", type=float, default=0.05)
    f.add_argument("--tol", type=float, default=1e-6)
    f.add_argument("--maxiter", type=int, default=400)
    f.add_argument("--decade", action="store_true",
                   help="the reference's full 10-100 GHz sweep on a grid "
                        "fine enough for 100 GHz (N >= 848)")
    f.add_argument("--out", type=str, default="frequency_response.png")
    f.set_defaults(fn=cmd_invdes)

    f = sub.add_parser("datagen", help="surrogate training data")
    f.add_argument("--samples", type=int, default=1000)
    f.add_argument("--size", type=int, default=250)
    f.add_argument("--batch", type=int, default=64)
    f.add_argument("--pml", type=int, default=40)
    f.add_argument("--seed", type=int, default=0)
    f.add_argument("--out", type=str, default="data.npz",
                   help="output npz; a DIRECTORY of shards with --shard-size")
    f.add_argument("--compact", action="store_true",
                   help="mask-encoded npz (~3x smaller; eps/src are binary "
                        "and mu is constant, so the encoding is lossless)")
    f.add_argument("--shard-size", type=int, default=0,
                   help="write resumable shard_*.npz files of this many "
                        "samples to --out (a directory) instead of one npz")
    f.set_defaults(fn=cmd_datagen)

    f = sub.add_parser("train", help="diffusion surrogate training")
    f.add_argument("--data", type=str, required=True)
    f.add_argument("--epochs", type=int, default=100)
    f.add_argument("--batch", type=int, default=8)
    f.add_argument("--lr", type=float, default=3e-5)
    f.add_argument("--seed", type=int, default=0)
    f.add_argument("--ckpt-dir", type=str, default=None)
    f.add_argument("--eval-every", type=int, default=0,
                   help="write a true-vs-predicted panel every N epochs")
    f.add_argument("--eval-dir", type=str, default="eval_panels")
    f.add_argument("--stream-chunk", type=int, default=0,
                   help="stream the dataset from host in chunks of this many "
                        "samples (multiple of --batch; for datasets past HBM)")
    f.add_argument("--holdout", type=int, default=0,
                   help="withhold the last N samples from training and report "
                        "per-eval-epoch relative-L2 of predicted vs true Ez")
    f.add_argument("--device-cache", nargs="?", const="f16", default=None,
                   choices=("f16", "compact"),
                   help="keep the whole dataset on device — epochs run at "
                        "compute speed with no per-epoch host streaming. "
                        "'f16' (the bare-flag default) stores normalized "
                        "inputs in float16; 'compact' stores uint8 masks + "
                        "f16 labels (4 B/px: 50k scenes at 256² in 16 GB "
                        "HBM) and requires compact-stored data")
    f.add_argument("--prediction-type", choices=("epsilon", "x0", "regression"),
                   default="epsilon",
                   help="model target: the added noise (reference recipe) or "
                        "the clean field; 'x0' is the recipe that generates "
                        "scene-locked fields (see diffusion.loss_weight)")
    f.add_argument("--t-sampling", choices=("snr", "uniform"), default="snr",
                   help="timestep sampling: SNR^1.3 importance (reference) "
                        "or uniform over all noise levels")
    f.add_argument("--weighting", choices=("snr_gamma", "min_snr", "uniform"),
                   default="snr_gamma", help="per-timestep loss weight")
    f.add_argument("--ema-decay", type=float, default=0.0,
                   help="track an EMA of the params (e.g. 0.999) and read "
                        "eval/holdout/inference through it — the standard "
                        "diffusion variance-reduction; 0 disables")
    f.add_argument("--augment", action="store_true",
                   help="exact D4 scene/field augmentation: random "
                        "flip/rotation per sample, up to 8x the effective "
                        "unique-scene count (models/augment.py)")
    f.add_argument("--ckpt-every", type=int, default=10,
                   help="checkpoint cadence in epochs; lower it for long "
                        "runs on a flaky device so a crash-resume loses "
                        "less work (resume is automatic from --ckpt-dir)")
    f.add_argument("--max-dispatch-steps", type=int, default=1024,
                   help="cap on train steps per device dispatch; whole-"
                        "epoch dispatches past ~4 device-minutes crash the "
                        "tunneled TPU worker (TrainConfig.max_dispatch_steps)")
    f.add_argument("--compute-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="UNet conv/dense math dtype; bfloat16 is standard "
                        "mixed precision (f32 master params, BatchNorm "
                        "stats, 1x1 head, loss) — one MXU pass per matmul")
    f.set_defaults(fn=cmd_train)

    f = sub.add_parser("infer", help="restore a checkpoint and predict a field")
    f.add_argument("--ckpt-dir", type=str, required=True)
    f.add_argument("--data", type=str, required=True,
                   help="npz with eps/mu/src/omega (Ez optional, for a panel)")
    f.add_argument("--index", type=int, default=0)
    f.add_argument("--steps", type=int, default=50)
    f.add_argument("--seed", type=int, default=0)
    f.add_argument("--out", type=str, default="inference.png")
    f.add_argument("--prediction-type", choices=("epsilon", "x0", "regression"),
                   default="epsilon",
                   help="must match the recipe the checkpoint was trained "
                        "with (recorded in the training log)")
    f.add_argument("--t-start", type=int, default=None,
                   help="truncate the chain to timesteps <= t_start")
    f.set_defaults(fn=cmd_infer)

    f = sub.add_parser("bench", help="headline benchmark (one JSON line)")
    f.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    # minutes-long first compiles on the remote-compile stack are paid once,
    # then every later process reloads the executable from disk
    from fdtd2d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
