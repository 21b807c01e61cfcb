"""Redshift-chain CLI: train per-pair models, evaluate the chained rollout.

The reference's multi-step capability existed only in eval plumbing
(per-pair models named 'X_{zx}-{zy}_{tag}', chained comparisons in
visualization/plot_eval.py:210-246).  This driver makes it first-class:

  1. train one model per adjacent redshift pair (z_i -> z_{i+1}) — the same
     architecture, so parameters stack;
  2. jit ONE lax.scan rollout across the whole chain (train/rollout.py);
  3. report per-step rollout position MSE (the BASELINE.json rollout
     metric) and save the trajectory cube.

With synthetic data, each pair's "snapshot" is generated with a
growth-scaled displacement amplitude so successive steps are correlated —
a stand-in for the real multi-snapshot simulation files.

Usage:
    python -m nbody_tpu.cli.rollout --steps 4 -i 200 -b 2 --cells 8 --synthetic
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu import config as C
from nbody_tpu.data.dataset import Dataset, split_batch
from nbody_tpu.data.synthetic import synthetic_raw_cubes
from nbody_tpu.io_.saver import Saver
from nbody_tpu.physics.losses import loss_za
from nbody_tpu.train.rollout import make_rollout, stack_params
from nbody_tpu.train.trainer import Trainer


def build_chain_parser():
    p = C.build_parser()
    p.add_argument("--steps", type=int, default=4,
                   help="Number of redshift pairs in the chain (max 19)")
    return p


def synthetic_chain_raw(num_samples: int, cells: int, steps: int, seed: int):
    """Per-step raw cubes with growth-scaled ZA amplitude: step t trains on
    (za_t -> fpm_t) where amplitudes grow along the chain like structure
    growth between redshift snapshots."""
    return [synthetic_raw_cubes(num_samples=num_samples, cells=cells,
                                seed=seed, za_rms=0.6 + 0.15 * t)
            for t in range(steps)]


def main(argv=None) -> int:
    args = build_chain_parser().parse_args(argv)
    C.apply_platform(args.platform)
    cfg = C.config_from_args(args)
    steps = min(args.steps, len(C.REDSHIFTS) - 1)

    saver = Saver(cfg.data.data_idx, model_tag=cfg.train.name or "chain",
                  experiments_dir=cfg.train.experiments_dir)

    raws = synthetic_chain_raw(cfg.data.synthetic_num_samples,
                               cfg.data.cells_per_side, steps, cfg.data.seed)

    params_seq, model = [], None
    for t in range(steps):
        zx, zy = C.REDSHIFTS[t], C.REDSHIFTS[t + 1]
        print(f"\n=== pair {t}: z {zx} -> {zy} ===")
        ds = Dataset(cfg.data, raw=raws[t])
        trainer = Trainer(cfg, dataset=ds)
        if cfg.train.scan_chunk > 0:
            trainer.fit_scan(scan_chunk=cfg.train.scan_chunk, verbose=True)
        else:
            trainer.fit(verbose=True)
        params_seq.append(trainer.state.params)
        model = trainer.model

    stacked = stack_params(params_seq)
    # continuous coverage along the chain: displacements grow step over
    # step, so the lattice window is monitored INSIDE the jitted rollout
    # (same guard class as Trainer._make_coverage_margin_fn)
    cov_fn = None
    cells = cfg.data.cells_per_side
    # num_particles == cells^3 guard mirrors Trainer._make_coverage_margin_fn
    # (ADVICE r3): on non-cube counts the model isn't using the lattice
    # search, and lattice_violations' site reshape would raise.
    if cfg.model.family not in ("set", "attn") \
            and cfg.model.knn_method == "lattice" \
            and int(np.prod(raws[0].shape[1:4])) == cells ** 3:
        box = 4.0 * cells
        from nbody_tpu.ops.knn import lattice_violations

        def cov_fn(x_in):
            pos = x_in[..., :3] + box / 2.0 + x_in[..., 3:6]
            return lattice_violations(pos, cells, box=box,
                                      window=cfg.model.knn_window)
    rollout = make_rollout(model, coverage_fn=cov_fn)

    # rollout from the first pair's test inputs; truth chain = per-step
    # targets accumulated the same way the rollout accumulates predictions
    ds0 = Dataset(cfg.data, raw=raws[0])
    ntest = ds0.X_test.shape[0]
    x0, _ = split_batch(jnp.asarray(ds0.X_test))
    truth, hop_za = [], []
    disp = x0[..., 3:6]
    for t in range(steps):
        dst = Dataset(cfg.data, raw=raws[t])
        xt, y = split_batch(jnp.asarray(dst.X_test[:ntest]))
        disp = disp + y[..., :3]
        truth.append(disp)
        hop_za.append(xt[..., 3:6])    # hop t's ZA field (velocity proxy)
    truth = jnp.stack(truth)

    final, traj = rollout(stacked, x0)
    cov_counts = None
    if cov_fn is not None:
        traj, cov_counts = traj
        cov_counts = np.asarray(jax.device_get(cov_counts))
        if cov_counts.any():
            print(f"WARNING: lattice coverage margin violated mid-chain "
                  f"(per-step counts {cov_counts.tolist()}) — displacement "
                  "growth exceeds the search window; increase knn_window.")
    per_step_mse = np.asarray(jax.vmap(loss_za)(traj, truth))
    # per-hop linear-velocity baseline (reference plot_multiStep_comp,
    # visualization/plot_eval.py:210-246): hop t starts from the TRUE state
    # at t-1 and moves by a least-squares-fitted multiple of the hop's ZA
    # field (the linear-theory velocity proxy) — the model's per-hop
    # medians must beat this for the chain to carry real signal
    from nbody_tpu.viz.plot_eval import calculate_timestep, l2_dist
    truth_np, traj_np = np.asarray(truth), np.asarray(traj)
    med_model, med_lin, med_lin_chain = [], [], []
    lin_chain = np.asarray(x0[..., 3:6])
    for t in range(steps):
        in_disp = np.asarray(x0[..., 3:6]) if t == 0 else truth_np[t - 1]
        za_t = np.asarray(hop_za[t])
        x_input = np.concatenate([in_disp, za_t], axis=-1)
        t_fit = calculate_timestep(x_input, truth_np[t])
        lin = in_disp + t_fit * za_t
        med_lin.append(float(np.median(l2_dist(lin, truth_np[t]))))
        # the apples-to-apples baseline: an AUTOREGRESSIVE linear chain
        # that, like the model, carries its own state hop to hop (the
        # truth-reset column above is the reference's plot_multiStep_comp
        # layout, visualization/plot_eval.py:210-246, but it compares a
        # compounding model against an oracle-reset baseline — no
        # autoregressive method can win late hops under that asymmetry)
        lin_chain = lin_chain + t_fit * za_t
        med_lin_chain.append(float(np.median(l2_dist(lin_chain,
                                                     truth_np[t]))))
        med_model.append(float(np.median(l2_dist(traj_np[t], truth_np[t]))))
    print("\nRollout per chain step: position MSE, median L2 "
          "(model | truth-reset linear | autoregressive linear):")
    for t, m in enumerate(per_step_mse):
        beat = ("BEATS" if med_model[t] < med_lin_chain[t]
                else "does NOT beat")
        print(f"  step {t} (z {C.REDSHIFTS[t]:.3f} -> {C.REDSHIFTS[t+1]:.3f})"
              f" : mse {m:.6f} | med {med_model[t]:.6f} vs lin-reset "
              f"{med_lin[t]:.6f} vs lin-chain {med_lin_chain[t]:.6f} "
              f"({beat} the like-for-like baseline)")
    saver.save_cube(np.stack([truth_np, traj_np]))
    rec = {"rollout_mse": per_step_mse.tolist(), "steps": steps,
           "rollout_model_median_l2": med_model,
           "rollout_linear_median_l2": med_lin,
           "rollout_linear_chain_median_l2": med_lin_chain}
    if cov_counts is not None:
        rec["coverage_margin_violations"] = cov_counts.tolist()
    saver.append_metrics(rec)
    print(json.dumps({"rollout_final_mse": float(per_step_mse[-1]),
                      "rollout_model_median_l2": med_model,
                      "rollout_linear_median_l2": med_lin,
                      "rollout_linear_chain_median_l2": med_lin_chain}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
