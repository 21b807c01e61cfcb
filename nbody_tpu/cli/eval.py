"""Standalone evaluation CLI: restore a checkpoint, evaluate, plot.

Completes the workflow the reference split between train.py (eval loop) and
visualization/plot_eval.py (offline histograms): restore the latest
checkpoint of a named experiment (the reference could not restore at all,
utils.py:481-482), run the test sweep, save the result cube in the
reference layout, and render the L2-distance histogram vs the
linear-velocity baseline.

Usage:
    python -m nbody_tpu.cli.eval -n mymodel [--plot out.png] [usual flags]
"""

from __future__ import annotations

import os

import numpy as np

from nbody_tpu import config as C
from nbody_tpu.data.dataset import make_dataset
from nbody_tpu.io_.saver import Saver
from nbody_tpu.train.trainer import Trainer


def main(argv=None) -> int:
    p = C.build_parser()
    p.add_argument("--plot", type=str, default="",
                   help="Save an L2-distance histogram PNG to this path")
    args = p.parse_args(argv)
    C.apply_platform(args.platform)
    C.enable_compilation_cache()
    cfg = C.config_from_args(args)
    if not args.name:
        p.error("-n/--name is required to locate the experiment")

    saver = Saver(cfg.data.data_idx, model_tag=cfg.train.name,
                  experiments_dir=cfg.train.experiments_dir)
    dataset = make_dataset(cfg.data)
    trainer = Trainer(cfg, dataset=dataset, saver=saver)
    trainer.state = saver.restore_checkpoint(trainer.state)
    trainer.place_state()
    print(f"Restored checkpoint at step {int(trainer.state.step)}")

    test_error, test_predictions = trainer.evaluate("test")
    saver.save_cube(test_predictions)
    saver.save_error(test_error)
    saver.print_evaluation_results(test_error)

    if args.plot:
        from nbody_tpu.viz.plot_eval import plot_model_vs_linear
        plot_model_vs_linear(test_predictions[0][..., :3],
                             test_predictions[1][..., :3],
                             title=saver.name, save_path=args.plot)
        print(f"Saved plot: {args.plot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
