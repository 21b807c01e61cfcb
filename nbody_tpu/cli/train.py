"""Training CLI — the reference's train.py workflow, TPU-native.

Usage (flag-compatible with reference utils.py:242-271):
    python -m nbody_tpu.cli.train                     # defaults (set model)
    python -m nbody_tpu.cli.train -i 10000 -b 8 -s 98765
    python -m nbody_tpu.cli.train -c 6 64 64 128 32 3 -n denser_layer_test -d 4
    python -m nbody_tpu.cli.train -k 14 --model shiftinv --cells 16 --synthetic

Reference driver: train.py:1-184.  Differences: restore works (-r), graph
models are actually wired in (the reference commented them out,
train.py:48), metrics go to metrics.jsonl, checkpoints are orbax.
"""

from __future__ import annotations

import time

import numpy as np

from nbody_tpu import config as C
from nbody_tpu.data.dataset import make_dataset
from nbody_tpu.io_.saver import Saver
from nbody_tpu.train.trainer import Trainer


def main(argv=None) -> int:
    args = C.build_parser().parse_args(argv)
    C.apply_platform(args.platform)
    C.enable_compilation_cache()
    cfg = C.config_from_args(args)

    saver = Saver(cfg.data.data_idx, model_tag=cfg.train.name,
                  experiments_dir=cfg.train.experiments_dir)
    dataset = make_dataset(cfg.data)
    trainer = Trainer(cfg, dataset=dataset, saver=saver)

    if cfg.train.restore:
        trainer.state = saver.restore_checkpoint(trainer.state)
        trainer.place_state()
        print(f"Restored checkpoint at step {int(trainer.state.step)}")

    print(f"\nTraining ({cfg.model.family}, N={dataset.num_particles}, "
          f"b={cfg.train.batch_size}):\n{'=' * 78}")
    t0 = time.time()
    trace_dir = getattr(args, "trace", "")
    if trace_dir:
        import jax
        jax.profiler.start_trace(trace_dir)
    try:
        if cfg.train.scan_chunk > 0:
            trainer.fit_scan(scan_chunk=cfg.train.scan_chunk)
        else:
            trainer.fit()
    finally:
        if trace_dir:
            import jax
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {trace_dir}")
    print(f"Training finished!\n\tElapsed time: {(time.time() - t0) / 60:.2f}m")
    saver.save_checkpoint(trainer.state, int(trainer.state.step))
    if trainer.train_error_history:
        # per-checkpoint training-error series (reference train.py:117-120,
        # utils.py:488-498 with training=True)
        saver.save_error(np.asarray(trainer.train_error_history, np.float32),
                         training=True)

    print(f"\nEvaluation:\n{'=' * 78}")
    test_error, test_predictions = trainer.evaluate("test")
    saver.save_cube(test_predictions)
    saver.save_error(test_error)
    saver.print_evaluation_results(test_error)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
