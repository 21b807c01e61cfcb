"""Dataset loading, feature extraction, seeded splits, batching.

Reference twin: utils.py:547-621 (Dataset class).  Differences, by design:
  * Batch sampling uses `jax.random` keys (reproducible, device-friendly)
    instead of global `np.random.choice` (reference utils.py:563).
  * Falls back to the synthetic generator when no ZA_*.npy exists.
  * Exposes normalized [0,1) particle positions for the graph models —
    the reference left the graph pipeline unwired with inconsistent
    coordinate conventions (SURVEY.md §3.2).
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu import config as C
from nbody_tpu.data.grid import grid_positions_np
from nbody_tpu.data.synthetic import synthetic_raw_cubes


def load_cube_file(path: str) -> np.ndarray:
    """np.load a raw (S, C, C, C, 19) cube file."""
    return np.load(path)


def features_from_raw(raw: np.ndarray, include_velocity: bool = False) -> np.ndarray:
    """Raw (S, C, C, C, 19) -> features.

    Default (S, N, 9): [q - box/2 (3), za_disp (3), fpm_disp - za_disp (3)]
    exactly as the reference assembles X (utils.py:606-619): the target
    residual is fpm - za, and the grid is centered by -64.

    include_velocity=True -> (S, N, 15): inputs [q - box/2, za_disp, za_vel]
    (9) and targets [fpm_disp - za_disp, fpm_vel - za_vel] (6) — the joint
    position+velocity task (BASELINE.json config 4; the reference sketched
    velocity handling only in commented code, graph.py:517-567).
    """
    s, cx, cy, cz, _ = raw.shape
    assert cx == cy == cz, "cubes must be cubic"
    n = cx * cy * cz
    box = 4.0 * cx  # real data: 32 cells, box 128
    za = raw[..., C.COL_ZA_DISP].reshape(s, n, 3)
    fpm = raw[..., C.COL_FPM_DISP].reshape(s, n, 3) - za
    q = grid_positions_np(cx, box=box)
    q_centered = np.broadcast_to(q[None] - box / 2.0, za.shape)
    if not include_velocity:
        return np.concatenate([q_centered, za, fpm], axis=-1).astype(np.float32)
    za_vel = raw[..., C.COL_ZA_VEL].reshape(s, n, 3)
    fpm_vel = raw[..., C.COL_FPM_VEL].reshape(s, n, 3) - za_vel
    return np.concatenate([q_centered, za, za_vel, fpm, fpm_vel],
                          axis=-1).astype(np.float32)


def split_dataset(x: np.ndarray, num_test: int, num_val: int = C.NUM_VAL_SAMPLES,
                  seed: int = C.DATASET_SEED):
    """Seeded permutation split -> (train, val, test).

    Bit-identical to the reference's split (utils.py:574-591): legacy
    RandomState permutation, split indices [-num_test-num_val, -num_test].
    """
    rs = np.random.RandomState(seed)
    rnd_idx = rs.permutation(x.shape[0])
    split_idx = [-num_test - num_val, -num_test]
    return np.split(x[rnd_idx], split_idx, axis=0)


class Dataset:
    """Holds train/val/test feature arrays and provides batching.

    Attrs
    -----
    X_train, X_val, X_test : np.ndarray (S_i, N, 9)
    cells : cube cells per side; box = 4 * cells
    """

    def __init__(self, cfg: Optional[C.DataConfig] = None, raw: Optional[np.ndarray] = None):
        cfg = cfg or C.DataConfig()
        self.cfg = cfg
        if raw is None:
            raw = self._load_raw(cfg)
        self.cells = raw.shape[1]
        self.box = 4.0 * self.cells
        self.num_input_channels = 9 if cfg.include_velocity else 6
        x = features_from_raw(raw, include_velocity=cfg.include_velocity)
        num_test = min(cfg.num_test, max(1, x.shape[0] - cfg.num_val - 2))
        num_val = min(cfg.num_val, max(1, x.shape[0] - num_test - 1))
        self.X_train, self.X_val, self.X_test = split_dataset(
            x, num_test, num_val, cfg.seed)

    @staticmethod
    def _load_raw(cfg: C.DataConfig) -> np.ndarray:
        paths = sorted(glob.glob(os.path.join(cfg.data_dir, "*.npy")))
        if paths:
            if not 0 <= cfg.data_idx < len(paths):
                raise IndexError(
                    f"data_idx {cfg.data_idx} out of range: {len(paths)} "
                    f"dataset files in {cfg.data_dir}")
            return load_cube_file(paths[cfg.data_idx])
        print(f"No .npy cubes in {cfg.data_dir} — generating synthetic data "
              f"({cfg.synthetic_num_samples} x {cfg.cells_per_side}^3; "
              "disk-cached per (samples, cells, seed, rms)).")
        return synthetic_raw_cubes(
            num_samples=cfg.synthetic_num_samples, cells=cfg.cells_per_side,
            seed=cfg.seed)

    @property
    def num_particles(self) -> int:
        return self.X_train.shape[1]

    def get_minibatch_indices(self, key: jax.Array,
                              batch_size: int = C.BATCH_SIZE) -> np.ndarray:
        """Sample indices (without replacement) of one minibatch.

        Split out of get_minibatch so the device-resident-data path
        (Trainer.fit_scan with device_data) can ship ONLY these int32
        indices per step; the threefry math is backend-invariant, so both
        paths draw the identical batch sequence from the same key."""
        n = self.X_train.shape[0]
        idx = jax.random.choice(key, n, (batch_size,), replace=False)
        return np.asarray(idx)

    def get_minibatch(self, key: jax.Array, batch_size: int = C.BATCH_SIZE) -> np.ndarray:
        """Random minibatch without replacement (reference utils.py:559-566)."""
        return self.X_train[self.get_minibatch_indices(key, batch_size)]

    def sequential_batches(self, split: str, batch_size: int):
        """Yield (start, batch) slices over val/test (reference train.py:140-151)."""
        x = {"val": self.X_val, "test": self.X_test, "train": self.X_train}[split]
        for j in range(x.shape[0] // batch_size):
            p = batch_size * j
            yield p, x[p:p + batch_size]


class StreamingDataset:
    """Disk-backed dataset using the native mmap loader (data/native_loader).

    The reference loads the whole (1000, 32, 32, 32, 19) file into RAM and
    copies fancy-indexed minibatches per step (utils.py:559-621).  Here the
    train split stays on disk: the native loader mmaps the file and
    prefetches the NEXT minibatch's raw rows on a background thread while
    the device runs the current step.  Val/test splits are small
    (num_val + num_test samples) and are featurized once up front, so the
    eval interface matches Dataset.
    """

    def __init__(self, path: str, cfg: Optional[C.DataConfig] = None):
        from nbody_tpu.data.native_loader import NpyLoader, PrefetchingSampler
        cfg = cfg or C.DataConfig()
        self.cfg = cfg
        self._loader = NpyLoader(path)
        s = self._loader.shape[0]
        self.cells = self._loader.shape[1]
        self.box = 4.0 * self.cells
        num_test = min(cfg.num_test, max(1, s - cfg.num_val - 2))
        num_val = min(cfg.num_val, max(1, s - num_test - 1))
        rs = np.random.RandomState(cfg.seed)
        perm = rs.permutation(s)
        self._train_idx = perm[:s - num_test - num_val]
        val_idx = perm[s - num_test - num_val:s - num_test]
        test_idx = perm[s - num_test:]
        self.num_input_channels = 9 if cfg.include_velocity else 6
        self.X_val = features_from_raw(self._loader.gather(val_idx),
                                       include_velocity=cfg.include_velocity)
        self.X_test = features_from_raw(self._loader.gather(test_idx),
                                        include_velocity=cfg.include_velocity)
        self._sampler = None
        self._PrefetchingSampler = PrefetchingSampler

    @property
    def num_particles(self) -> int:
        return self.cells ** 3

    def get_minibatch(self, key: jax.Array, batch_size: int = C.BATCH_SIZE) -> np.ndarray:
        """Next prefetched minibatch, featurized.  The key argument is kept
        for interface parity; the native sampler owns the RNG stream (its
        seed derives from the dataset seed)."""
        if self._sampler is None or self._sampler.batch_size != batch_size:
            self._sampler = self._PrefetchingSampler(
                self._loader, self._train_idx, batch_size, seed=self.cfg.seed)
        return features_from_raw(self._sampler.next(),
                                 include_velocity=self.cfg.include_velocity)

    def sequential_batches(self, split: str, batch_size: int):
        x = {"val": self.X_val, "test": self.X_test}[split]
        for j in range(x.shape[0] // batch_size):
            p = batch_size * j
            yield p, x[p:p + batch_size]


def make_dataset(cfg: Optional[C.DataConfig] = None):
    """Dataset factory: the CLI entry for `--streaming`.

    streaming=True + a real cube file on disk -> StreamingDataset (native
    mmap loader, background prefetch); otherwise the in-memory Dataset
    (with a note when streaming was requested but cannot be honored).
    """
    cfg = cfg or C.DataConfig()
    if cfg.streaming:
        paths = sorted(glob.glob(os.path.join(cfg.data_dir, "*.npy")))
        if paths and 0 <= cfg.data_idx < len(paths):
            try:
                return StreamingDataset(paths[cfg.data_idx], cfg)
            except Exception as e:  # NativeLoaderUnavailable, bad header, ...
                print(f"--streaming unavailable ({e}); "
                      "falling back to the in-memory Dataset.")
        else:
            print("--streaming needs a real .npy cube file (synthetic data "
                  "is generated in RAM); falling back to the in-memory "
                  "Dataset.")
    return Dataset(cfg)


def split_batch(batch: jnp.ndarray,
                num_inputs: int = 6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(b, N, 9|15) -> inputs [q-64, za(, za_vel)], target residual(s).

    Mirrors reference train.py:95-96; num_inputs=9 for the velocity task.
    """
    return batch[..., :num_inputs], batch[..., num_inputs:]


def positions_from_inputs(x_in: jnp.ndarray, box: float) -> jnp.ndarray:
    """Normalized [0,1) particle positions from model inputs (b, N, 6).

    Positions = grid + ZA displacement, wrapped into the periodic unit box.
    This is the graph-model coordinate convention: the reference intended
    kNN over displaced positions in a [0,1] box (graph.py:896-917) but never
    normalized; we fix the convention here.
    """
    q = x_in[..., :3] + box / 2.0         # undo the -box/2 centering
    pos = q + x_in[..., 3:6]              # + ZA displacement
    return jnp.mod(pos / box, 1.0)
