import numpy as np
import jax

from nbody_tpu import config as C
from nbody_tpu.data.dataset import (
    Dataset, features_from_raw, split_dataset, split_batch, positions_from_inputs)
from nbody_tpu.data.grid import grid_positions_np
from nbody_tpu.data.synthetic import synthetic_raw_cubes


def _tiny_cfg(cells=8, num_samples=20):
    return C.DataConfig(data_dir="/nonexistent", num_test=4, num_val=3,
                        cells_per_side=cells, synthetic_num_samples=num_samples)


def test_synthetic_schema():
    raw = synthetic_raw_cubes(num_samples=2, cells=8, seed=0)
    assert raw.shape == (2, 8, 8, 8, 19)
    assert raw.dtype == np.float32
    # column 0 unused (like real data's leading column), za nonzero
    assert np.all(raw[..., 0] == 0)
    assert np.abs(raw[..., 1:4]).max() > 0


def test_features_from_raw_layout():
    raw = synthetic_raw_cubes(num_samples=3, cells=8, seed=1)
    x = features_from_raw(raw)
    assert x.shape == (3, 512, 9)
    box = 32.0
    q = grid_positions_np(8, box)
    np.testing.assert_allclose(x[0, :, :3], q - box / 2, atol=1e-6)
    za = raw[..., 1:4].reshape(3, 512, 3)
    fpm = raw[..., 7:10].reshape(3, 512, 3)
    np.testing.assert_allclose(x[..., 3:6], za, atol=1e-6)
    np.testing.assert_allclose(x[..., 6:9], fpm - za, atol=1e-5)


def test_split_seeded_and_sized():
    x = np.arange(20 * 2 * 2, dtype=np.float32).reshape(20, 2, 2)
    tr1, va1, te1 = split_dataset(x, num_test=4, num_val=3, seed=123)
    tr2, va2, te2 = split_dataset(x, num_test=4, num_val=3, seed=123)
    assert tr1.shape[0] == 13 and va1.shape[0] == 3 and te1.shape[0] == 4
    np.testing.assert_array_equal(tr1, tr2)
    np.testing.assert_array_equal(te1, te2)
    # splits are disjoint and cover everything
    all_vals = np.concatenate([tr1, va1, te1]).reshape(20, -1)[:, 0]
    assert len(np.unique(all_vals)) == 20


def test_dataset_and_minibatch():
    ds = Dataset(_tiny_cfg())
    assert ds.num_particles == 512
    key = jax.random.PRNGKey(0)
    mb = ds.get_minibatch(key, batch_size=2)
    assert mb.shape == (2, 512, 9)
    mb2 = ds.get_minibatch(key, batch_size=2)
    np.testing.assert_array_equal(mb, mb2)  # same key -> same batch


def test_split_batch_and_positions():
    ds = Dataset(_tiny_cfg())
    mb = ds.get_minibatch(jax.random.PRNGKey(1), 2)
    x_in, y = split_batch(mb)
    assert x_in.shape == (2, 512, 6) and y.shape == (2, 512, 3)
    pos = np.asarray(positions_from_inputs(x_in, box=32.0))
    assert pos.min() >= 0.0 and pos.max() < 1.0


def test_synthetic_disk_cache_roundtrip(tmp_path, monkeypatch):
    """Generated cubes are disk-cached per (num_samples, cells, seed,
    za_rms): a second call loads the identical array instead of re-running
    the ~5-min 2LPT solve (measurement queues build one Dataset per CLI
    process; the rollout chain generates one array per hop).  Distinct
    seeds/rms get distinct cache keys, and tiny arrays skip the cache
    unless the size floor is lowered."""
    import os
    monkeypatch.setenv("NBODY_SYNTH_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("NBODY_SYNTH_CACHE_MIN", "0")
    a = synthetic_raw_cubes(num_samples=6, cells=8, seed=3, za_rms=0.75)
    files = set(os.listdir(tmp_path))
    assert files == {"synth_6x8_s3_r0p75.npy"}
    b = synthetic_raw_cubes(num_samples=6, cells=8, seed=3, za_rms=0.75)
    np.testing.assert_array_equal(a, b)
    synthetic_raw_cubes(num_samples=6, cells=8, seed=4, za_rms=0.75)
    synthetic_raw_cubes(num_samples=6, cells=8, seed=3, za_rms=0.9)
    assert len(os.listdir(tmp_path)) == 3
    # Dataset flows through the same cache; X splits are reproducible
    cfg = _tiny_cfg(cells=8, num_samples=6)
    d1, d2 = Dataset(cfg), Dataset(cfg)
    np.testing.assert_array_equal(np.asarray(d1.X_train),
                                  np.asarray(d2.X_train))
    # default size floor skips tiny test cubes
    monkeypatch.delenv("NBODY_SYNTH_CACHE_MIN")
    before = len(os.listdir(tmp_path))
    synthetic_raw_cubes(num_samples=2, cells=8, seed=7)
    assert len(os.listdir(tmp_path)) == before
