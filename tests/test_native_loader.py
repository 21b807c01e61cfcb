"""Native mmap .npy loader: build, correctness vs np.load, prefetch."""

import os
import time

import numpy as np
import pytest

from nbody_tpu.data.native_loader import (
    NativeLoaderUnavailable, NpyLoader, PrefetchingSampler)


@pytest.fixture(scope="module")
def npy_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "cubes.npy"
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(20, 4, 4, 4, 19)).astype(np.float32)
    np.save(path, arr)
    return str(path), arr


def _loader(path):
    try:
        return NpyLoader(path)
    except NativeLoaderUnavailable as e:
        pytest.skip(f"native loader unavailable: {e}")


def test_open_and_shape(npy_file):
    path, arr = npy_file
    ld = _loader(path)
    assert ld.shape == arr.shape


def test_gather_matches_numpy(npy_file):
    path, arr = npy_file
    ld = _loader(path)
    idx = [3, 0, 17, 3, 9]
    np.testing.assert_array_equal(ld.gather(idx), arr[idx])


def test_gather_out_of_range_raises(npy_file):
    path, _ = npy_file
    ld = _loader(path)
    with pytest.raises(RuntimeError, match="out of range"):
        ld.gather([25])
    with pytest.raises(RuntimeError, match="out of range"):
        ld.gather([-1])


def test_prefetch_roundtrip(npy_file):
    path, arr = npy_file
    ld = _loader(path)
    buf = ld.prefetch([1, 2, 3])
    out = ld.prefetch_wait()
    assert out is buf
    np.testing.assert_array_equal(out, arr[[1, 2, 3]])


def test_double_prefetch_rejected(npy_file):
    path, _ = npy_file
    ld = _loader(path)
    ld.prefetch([0])
    with pytest.raises(RuntimeError, match="already in flight"):
        ld.prefetch([1])
    ld.prefetch_wait()


def test_wait_without_prefetch_rejected(npy_file):
    path, _ = npy_file
    ld = _loader(path)
    with pytest.raises(RuntimeError, match="no prefetch"):
        ld.prefetch_wait()


def test_prefetching_sampler_stream(npy_file):
    path, arr = npy_file
    ld = _loader(path)
    sampler = PrefetchingSampler(ld, np.arange(10), batch_size=4, seed=1)
    seen = []
    for _ in range(5):
        b = sampler.next()
        assert b.shape == (4, 4, 4, 4, 19)
        # every row must be a genuine sample row from the train subset
        for row in b:
            matches = np.where((arr[:10] == row).all(axis=(1, 2, 3, 4)))[0]
            assert len(matches) >= 1
        seen.append(b)
    # the stream is random: not all batches identical
    assert any(not np.array_equal(seen[0], s) for s in seen[1:])


def test_rejects_non_f32(tmp_path):
    path = tmp_path / "bad.npy"
    np.save(path, np.zeros((3, 3), np.float64))
    try:
        with pytest.raises((NativeLoaderUnavailable, RuntimeError),
                           match="float32|unavailable"):
            NpyLoader(str(path))
    except NativeLoaderUnavailable:
        pytest.skip("native loader unavailable")


def test_streaming_dataset_end_to_end(tmp_path):
    """StreamingDataset trains a model straight off the mmap'd file."""
    import jax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import StreamingDataset, Dataset
    from nbody_tpu.train.trainer import Trainer

    raw = synthetic_raw_cubes(num_samples=16, cells=8, seed=3)
    path = str(tmp_path / "ZA_sim.npy")
    np.save(path, raw)

    cfg = C.Config(
        data=C.DataConfig(num_test=3, num_val=2, cells_per_side=8),
        model=C.ModelConfig(family="set", channels=(6, 16, 3), seed=1),
        train=C.TrainConfig(num_iters=30, batch_size=2, learn_rate=3e-3,
                            checkpoint_every=100))
    try:
        ds = StreamingDataset(path, cfg.data)
    except NativeLoaderUnavailable as e:
        pytest.skip(f"native loader unavailable: {e}")

    # split agrees with the in-RAM Dataset given the same raw array
    ram = Dataset(cfg.data, raw=raw)
    np.testing.assert_allclose(ds.X_test, ram.X_test, atol=1e-6)
    np.testing.assert_allclose(ds.X_val, ram.X_val, atol=1e-6)

    trainer = Trainer(cfg, dataset=ds)
    import jax.numpy as jnp
    from nbody_tpu.data.dataset import split_batch
    x, y = split_batch(jnp.asarray(ds.get_minibatch(jax.random.PRNGKey(0), 2)))
    _, loss0 = trainer.eval_step(trainer.state.params, x, y)
    last = trainer.fit(verbose=False)
    assert np.isfinite(last) and last < float(loss0)


def test_cli_streaming_end_to_end(tmp_path, monkeypatch, capsys):
    """--streaming trains off a real mmap'd cube file through the CLI
    (round-1 gap: StreamingDataset existed but no CLI path reached it)."""
    from nbody_tpu.cli import train as cli_train
    from nbody_tpu.data.synthetic import synthetic_raw_cubes

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # num_val defaults to 100: leave enough samples for a real train split
    np.save(str(data_dir / "ZA_001.npy"),
            synthetic_raw_cubes(num_samples=110, cells=8, seed=5))
    monkeypatch.setenv("NBODY_EXPERIMENTS_DIR", str(tmp_path / "exp"))
    rc = cli_train.main([
        "-i", "4", "-b", "2", "-t", "2", "-n", "streamtest",
        "--data_dir", str(data_dir), "--streaming",
        "-c", "6", "8", "3", "--model", "set"])
    assert rc == 0
    out = capsys.readouterr().out
    # must NOT have fallen back to the in-memory Dataset
    assert "falling back to the in-memory Dataset" not in out
    assert "Test Error" in out
    results = tmp_path / "exp" / "ZA-FPM_0_streamtest" / "Results"
    assert (results / "X_0_prediction.npy").exists()


def test_make_dataset_fallback_without_file(tmp_path, capsys):
    """--streaming without a real cube file degrades to the in-memory
    Dataset with an explanation instead of crashing."""
    from nbody_tpu.data.dataset import make_dataset, Dataset as DS
    from nbody_tpu import config as C
    cfg = C.DataConfig(data_dir=str(tmp_path / "none"), streaming=True,
                       cells_per_side=8, num_test=2, num_val=2,
                       synthetic_num_samples=8)
    ds = make_dataset(cfg)
    assert isinstance(ds, DS)
    assert "falling back to the in-memory Dataset" in capsys.readouterr().out
