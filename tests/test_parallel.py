"""Multi-device tests on the virtual 8-device CPU platform (SURVEY.md §4d)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from nbody_tpu import config as C
from nbody_tpu.models.registry import build_model
from nbody_tpu.ops.knn import knn_periodic
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.sharding import (
    batch_sharding, make_sharded_train_step, make_sharded_eval_step,
    knn_periodic_sharded)
from nbody_tpu.parallel.ensemble import (
    init_ensemble_state, make_ensemble_train_step, ensemble_apply)
from nbody_tpu.train.trainer import init_train_state, make_train_step
from nbody_tpu.data.synthetic import synthetic_raw_cubes
from nbody_tpu.data.dataset import features_from_raw, split_batch


def _batch(cells=8, b=4, seed=0):
    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=seed)
    x = features_from_raw(raw)
    return split_batch(jnp.asarray(x))


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_knn_matches_single_device():
    mesh = make_mesh(data=1, particle=4)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1, (128, 3)).astype(np.float32))
    ref = np.asarray(knn_periodic(pos, 6))
    pos_sh = jax.device_put(
        pos, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("particle", None)))
    ours = np.asarray(knn_periodic_sharded(pos_sh, 6, mesh))
    np.testing.assert_array_equal(np.sort(ours, 1), np.sort(ref, 1))
    np.testing.assert_array_equal(ours[:, 0], np.arange(128))


@pytest.mark.parametrize("family,channels,dp,sp", [
    ("set", (6, 16, 8, 3), 4, 2),
    ("shiftinv", (3, 8, 8, 3), 2, 2),
])
def test_sharded_train_step_matches_unsharded(family, channels, dp, sp):
    """dp x sp sharded step computes the same update as the single-device step."""
    mesh = make_mesh(data=dp, particle=sp)
    cfg = C.ModelConfig(family=family, channels=channels, k_neighbors=4, seed=3)
    model = build_model(cfg, box=32.0)
    opt = optax.adam(1e-3)

    x_in, y = _batch(b=4)
    state0 = init_train_state(model, opt, seed=3)

    plain_step = make_train_step(model, opt)
    state_ref, loss_ref = plain_step(state0, x_in, y)

    state0b = init_train_state(model, opt, seed=3)
    sh_step = make_sharded_train_step(model, opt, mesh)
    xs = jax.device_put(x_in, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    state_sh, loss_sh = sh_step(state0b, xs, ys)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(state_ref.params),
                     jax.tree_util.tree_leaves(state_sh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_eval_step():
    mesh = make_mesh(data=2, particle=2)
    cfg = C.ModelConfig(family="set", channels=(6, 16, 3), seed=1)
    model = build_model(cfg, box=32.0)
    x_in, y = _batch(b=4)
    params = model.init(jax.random.PRNGKey(1))
    step = make_sharded_eval_step(model, mesh)
    pred, loss = step(params, jax.device_put(x_in, batch_sharding(mesh)),
                      jax.device_put(y, batch_sharding(mesh)))
    assert pred.shape == y.shape and np.isfinite(float(loss))


def test_ensemble_members_are_independent():
    mesh = make_mesh(data=8, particle=1)
    cfg = C.ModelConfig(family="set", channels=(6, 8, 3), seed=0)
    model = build_model(cfg, box=32.0)
    opt = optax.adam(1e-3)
    seeds = list(range(8))
    state = init_ensemble_state(model, opt, seeds)
    step = make_ensemble_train_step(model, opt, mesh)

    x_in, y = _batch(b=2, seed=5)
    state, losses = step(state, x_in, y)
    assert losses.shape == (8,)

    # member i of the ensemble == independently trained model with seed i
    solo = init_train_state(model, opt, seed=seeds[3])
    solo_step = make_train_step(model, opt)
    solo, solo_loss = solo_step(solo, x_in, y)
    np.testing.assert_allclose(float(losses[3]), float(solo_loss), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(solo.params),
                     jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_)[3],
                                   rtol=1e-4, atol=1e-6)


def test_ensemble_apply_shape():
    mesh = make_mesh(data=4, particle=1)
    cfg = C.ModelConfig(family="set", channels=(6, 8, 3), seed=0)
    model = build_model(cfg, box=32.0)
    state = init_ensemble_state(model, optax.adam(1e-3), [0, 1, 2, 3])
    x_in, _ = _batch(b=2, seed=6)
    out = ensemble_apply(model, state.params, x_in)
    assert out.shape == (4, 2, 512, 3)


@pytest.mark.parametrize("p,window", [(2, 3), (4, 2)])
def test_halo_exchange_lattice_knn(p, window):
    """ppermute halo-exchange kNN == unsharded lattice kNN == exact kNN."""
    from nbody_tpu.parallel.sharding import knn_lattice_sharded
    from nbody_tpu.ops.knn import knn_periodic_lattice
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch, positions_from_inputs

    cells = 8
    raw = synthetic_raw_cubes(num_samples=1, cells=cells, seed=21)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=32.0))[0]

    ref = np.asarray(knn_periodic_lattice(pos, 6, cells=cells, window=window))
    mesh = make_mesh(data=1, particle=p)
    pos_sh = jax.device_put(pos, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("particle", None)))
    ours = np.asarray(knn_lattice_sharded(pos_sh, 6, cells, mesh,
                                          window=window))
    np.testing.assert_array_equal(np.sort(ours, -1), np.sort(ref, -1))
    np.testing.assert_array_equal(ours[:, 0], np.arange(cells ** 3))


def test_halo_window_too_large_raises():
    from nbody_tpu.parallel.sharding import knn_lattice_sharded
    mesh = make_mesh(data=1, particle=8)   # local_x = 1 < window
    pos = jnp.zeros((512, 3))
    with pytest.raises(AssertionError, match="adjacent shards"):
        knn_lattice_sharded(pos, 4, 8, mesh, window=3)


def test_ensemble_composes_with_particle_mesh():
    """Members over "data" x particles over "particle" (VERDICT r3 weak
    #6): a 2-member ensemble on a (2, 2) mesh with the batch's N axis
    sharded over "particle" trains each member bit-equal (f32 tolerance)
    to the solo single-device model with the same seed — on the GRAPH
    family, so the in-step kNN rebuild runs under particle sharding."""
    from nbody_tpu.parallel import ensemble as E
    mesh = make_mesh(data=2, particle=2)
    cfg = C.ModelConfig(family="shiftinv", channels=(3, 8, 3),
                        k_neighbors=4, knn_window=2, seed=0)
    model = build_model(cfg, box=32.0)
    opt = optax.adam(1e-3)
    seeds = [11, 12]
    state = E.init_ensemble_state(model, opt, seeds)
    step = E.make_ensemble_train_step(model, opt, mesh)

    x_in, y = _batch(b=2, seed=7)
    bs = E.batch_sharding(mesh)
    x_sh, y_sh = jax.device_put(x_in, bs), jax.device_put(y, bs)
    for _ in range(2):
        state, losses = step(state, x_sh, y_sh)
    assert losses.shape == (2,)

    for m, seed in enumerate(seeds):
        solo = init_train_state(model, opt, seed=seed)
        solo_step = make_train_step(model, opt)
        for _ in range(2):
            solo, solo_loss = solo_step(solo, x_in, y)
        np.testing.assert_allclose(float(losses[m]), float(solo_loss),
                                   rtol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(solo.params),
                         jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_)[m],
                                       rtol=1e-4, atol=1e-6)


def test_trainer_ensemble_with_particle_axis():
    """The Trainer accepts --ensemble with --particle_axis (previously a
    ValueError) and builds the composed (members, particle) mesh."""
    from nbody_tpu.train.trainer import Trainer
    cfg = C.Config(
        data=C.DataConfig(data_dir="/nonexistent", num_test=2, num_val=2,
                          cells_per_side=8, synthetic_num_samples=12),
        model=C.ModelConfig(family="shiftinv", channels=(3, 8, 3),
                            k_neighbors=4, knn_window=2, seed=3),
        train=C.TrainConfig(num_iters=2, batch_size=2, ensemble=2,
                            particle_axis=2, checkpoint_every=2))
    t = Trainer(cfg)
    assert dict(t.mesh.shape) == {"data": 2, "particle": 2}
    loss = t.fit(verbose=False)
    assert np.isfinite(loss)
    errs, preds = t.evaluate(verbose=False)
    assert preds.shape[0] == 2 and np.isfinite(errs).all()
    # --ensemble with --data_axis stays rejected (members own "data")
    bad = C.Config(data=cfg.data, model=cfg.model,
                   train=C.TrainConfig(num_iters=1, batch_size=2,
                                       ensemble=2, data_axis=2))
    with pytest.raises(ValueError):
        Trainer(bad)


def test_mask_dtype_downgrades_under_mesh():
    """The Pallas mask/idx-dot kernels are opaque to GSPMD, so a sharded
    mesh must force the einsum mask route: a mask_dtype='index' model built
    with a mesh records the downgrade and still trains correctly under the
    sharded step (registry._make_masks mesh guard)."""
    mesh = make_mesh(data=2, particle=2)
    cfg = C.ModelConfig(family="shiftinv", channels=(3, 8, 8, 3),
                        k_neighbors=4, knn_window=2, seed=3,
                        neighbor_impl="masked", mask_dtype="index")
    model = build_model(cfg, box=32.0, mesh=mesh)
    opt = optax.adam(1e-3)
    x_in, y = _batch(b=4)
    state0 = init_train_state(model, opt, seed=3)
    sh_step = make_sharded_train_step(model, opt, mesh)
    xs = jax.device_put(x_in, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    state_sh, loss_sh = sh_step(state0, xs, ys)
    assert np.isfinite(float(loss_sh))
    rec = model.impl_record
    assert rec["mask_dtype_requested"] == "index"
    assert rec["mask_dtype"] in ("bfloat16", "float32")

    # and the single-device bf16 build honors the request
    cfg1 = C.ModelConfig(family="shiftinv", channels=(3, 8, 8, 3),
                         k_neighbors=4, knn_window=2, seed=3,
                         dtype="bfloat16", neighbor_impl="masked",
                         mask_dtype="index")
    m1 = build_model(cfg1, box=32.0)
    p1 = m1.init(jax.random.PRNGKey(0))
    _ = jax.jit(m1.apply)(p1, x_in)  # trace fills the record
    assert m1.impl_record["mask_dtype"] == "index"

    # exact-f32 mode also downgrades: the mask/idx-dot kernels dot in bf16,
    # which would silently destroy f32 precision (code review r4)
    cfg2 = C.ModelConfig(family="shiftinv", channels=(3, 8, 8, 3),
                         k_neighbors=4, knn_window=2, seed=3,
                         dtype="float32", neighbor_impl="masked",
                         mask_dtype="index")
    m2 = build_model(cfg2, box=32.0)
    p2 = m2.init(jax.random.PRNGKey(0))
    _ = jax.jit(m2.apply)(p2, x_in)
    assert m2.impl_record["mask_dtype_requested"] == "index"
    assert m2.impl_record["mask_dtype"] == "float32"


def test_halo_knn_pallas_select_matches_sort():
    """select='pallas' through the halo-exchange search returns the same
    graph as the top_k sort on the virtual mesh.  (On the CPU platform the
    sharded path substitutes the iter selection — interpret-mode pallas
    cannot run under shard_map's vma checking — so this pins the sharded
    select plumbing + fallback; the kernel itself is pinned by
    test_knn.test_topk_min_pallas_matches_top_k and engages on real TPU.)"""
    from nbody_tpu.parallel.sharding import knn_lattice_sharded
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import (features_from_raw, split_batch,
                                        positions_from_inputs)
    cells = 8
    raw = synthetic_raw_cubes(num_samples=1, cells=cells, seed=23)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=32.0))[0]
    mesh = make_mesh(data=1, particle=4)
    pos_sh = jax.device_put(pos, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("particle", None)))
    i_sort = np.asarray(knn_lattice_sharded(pos_sh, 6, cells, mesh, window=2))
    i_pal = np.asarray(knn_lattice_sharded(pos_sh, 6, cells, mesh, window=2,
                                           select="pallas"))
    np.testing.assert_array_equal(i_pal, i_sort)


def test_trainer_downgrades_mask_dtype_for_ensemble():
    """Ensemble (and data-axis-only) Trainer runs build without a mesh, so
    the registry guard can't see the sharding — the Trainer itself must
    downgrade non-auto mask dtypes before GSPMD wraps the step."""
    from nbody_tpu.train.trainer import Trainer
    cfg = C.Config(
        data=C.DataConfig(data_dir="/nonexistent", num_test=2, num_val=2,
                          cells_per_side=8, synthetic_num_samples=12),
        model=C.ModelConfig(family="shiftinv", channels=(3, 8, 3),
                            k_neighbors=4, knn_window=2, dtype="float32",
                            neighbor_impl="masked", mask_dtype="index",
                            seed=1),
        train=C.TrainConfig(num_iters=4, batch_size=2, learn_rate=1e-3,
                            checkpoint_every=4, ensemble=2))
    t = Trainer(cfg)
    t.fit()
    rec = t.model.impl_record
    assert rec["mask_dtype"] == "float32"
    # the TRAINER replaced the config before the build (had it not, the
    # registry's f32 guard would have recorded the original request)
    assert "mask_dtype_requested" not in rec
