import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu import config as C
from nbody_tpu.models.registry import build_model
from nbody_tpu.train.rollout import make_rollout, rollout_mse, stack_params


def _setup(family="set", channels=(6, 16, 3), steps=4):
    model = build_model(C.ModelConfig(family=family, channels=channels,
                                      k_neighbors=4, seed=0), box=32.0)
    params = [model.init(jax.random.PRNGKey(s)) for s in range(steps)]
    rng = np.random.default_rng(0)
    q = rng.uniform(-16, 16, (2, 64, 3)).astype(np.float32)
    disp = 0.1 * rng.normal(size=(2, 64, 3)).astype(np.float32)
    x0 = jnp.asarray(np.concatenate([q, disp], -1))
    return model, stack_params(params), params, x0


def test_rollout_shapes():
    model, stacked, _, x0 = _setup()
    final, traj = make_rollout(model)(stacked, x0)
    assert final.shape == (2, 64, 3)
    assert traj.shape == (4, 2, 64, 3)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final))


def test_one_step_rollout_equals_single_apply():
    model, _, params, x0 = _setup(steps=1)
    final, _ = make_rollout(model)(stack_params(params[:1]), x0)
    expect = x0[..., 3:6] + model.apply(params[0], x0)
    np.testing.assert_allclose(np.asarray(final), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_rollout_chains_displacements():
    model, stacked, params, x0 = _setup(steps=3)
    _, traj = make_rollout(model)(stacked, x0)
    # manual chain
    q = x0[..., :3]
    disp = x0[..., 3:6]
    for t in range(3):
        disp = disp + model.apply(
            jax.tree_util.tree_map(lambda x: x[t], stacked),
            jnp.concatenate([q, disp], -1))
        np.testing.assert_allclose(np.asarray(traj[t]), np.asarray(disp),
                                   rtol=1e-4, atol=1e-5)


def test_rollout_mse_zero_on_self():
    model, stacked, _, x0 = _setup(steps=3)
    _, traj = make_rollout(model)(stacked, x0)
    mse = rollout_mse(model, stacked, x0, traj)
    assert mse.shape == (3,)
    np.testing.assert_allclose(np.asarray(mse), 0.0, atol=1e-8)


def test_rollout_graph_model():
    model, stacked, _, x0 = _setup(family="shiftinv", channels=(3, 8, 3),
                                   steps=2)
    final, traj = make_rollout(model)(stacked, x0)
    assert final.shape == (2, 64, 3) and bool(jnp.all(jnp.isfinite(final)))


import pytest


@pytest.mark.parametrize("scan_args", [[], ["--scan", "4"]],
                         ids=["plain", "scan"])
def test_chain_cli_end_to_end(tmp_path, monkeypatch, capsys, scan_args):
    from nbody_tpu.cli import rollout as cli_rollout
    monkeypatch.setenv("NBODY_EXPERIMENTS_DIR", str(tmp_path / "exp"))
    rc = cli_rollout.main([
        "--steps", "2", "-i", "8", "-b", "2", "-t", "2", "--cells", "8",
        "--synthetic", "-n", "chaintest", "--model", "set",
        "-c", "6", "8", "3", "-l", "0.003"] + scan_args)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Rollout per chain step" in out
    import json as _json
    last = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    rec = _json.loads(last)
    assert np.isfinite(rec["rollout_final_mse"])
    # per-hop quality leg: model and linear-velocity baseline medians
    assert len(rec["rollout_model_median_l2"]) == 2
    assert len(rec["rollout_linear_median_l2"]) == 2
    assert all(np.isfinite(v) for v in rec["rollout_model_median_l2"])
    # the like-for-like AUTOREGRESSIVE linear chain column: carries its own
    # state hop to hop, so from hop 1 it can only be >= the truth-reset
    # column (equal at hop 0 where both start from the true input)
    lin_chain = rec["rollout_linear_chain_median_l2"]
    assert len(lin_chain) == 2
    assert abs(lin_chain[0] - rec["rollout_linear_median_l2"][0]) < 1e-6
    assert lin_chain[1] >= rec["rollout_linear_median_l2"][1] - 1e-6
    cube = np.load(tmp_path / "exp" / "ZA-FPM_0_chaintest" / "Results" /
                   "X_0_prediction.npy")
    assert cube.shape[0] == 2 and cube.shape[1] == 2  # (truth/pred, steps,...)


def test_rollout_coverage_monitor_counts_per_step():
    """The in-rollout coverage monitor reports per-step margin counts and
    trips when displacement growth exceeds the lattice window."""
    import jax.numpy as jnp
    from nbody_tpu.ops.knn import lattice_violations
    from nbody_tpu import config as C
    from nbody_tpu.models.registry import build_model

    cells, k = 8, 4
    box = 4.0 * cells
    cfg = C.ModelConfig(family="shiftinv", channels=(3, 6, 3), k_neighbors=k,
                        knn_window=2, seed=2)
    model = build_model(cfg, box=box)
    params = [model.init(jax.random.PRNGKey(s)) for s in (0, 1, 2)]

    def cov(x_in):
        pos = x_in[..., :3] + box / 2.0 + x_in[..., 3:6]
        return lattice_violations(pos, cells, box=box, window=2)

    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=0)
    x0, _ = split_batch(jnp.asarray(features_from_raw(raw)))

    ro = make_rollout(model, coverage_fn=cov)
    _, (traj, counts) = ro(stack_params(params), x0)
    assert counts.shape == (3,)
    assert int(counts[0]) == 0       # healthy first step

    # inflate the initial displacement far beyond the window: every step's
    # monitor must trip
    x_big = x0.at[..., 3:6].multiply(30.0)
    _, (_, counts_big) = ro(stack_params(params), x_big)
    assert int(counts_big[0]) > 0
