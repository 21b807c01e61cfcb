"""Training driver: jitted, donated train/eval steps + orchestration.

Reference twin: the script-level train/eval loops in train.py:84-182 and
experiment.py:235-276.  TPU-first differences:
  * the whole step — graph rebuild (for graph models), forward, backward,
    Adam update — is ONE jitted XLA program with donated state buffers;
    no per-step feed_dict host->device copies of anything but the minibatch;
  * checkpointing via orbax with WORKING restore (the reference's restore
    was a NotImplementedError stub, utils.py:481-482);
  * metrics go to a jsonl log in addition to stdout.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nbody_tpu import config as C
from nbody_tpu.data.dataset import Dataset, make_dataset, split_batch
from nbody_tpu.models.registry import Model, build_model
from nbody_tpu.physics.losses import loss_za


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(model: Model, optimizer: optax.GradientTransformation,
                     seed: int = C.PARAMS_SEED) -> TrainState:
    params = model.init(jax.random.PRNGKey(seed))
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_train_step(model: Model, optimizer: optax.GradientTransformation,
                    loss_fn: Callable = loss_za):
    """Jitted (state, x_in, y_true) -> (state', loss). State is donated."""

    def step(state: TrainState, x_in, y_true):
        def loss(params):
            return loss_fn(model.apply(params, x_in), y_true)

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_val

    return jax.jit(step, donate_argnums=(0,))


def make_train_scan(model: Model, optimizer: optax.GradientTransformation,
                    loss_fn: Callable = loss_za):
    """Jitted multi-step trainer: (state, batches (T, b, N, C), num_inputs)
    -> (state', losses (T,)).

    Runs T optimizer steps as ONE device program (lax.scan over the step),
    so the host dispatches once per chunk instead of once per step — the
    full inversion of the reference's per-step feed_dict (train.py:114).
    Matters doubly here: this machine's TPU sits behind a high-latency
    tunnel, so per-step dispatch costs dwarf small-step compute.
    """

    def one_step(state: TrainState, batch, num_inputs: int):
        x_in, y_true = batch[..., :num_inputs], batch[..., num_inputs:]

        def loss(params):
            return loss_fn(model.apply(params, x_in), y_true)

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_val

    def scan_steps(state: TrainState, batches, num_inputs: int):
        return jax.lax.scan(
            lambda s, b: one_step(s, b, num_inputs), state, batches)

    return jax.jit(scan_steps, static_argnums=(2,), donate_argnums=(0,))


def make_train_scan_device(model: Model,
                           optimizer: optax.GradientTransformation,
                           loss_fn: Callable = loss_za):
    """make_train_scan twin for a DEVICE-RESIDENT training set.

    (state, x_all (S, N, C), idxs (T, b) int32, num_inputs) -> (state',
    losses (T,)).  x_all is staged in HBM once by the caller; each scanned
    step assembles its minibatch with `b` static dynamic-index slices
    (contiguous row reads — NOT a dynamic gather, which is pathological on
    this platform, CLAUDE.md fact 3).  The host->device traffic per chunk
    is a (T, b) int32 block instead of (T, b, N, C) batches: on the
    tunneled TPU the batch stream costs ~300 ms/step at 32^3 b4 on top of
    the 171 ms compute step — the inverse of the reference's feed_dict
    design (reference train.py:114 feeds every step from the host).
    State is donated; x_all is not (reused across dispatches)."""

    def one_step(state: TrainState, x_all, idx_row, num_inputs: int):
        batch = jnp.stack([
            jax.lax.dynamic_index_in_dim(x_all, idx_row[i], 0,
                                         keepdims=False)
            for i in range(idx_row.shape[0])])
        x_in, y_true = batch[..., :num_inputs], batch[..., num_inputs:]

        def loss(params):
            return loss_fn(model.apply(params, x_in), y_true)

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_val

    def scan_steps(state: TrainState, x_all, idxs, num_inputs: int):
        return jax.lax.scan(
            lambda s, ib: one_step(s, x_all, ib, num_inputs), state, idxs)

    return jax.jit(scan_steps, static_argnums=(3,), donate_argnums=(0,))


def make_eval_step(model: Model, loss_fn: Callable = loss_za):
    """Jitted (params, x_in, y_true) -> (pred, loss).  Uses the model's
    deterministic eval-mode forward (e.g. frozen batch-norm stats)."""
    fwd = model.eval_fn

    def step(params, x_in, y_true):
        pred = fwd(params, x_in)
        return pred, loss_fn(pred, y_true)

    return jax.jit(step)


class Trainer:
    """End-to-end orchestration (reference train.py driver layer)."""

    def __init__(self, cfg: C.Config, dataset: Optional[Dataset] = None,
                 saver=None):
        self.cfg = cfg
        self.dataset = dataset if dataset is not None else make_dataset(cfg.data)
        box = 4.0 * self.dataset.cells
        tcfg = cfg.train
        # mesh first: a particle-sharded mesh routes the graph families'
        # in-step kNN through the halo-exchange shard_map search (ppermute
        # of 2*window*cells^2 boundary positions per shard) instead of
        # leaving GSPMD to partition the full-cube roll search.  The
        # ensemble x particle composition gets the same route (VERDICT r4
        # #4): its mesh is built HERE so the model's knn_fn can shard_map
        # over it, with batch_replicated=True because members share the
        # batch (replicated over "data" = the member axis).
        ens = int(tcfg.ensemble or 0)
        if ens > 1 and tcfg.data_axis > 1:
            raise ValueError("--ensemble occupies the \"data\" mesh axis "
                             "(one member per shard); combine it with "
                             "--particle_axis, not --data_axis")
        mesh_for_model = None
        batch_replicated = False
        if tcfg.particle_axis > 1:
            import math
            from nbody_tpu.parallel.mesh import make_mesh
            if ens > 1:
                sp = tcfg.particle_axis
                ndev = len(jax.devices())
                mesh_for_model = make_mesh(
                    data=math.gcd(ens, max(1, ndev // sp)), particle=sp)
                batch_replicated = True
            else:
                mesh_for_model = make_mesh(data=tcfg.data_axis,
                                           particle=tcfg.particle_axis)
        mcfg = cfg.model
        if (getattr(mcfg, "mask_dtype", "auto") != "auto"
                and mesh_for_model is None
                and (tcfg.data_axis > 1 or tcfg.particle_axis > 1
                     or (tcfg.ensemble or 0) > 1)):
            # ensemble / data-axis-only runs build without a mesh, so the
            # registry's GSPMD guard cannot see the sharding — downgrade
            # here for the same reason (a pallas_call is opaque to GSPMD
            # and would gather its operands to every device)
            import dataclasses
            import logging
            logging.getLogger(__name__).warning(
                "mask_dtype=%s downgraded to 'auto': the %s step runs "
                "under GSPMD, where the Pallas mask kernels cannot be "
                "partitioned", mcfg.mask_dtype,
                "ensemble" if (tcfg.ensemble or 0) > 1 else "sharded")
            mcfg = dataclasses.replace(mcfg, mask_dtype="auto")
        self.model = build_model(mcfg, box=box, mesh=mesh_for_model,
                                 batch_replicated=batch_replicated)
        self.optimizer = optax.adam(cfg.train.learn_rate)
        self.state = init_train_state(self.model, self.optimizer, cfg.model.seed)
        self.ensemble = ens
        if self.ensemble > 1:
            # multi-seed ensemble: E independent members as ONE program,
            # stacked on a leading axis sharded over the "data" mesh axis
            # (BASELINE.json config 5).  Mesh: members get gcd(E, free
            # devices) "data" shards so the same CLI works on one chip
            # (all members vmapped locally) and on a full slice; with
            # --particle_axis the cube's N axis is sharded over "particle"
            # IN ADDITION — members x particles, the config-5 extension to
            # large cubes (VERDICT r3 weak #6).
            import math
            from nbody_tpu.parallel.mesh import make_mesh
            from nbody_tpu.parallel import ensemble as E
            sp = max(1, tcfg.particle_axis)
            if self.dataset.num_particles % sp:
                raise ValueError(
                    f"num_particles={self.dataset.num_particles} must divide "
                    f"by particle_axis={sp}")
            ndev = len(jax.devices())
            # reuse the model-build mesh (ensemble x particle) when set so
            # the model's halo-routed knn_fn and the step share one mesh
            self.mesh = (mesh_for_model if mesh_for_model is not None
                         else make_mesh(
                             data=math.gcd(self.ensemble,
                                           max(1, ndev // sp)),
                             particle=sp))
            seeds = [cfg.model.seed + i for i in range(self.ensemble)]
            self.state = E.init_ensemble_state(self.model, self.optimizer,
                                               seeds)
            self.batch_sharding = E.batch_sharding(self.mesh)
            self.train_step = E.make_ensemble_train_step(
                self.model, self.optimizer, self.mesh)
            self.eval_step = E.make_ensemble_eval_step(self.model, self.mesh)
        elif tcfg.data_axis * tcfg.particle_axis > 1:
            # sharded training over the (data, particle) ICI mesh —
            # the CLI-reachable path for --data_axis/--particle_axis
            from nbody_tpu.parallel.mesh import make_mesh
            from nbody_tpu.parallel import sharding as S
            if tcfg.batch_size % tcfg.data_axis:
                raise ValueError(
                    f"batch_size={tcfg.batch_size} must divide by "
                    f"data_axis={tcfg.data_axis}")
            if self.dataset.num_particles % tcfg.particle_axis:
                raise ValueError(
                    f"num_particles={self.dataset.num_particles} must divide "
                    f"by particle_axis={tcfg.particle_axis}")
            self.mesh = (mesh_for_model if mesh_for_model is not None
                         else make_mesh(data=tcfg.data_axis,
                                        particle=tcfg.particle_axis))
            self.batch_sharding = S.batch_sharding(self.mesh)
            self.train_step = S.make_sharded_train_step(
                self.model, self.optimizer, self.mesh)
            self.eval_step = S.make_sharded_eval_step(self.model, self.mesh)
        else:
            self.mesh = None
            self.batch_sharding = None
            self.train_step = make_train_step(self.model, self.optimizer)
            self.eval_step = make_eval_step(self.model)
        self.saver = saver
        self.num_inputs = getattr(self.dataset, "num_input_channels", 6)
        self.metrics_log: list[dict] = []
        # per-checkpoint training-error series (reference train.py:117-120
        # fetched [error, pred] every 250 steps; Saver.save_error(
        # training=True) persists this series — utils.py:488-498)
        self.train_error_history: list[float] = []
        self._cov_fn = self._make_coverage_margin_fn()
        self._cov_confirmed = False

    def _make_coverage_margin_fn(self):
        """O(N), jittable early-warning coverage monitor for lattice-kNN
        graph models: counts particles displaced beyond the conservative
        (window - 1)-spacing margin (ops.knn.lattice_violations).

        The exact batch-0 guard (check_graph_coverage) proves the FIRST
        batch is covered, but displacements grow over a training run or a
        rollout chain — a window that covers batch 0 can stop covering
        later data silently (VERDICT r2 weak #4).  This monitor runs at
        every checkpoint; a nonzero count triggers ONE exact host
        verification (margin violations are conservative — the window
        search may still resolve those rows exactly)."""
        mcfg = self.cfg.model
        if mcfg.family in ("set", "attn") or mcfg.knn_method != "lattice":
            return None
        cells = self.dataset.cells
        if self.dataset.num_particles != cells ** 3:
            return None
        box = 4.0 * cells
        from nbody_tpu.ops.knn import lattice_violations

        def fn(x_in):
            pos = x_in[..., :3] + box / 2.0 + x_in[..., 3:6]
            return lattice_violations(pos, cells, box=box,
                                      window=mcfg.knn_window)

        return jax.jit(fn)

    def _monitor_coverage(self, x_in, rec: dict):
        """Fold the continuous coverage monitor into a checkpoint record."""
        if self._cov_fn is None:
            return
        cv = int(jax.device_get(self._cov_fn(x_in)))
        rec["coverage_margin_violations"] = cv
        if cv == 0:
            # margins recovered: re-arm so a later, distinct violation
            # episode gets its own exact count instead of margins-only
            # logging forever after the first trip (VERDICT r3 weak #7)
            self._cov_confirmed = False
        elif not self._cov_confirmed:
            self._cov_confirmed = True     # one exact check per episode
            exact = self.check_graph_coverage(x_in)
            rec["graph_coverage_violations"] = int(exact)
            if exact:
                print(f"WARNING: displacement growth broke graph coverage "
                      f"mid-run ({exact} edges) — increase knn_window.",
                      flush=True)

    def _put(self, x):
        """Place a batch on the mesh (no-op for single-device training)."""
        if self.batch_sharding is None:
            return jnp.asarray(x)
        return jax.device_put(jnp.asarray(x), self.batch_sharding)

    def place_state(self):
        """Re-place self.state onto the configured mesh layout.  Call after
        assigning a restored checkpoint: orbax returns single-device arrays,
        and the jitted steps' in_shardings (replicated params, or the
        ensemble's member-sharded stack) require placed inputs."""
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(self.mesh, P())
        if self.ensemble > 1:
            from nbody_tpu.parallel.ensemble import ensemble_sharding
            esh = ensemble_sharding(self.mesh)
        else:
            esh = rep
        self.state = TrainState(
            jax.device_put(self.state.params, esh),
            jax.device_put(self.state.opt_state, esh),
            jax.device_put(self.state.step, rep))

    def _log(self, rec: dict):
        self.metrics_log.append(rec)
        if self.saver is not None:
            self.saver.append_metrics(rec)

    def _loss_scalar(self, loss) -> float:
        """Scalarize a step loss: ensemble steps return per-member (E,)."""
        return float(np.mean(np.asarray(jax.device_get(loss))))

    def _log_effective_impl(self):
        """Record what neighbor implementation the model trace actually
        chose (the masked->block HBM-cap fallback is otherwise only a
        filterable warning; ADVICE r2) in the run's metrics artifacts.
        The record is per-build (Model.impl_record), so concurrent models
        in one process cannot alias each other's entries (ADVICE r3)."""
        rec_src = self.model.impl_record
        if rec_src:
            rec = {"effective_neighbor_impl": dict(rec_src)}
            if rec_src.get("fallback"):
                print("NOTE: neighbor_impl='masked' fell back to the Pallas "
                      "block kernels (mask HBM cap)", flush=True)
            self._log(rec)

    def check_graph_coverage(self, x_in) -> int:
        """Guard against silent edge-dropping (round-1 retraction class):
        verifies the configured kNN/band setup covers this data.  Runs once
        on the first training batch; a nonzero count is loudly reported and
        logged, never silent."""
        from nbody_tpu.models.registry import coverage_violations
        box = 4.0 * self.dataset.cells
        v = coverage_violations(self.cfg.model, box, x_in)
        if v:
            msg = (f"WARNING: graph coverage violated — {v} particles/edges "
                   f"fall outside what knn_method={self.cfg.model.knn_method!r}"
                   f" (window={self.cfg.model.knn_window}, "
                   f"band={self.cfg.model.band!r}) can represent; the model "
                   "would train on a silently corrupted graph. Increase "
                   "knn_window or use knn_method='exact'.")
            print(msg, flush=True)
            self._log({"graph_coverage_violations": int(v)})
        return v

    def fit(self, num_iters: Optional[int] = None, key: Optional[jax.Array] = None,
            verbose: bool = True) -> float:
        """Train loop (reference train.py:87-120). Returns last loss."""
        tcfg = self.cfg.train
        num_iters = num_iters if num_iters is not None else tcfg.num_iters
        key = key if key is not None else jax.random.PRNGKey(self.cfg.data.seed)
        last_loss = float("nan")
        loss = None
        t0 = time.time()
        for it in range(num_iters):
            key, bkey = jax.random.split(key)
            batch = self.dataset.get_minibatch(bkey, tcfg.batch_size)
            x_in, y_true = split_batch(self._put(batch), self.num_inputs)
            if it == 0:
                self.check_graph_coverage(x_in)
            self.state, loss = self.train_step(self.state, x_in, y_true)
            if it == 0:
                self._log_effective_impl()
            if (it + 1) % tcfg.checkpoint_every == 0:
                last_loss = self._loss_scalar(loss)
                rec = {"step": it + 1, "loss": last_loss,
                       "elapsed_s": time.time() - t0}
                if self.ensemble > 1:
                    rec["member_losses"] = [
                        float(x) for x in np.asarray(jax.device_get(loss))]
                self._monitor_coverage(x_in, rec)
                self._log(rec)
                self.train_error_history.append(last_loss)
                if verbose:
                    print(f"Checkpoint {it + 1:>5} : {last_loss:.6f}")
                if self.saver is not None:
                    # label with the global state step (restored runs
                    # continue the numbering instead of overwriting)
                    self.saver.save_checkpoint(self.state,
                                               int(self.state.step))
        if loss is not None:
            last_loss = self._loss_scalar(loss)
        return last_loss

    def _device_data_enabled(self) -> bool:
        """Resolve the device_data setting for the fit_scan path.

        "on"/"auto" engage only on the single-device scan path: sharded and
        ensemble steps place batches through batch_sharding, and a
        replicated HBM copy of X_train would defeat the mesh layout.
        "auto" additionally requires the training set to fit the HBM
        budget (NBODY_DEVICE_DATA_CAP_GB, default 6 — the 32^3 synthetic
        set is ~1.5 GB; 64^3 at ~12 GB stays host-streamed)."""
        mode = getattr(self.cfg.train, "device_data", "off")
        if mode == "off":
            return False
        if self.mesh is not None or self.ensemble > 1:
            if mode == "on":
                import logging
                logging.getLogger(__name__).warning(
                    "device_data=on ignored: sharded/ensemble steps feed "
                    "through batch_sharding placement")
            return False
        if mode == "on":
            return True
        cap_gb = float(os.environ.get("NBODY_DEVICE_DATA_CAP_GB", "6"))
        return self.dataset.X_train.nbytes <= cap_gb * 2 ** 30

    @staticmethod
    def _host_rng_device():
        """The host CPU device for minibatch-index sampling, if the CPU
        backend coexists with the accelerator (this machine's site config
        runs jax_platforms="axon,cpu").  Keeps the per-step
        jax.random.split/choice dispatches off the tunneled TPU — the
        threefry math is backend-invariant, so batch sequences are
        unchanged."""
        try:
            return jax.local_devices(backend="cpu")[0]
        except Exception:
            return None

    def fit_scan(self, num_iters: Optional[int] = None,
                 key: Optional[jax.Array] = None, scan_chunk: int = 50,
                 verbose: bool = True) -> float:
        """Train with multi-step device scans: `scan_chunk` optimizer steps
        per host dispatch (see make_train_scan).  Numerically identical to
        fit() given the same batch sequence; far fewer host round-trips.

        With device_data (TrainConfig) the training set is staged in HBM
        once and each dispatch ships a (T, b) int32 index block instead of
        (T, b, N, C) batches — same sequence, same losses, no per-step
        host->device batch stream (make_train_scan_device)."""
        import contextlib
        tcfg = self.cfg.train
        num_iters = num_iters if num_iters is not None else tcfg.num_iters
        use_dev = self._device_data_enabled()
        rngdev = self._host_rng_device()
        rngctx = (jax.default_device(rngdev) if rngdev is not None
                  else contextlib.nullcontext())
        with rngctx:
            if key is None:
                key = jax.random.PRNGKey(self.cfg.data.seed)
        if use_dev:
            if not hasattr(self, "_scan_fn_dev"):
                self._scan_fn_dev = make_train_scan_device(self.model,
                                                           self.optimizer)
            if not hasattr(self, "_x_dev"):
                self._x_dev = jnp.asarray(np.asarray(self.dataset.X_train))
            scan_fn = self._scan_fn_dev
        elif not hasattr(self, "_scan_fn"):
            if self.ensemble > 1:
                from nbody_tpu.parallel.ensemble import make_ensemble_train_scan
                self._scan_fn = make_ensemble_train_scan(
                    self.model, self.optimizer, self.mesh)
            elif self.mesh is not None:
                from nbody_tpu.parallel.sharding import make_sharded_train_scan
                self._scan_fn = make_sharded_train_scan(
                    self.model, self.optimizer, self.mesh)
            else:
                self._scan_fn = make_train_scan(self.model, self.optimizer)
        if not use_dev:
            scan_fn = self._scan_fn
        last_loss = float("nan")
        t0 = time.time()
        done = 0
        while done < num_iters:
            t = min(scan_chunk, num_iters - done)
            if use_dev:
                rows = []
                with rngctx:
                    for _ in range(t):
                        key, bkey = jax.random.split(key)
                        rows.append(self.dataset.get_minibatch_indices(
                            bkey, tcfg.batch_size))
                idxs = np.stack(rows).astype(np.int32)
                # host-side views for the coverage guard/monitor only
                batches = self.dataset.X_train[idxs[[0, -1]]]
            else:
                chunk = []
                with rngctx:
                    for _ in range(t):
                        key, bkey = jax.random.split(key)
                        chunk.append(self.dataset.get_minibatch(
                            bkey, tcfg.batch_size))
                batches = jnp.asarray(np.stack(chunk))
            if done == 0:
                self.check_graph_coverage(batches[0][..., :self.num_inputs])
            first = done == 0
            if use_dev:
                self.state, losses = scan_fn(self.state, self._x_dev, idxs,
                                             self.num_inputs)
            else:
                self.state, losses = scan_fn(self.state, batches,
                                             self.num_inputs)
            if first:
                self._log_effective_impl()
            done += t
            last_loss = self._loss_scalar(losses[-1])
            rec = {"step": done, "loss": last_loss,
                   "elapsed_s": time.time() - t0}
            if self.ensemble > 1:
                rec["member_losses"] = [
                    float(x) for x in np.asarray(jax.device_get(losses[-1]))]
            self._monitor_coverage(batches[-1][..., :self.num_inputs], rec)
            self._log(rec)
            self.train_error_history.append(last_loss)
            if verbose:
                print(f"Checkpoint {done:>5} : {last_loss:.6f}")
            if self.saver is not None:
                self.saver.save_checkpoint(self.state, int(self.state.step))
        return last_loss

    def evaluate(self, split: str = "test", verbose: bool = True):
        """Sequential eval sweep (reference train.py:140-174).

        Returns (per-batch errors, predictions cube (2, n, N, out_ch)):
        slot 0 = ground truth, slot 1 = prediction — the reference's
        result-cube layout (train.py:132,171-172) so host viz tooling works.
        """
        bsize = self.cfg.train.batch_size
        x_split = {"val": self.dataset.X_val, "test": self.dataset.X_test}[split]
        n = (x_split.shape[0] // bsize) * bsize
        if n == 0:
            raise ValueError(
                f"{split} split has {x_split.shape[0]} samples — fewer than "
                f"batch_size={bsize}; lower -b or raise the split size")
        errors = []
        preds = None
        for p, batch in self.dataset.sequential_batches(split, bsize):
            x_in, y_true = split_batch(self._put(batch), self.num_inputs)
            if self.ensemble > 1:
                # ensemble eval: the artifact is the ensemble-MEAN prediction
                pred, err, _member = self.eval_step(self.state.params,
                                                    x_in, y_true)
            else:
                pred, err = self.eval_step(self.state.params, x_in, y_true)
            if preds is None:  # out channels discovered from the model
                preds = np.zeros((2, n, self.dataset.num_particles,
                                  pred.shape[-1]), np.float32)
            preds[0, p:p + bsize] = np.asarray(y_true)
            preds[1, p:p + bsize] = np.asarray(pred)
            errors.append(float(err))
            if verbose:
                print(f"val_err, {p // bsize} : {errors[-1]}")
        return np.asarray(errors, np.float32), preds
