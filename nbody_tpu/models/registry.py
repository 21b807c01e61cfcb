"""Model registry: a uniform (init, apply) interface over all families.

`apply(params, x_in)` takes the standard input batch (b, N, 6)
[grid - box/2, za_disp] and returns the predicted ZA->FastPM residual
(b, N, 3).  Graph families rebuild the periodic kNN graph *inside* apply,
so the whole forward (graph build included) jits into one XLA program —
the inversion of the reference's host-side per-step kNN (SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu import config as C
from nbody_tpu.ops.knn import knn_periodic_batch, knn_periodic_lattice_batch


class Model(NamedTuple):
    init: Callable        # key -> params
    apply: Callable       # (params, x_in (b,N,6)) -> (b,N,3)
    family: str
    # eval-mode forward (deterministic, batch-independent); defaults to apply
    apply_eval: Callable = None
    # per-build record of what neighbor impl the trace actually chose
    # (filled in at first trace by _make_masks; ADVICE r3: per-build, not
    # a process global, so concurrent models can't alias entries)
    impl_record: dict = None
    # graph families also expose the split (knn, apply-given-idx) pair so
    # callers that vmap over model replicas (the multi-seed ensemble) can
    # hoist the graph build OUT of the member vmap: members share the
    # batch, so idx is member-invariant — and outside the vmap the
    # halo-exchange shard_map kNN routes instead of GSPMD partitioning the
    # full-cube roll search (VERDICT r4 #4).  None for non-graph families.
    knn_fn: Callable = None          # x_in (b,N,C) -> idx (b,N,K)
    apply_with_idx: Callable = None  # (params, x_in, idx) -> (b,N,out)

    @property
    def eval_fn(self):
        return self.apply_eval if self.apply_eval is not None else self.apply


def _graph_geometry(x_in: jnp.ndarray, box: float):
    """Positions (raw units) + ZA displacement from the input batch."""
    q = x_in[..., :3] + box / 2.0
    za = x_in[..., 3:6]
    pos = q + za
    return pos, za


def _resolve_band(cfg: C.ModelConfig, box: float):
    if cfg.band == "auto":
        from nbody_tpu.ops.banded import default_band
        # with the lattice kNN the offsets are bounded by construction
        return default_band(int(round(box / 4.0)), window=cfg.knn_window)
    return cfg.band


def _effective_band(cfg: C.ModelConfig, band, n: int, cells: int):
    """The index-band assumption only holds when the search that produced
    idx guarantees it: the lattice search on a full cells^3 cube, or an
    explicitly banded search.  'exact' mode (and the lattice fallback on
    non-cube N) can return edges anywhere — band must be None there, or the
    banded gather/scatter would silently zero/drop out-of-band edges (the
    very case exact mode exists for)."""
    if cfg.knn_method == "banded":
        return band
    if cfg.knn_method == "lattice" and n == cells ** 3:
        return band
    return None


def _make_knn(cfg: C.ModelConfig, box: float, band, mesh=None,
              batch_replicated: bool = False):
    """kNN builder for graph models: positions (b, N, 3) raw -> idx (b, N, K).

    "lattice" (default) uses the cell-list roll search when N is a full
    cells^3 cube; otherwise falls back to the banded/exact pairwise search.

    mesh: a (data, particle) Mesh with particle axis > 1 routes the lattice
    search through the shard_map halo-exchange variant
    (parallel.sharding.knn_lattice_sharded_batch) — per-step graph-build
    communication is 2*window*cells^2 positions per shard over ppermute,
    instead of whatever cube-scale collectives GSPMD would insert for the
    (2w+1)^3 full-cube rolls (VERDICT r2 weak #3).

    batch_replicated: the batch axis is NOT sharded over "data" (the
    ensemble composition replicates the shared batch over members) — the
    halo search then runs with the batch replicated per shard instead of
    slicing it.
    """
    k = cfg.k_neighbors
    cells = int(round(box / 4.0))

    def knn(pos):
        # neighbor search is index selection: never on the AD path
        pos_norm = jax.lax.stop_gradient(jnp.mod(pos / box, 1.0))
        if cfg.knn_method == "lattice" and pos.shape[-2] == cells ** 3:
            if mesh is not None:
                from nbody_tpu.parallel.sharding import (
                    halo_knn_usable, knn_lattice_sharded_batch)
                if halo_knn_usable(cells, pos.shape[-2], mesh,
                                   cfg.knn_window):
                    return knn_lattice_sharded_batch(
                        pos_norm, k, cells=cells, mesh=mesh,
                        window=cfg.knn_window,
                        select=getattr(cfg, "knn_select", "sort"),
                        batch_replicated=batch_replicated)
            return knn_periodic_lattice_batch(
                pos_norm, k, cells=cells, window=cfg.knn_window,
                select=getattr(cfg, "knn_select", "sort"))
        if cfg.knn_method == "banded":
            return knn_periodic_batch(pos_norm, k, band=band)
        # "lattice" on non-cube data, or "exact": the index-band assumption
        # is unjustified for arbitrary point sets — search exactly
        return knn_periodic_batch(pos_norm, k)

    return knn


def coverage_violations(cfg: C.ModelConfig, box: float, x_in) -> int:
    """Count graph edges the configured neighbor pipeline could silently
    drop for this batch (0 == the graph is provably covered).

    The class of bug this guards: a too-small band or search window drops
    a fraction of edges with no error anywhere (it cost a 46.6x -> 38.6x
    headline retraction in round 1, PERF.md).  Checks per knn_method:
      lattice — the window search's neighbor distances vs the EXACT
                O(N^2) search's: rows where the lattice graph is farther
                than the true kNN graph are missed-neighbor rows.  (A
                displacement-margin heuristic is too conservative: it
                flags rows the window search still resolves exactly.)
      banded  — edges of the EXACT search outside the configured band
                (ops.banded.band_violations);
      exact   — 0 by construction (band resolves to None).
    Call once per dataset/run (trainer does, bench refuses to report
    otherwise) — not per step: it runs one exact O(N^2) search.
    """
    if cfg.family in ("set", "attn"):
        return 0
    cells = int(round(box / 4.0))
    band = _resolve_band(cfg, box)
    pos, _ = _graph_geometry(jnp.asarray(x_in), box)
    n = pos.shape[-2]
    k = cfg.k_neighbors
    pos_norm = jnp.mod(pos / box, 1.0)
    from nbody_tpu.ops.knn import knn_periodic_batch
    # The exact O(N^2) on-device search is the verifier at bench scale, but
    # at 64^3+ it has crashed this machine's TPU worker (a ~512 x 262144
    # distance/top_k program over the tunnel); above the threshold use the
    # host sklearn ghost-padding search (the reference's own algorithm,
    # baseline_cpu.pbc_knn_host) — exact either way.
    def exact_knn(pn):
        if pn.shape[-2] > 100_000:
            from nbody_tpu.baseline_cpu import pbc_knn_host
            # ghost shell must exceed the kNN radius (~2.2 grid spacings
            # for K<=~30 at these densities): 4 spacings, min 0.1.  The
            # shell is VERIFIED a posteriori (ADVICE r2): if any row's
            # K-th-neighbor distance reaches the shell, the padded search
            # itself may have missed a cross-boundary neighbor — re-run
            # with a doubled shell until the radius is strictly inside.
            def host_knn_checked(pb):
                thr = max(0.1, 4.0 * pn.shape[-2] ** (-1.0 / 3.0))
                while True:
                    idx_b = pbc_knn_host(pb, k, boundary_threshold=thr)
                    d = pb[idx_b] - pb[:, None, :]
                    d -= np.round(d)
                    kth = float(np.sqrt((d * d).sum(-1)).max())
                    if kth < thr or thr >= 0.5:
                        return idx_b
                    thr = min(0.5, 2.0 * thr)
            return np.stack([host_knn_checked(np.asarray(jax.device_get(pb)))
                             for pb in pn])
        return jax.device_get(knn_periodic_batch(pn, k))

    if cfg.knn_method == "lattice" and n == cells ** 3:
        from nbody_tpu.ops.knn import knn_periodic_lattice_batch
        idx_lat = jax.device_get(knn_periodic_lattice_batch(
            pos_norm, k, cells=cells, window=cfg.knn_window))
        idx_ex = exact_knn(pos_norm)
        p = np.asarray(jax.device_get(pos_norm))

        def ksum(idx_np):
            # total squared neighbor distance per row (tie-insensitive),
            # in f64 so summation order cannot manufacture differences
            out = np.zeros(idx_np.shape[:2], np.float64)
            for bi in range(p.shape[0]):
                pb = p[bi].astype(np.float64)
                d = pb[idx_np[bi]] - pb[:, None, :]
                d -= np.round(d)
                out[bi] = np.sum(d * d, axis=(1, 2))
            return out

        # tolerance: the two searches compute f32 distances along different
        # expression trees, so top-k can break near-ties differently — a
        # ~1e-8 sum wobble that is NOT a missed edge.  A genuinely missed
        # neighbor costs >= O(spacing^2) ~ 1e-3 in the sum; 1e-6 separates
        # the two regimes by orders of magnitude either way.
        return int(np.sum(ksum(idx_lat) > ksum(idx_ex) + 1e-6))
    eff = _effective_band(cfg, band, n, cells)
    if eff is None:
        return 0
    from nbody_tpu.ops.banded import band_violations
    idx = jnp.asarray(exact_knn(pos_norm))
    return int(jax.device_get(band_violations(idx, eff)))


# the shared mask array costs B*N*K*patch bytes of HBM; above this cap the
# in-VMEM Pallas block kernels are the right trade (v5e HBM is 16 GiB and
# the activations need the rest)
MASKED_BYTES_CAP = 8 * 1024 ** 3


def _make_masks(cfg: C.ModelConfig, lat, idx, dtype, record: dict,
                mesh=None):
    """Precomputed shared one-hot masks (neighbor_impl='masked'): one
    (B, NB, ET, P) array per step, consumed by every neighbor op fwd+bwd
    (ops/blocked.block_masks; PERF.md shared-mask formulation).

    Returns (masks, lat): the largest core from the sweep-ranked candidate
    list whose mask array fits MASKED_BYTES_CAP is chosen (big cores are
    faster — PERF.md core sweep — but mask bytes scale with the patch
    width P, so e.g. 64^3 b1 drops from (4,8,8) to (4,4,8)); the chosen
    core is appended to the lattice tuple so every downstream op uses the
    matching block geometry.  (None, lat) -> Pallas block-kernel fallback.
    """
    if cfg.neighbor_impl != "masked" or lat is None:
        return None, lat
    from nbody_tpu.ops.blocked import (MASKED_CORE, block_geometry,
                                       block_masks, block_positions)
    req = getattr(cfg, "mask_dtype", "auto")
    if req != "auto" and mesh is not None and mesh.size > 1:
        # the Pallas mask/idx-dot kernels are opaque to GSPMD: under a
        # sharded mesh XLA cannot partition a pallas_call and would gather
        # its operands to every device — the einsum masks partition cleanly
        # instead (the round-3 HLO-pinned comm story, tests/test_comm_hlo)
        record.update(mask_dtype_requested=req)
        req = "auto"
    if req != "auto" and dtype == jnp.float32:
        # the mask/idx-dot kernels cast operands to bf16 for the MXU dot —
        # silently running them under exact-f32 mode would destroy the very
        # precision f32 mode exists for (code review r4); downgrade to the
        # f32 einsum masks and record it, like the mesh guard above
        record.update(mask_dtype_requested=req)
        req = "auto"
    if req in ("int8", "int4"):
        # integer masks route every neighbor op through the Pallas
        # mask-dot kernels (ops/pallas/mask_kernels.py): 2x/4x less mask
        # HBM bytes — the step's dominant traffic — converted to bf16 in
        # VMEM, which XLA cannot do without materializing a bf16 copy
        mask_dt = jnp.int8 if req == "int8" else jnp.int4
    else:
        mask_dt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    b, n, k = idx.shape
    candidates = [MASKED_CORE, (4, 4, 8), (2, 4, 8), (2, 2, 4), (2, 2, 2)]
    if getattr(cfg, "family", "") == "shiftinv15":
        # the 15-op family's wider K*C-payload passes favor the biggest
        # core: (8,8,8) measured 1059.4 ms vs (4,8,8) 1119.4 at 32^3 b4
        # on chip (PERF.md round-5 15-op headline sweep)
        candidates = [(8, 8, 8)] + candidates
    if getattr(cfg, "masked_core", None):
        candidates = [tuple(cfg.masked_core)] + candidates
    for core in candidates:
        if any(lat[0] % d for d in core):
            continue
        _, ext = block_geometry(lat[0], lat[1], core)
        # slot 0 is the self edge (knn include_self): its masks are dropped
        # (identity copy), so the array covers K-1 slots — 1/K less of the
        # step's dominant HBM traffic (ops/blocked.block_masks)
        if req == "index":
            # mask-free path: only the (B, NB, ET) int32 positions exist —
            # the one-hot is synthesized in VMEM by the idx-dot kernels
            # (ops/pallas/idx_kernels.py), so the HBM cap never binds and
            # the largest (fastest-swept) core is always chosen
            est = b * n * (k - 1) * 4
        else:
            est = (b * n * (k - 1) * ext[0] * ext[1] * ext[2]
                   * jnp.dtype(mask_dt).itemsize)
        if est <= MASKED_BYTES_CAP:
            lat3 = (lat[0], lat[1], core, True)
            record.update(
                impl="masked", core=list(core), mask_bytes=int(est),
                mask_dtype=("index" if req == "index"
                            else jnp.dtype(mask_dt).name),
                fallback=False)
            if req == "index":
                return block_positions(idx, lat[0], lat[1], core=core,
                                       drop_self_slot0=True), lat3
            return block_masks(idx, lat[0], lat[1], dtype=mask_dt,
                               core=core, drop_self_slot0=True), lat3
    import warnings
    record.update(impl="block", core=None, mask_bytes=None, fallback=True)
    warnings.warn(
        "neighbor_impl='masked': no candidate core fits the mask HBM cap "
        f"({MASKED_BYTES_CAP / 2**30:.1f} GiB) at this problem size; "
        "falling back to the Pallas block kernels", stacklevel=2)
    return None, lat


def _mixed_precision(model: Model, dtype) -> Model:
    """Proper mixed precision: parameters (and hence Adam moments) stay f32;
    the forward computes in `dtype` (bf16 on the MXU); predictions return
    in f32 for a stable loss/backward accumulation."""
    if dtype == jnp.float32:
        return model

    def cast(fn, with_idx=False):
        if fn is None:
            return None

        def wrapped(params, x_in, *rest):
            params_c = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
            return fn(params_c, x_in, *rest).astype(jnp.float32)
        return wrapped

    return Model(model.init, cast(model.apply), model.family,
                 cast(model.apply_eval), model.impl_record,
                 model.knn_fn, cast(model.apply_with_idx))


def build_model(cfg: C.ModelConfig, box: float = C.BOX_SIZE,
                mesh=None, batch_replicated: bool = False) -> Model:
    """mesh: optional (data, particle) Mesh — graph families route the
    in-step kNN through the halo-exchange shard_map search when the
    particle axis is sharded (see _make_knn).  batch_replicated: the batch
    is replicated over "data" (ensemble members) rather than sharded."""
    dtype = jnp.dtype(cfg.dtype)
    model = _build_model_inner(cfg, box, dtype, mesh, batch_replicated)
    return _mixed_precision(model, dtype)


def _build_model_inner(cfg: C.ModelConfig, box: float, dtype,
                       mesh=None, batch_replicated: bool = False) -> Model:
    channels = list(cfg.channels)
    record: dict = {}   # filled at first trace by _make_masks

    if cfg.family == "set":
        from nbody_tpu.models import set_net
        if channels[0] != 6:
            channels = list(C.CHANNELS)

        def init(key):
            return set_net.init_set_params(key, channels, jnp.float32)

        def apply(params, x_in):
            return set_net.set_network(params, x_in.astype(dtype))

        return Model(init, apply, "set", impl_record=record)

    if cfg.family == "shiftinv_vel":
        from nbody_tpu.models import shiftinv
        if channels[0] != 9:
            channels = list(C.GRAPH_VEL_CHANNELS)
        cells = int(round(box / 4.0))
        band = _resolve_band(cfg, box)

        def init(key):
            return shiftinv.init_shiftinv_vel_params(key, channels, jnp.float32)

        knn = _make_knn(cfg, box, band, mesh, batch_replicated)
        lattice = ((cells, cfg.knn_window)
                   if (cfg.knn_method == "lattice"
                       and cfg.neighbor_impl in ("block", "masked"))
                   else None)

        def knn_fn(x_in):
            pos, _ = _graph_geometry(x_in, box)
            return knn(pos)

        def apply_with_idx(params, x_in, idx):
            pos, za = _graph_geometry(x_in, box)
            vel = x_in[..., 6:9]
            n = x_in.shape[-2]
            lat = lattice if (lattice and n == cells ** 3) else None
            masks, lat = _make_masks(cfg, lat, idx, dtype, record, mesh)
            return shiftinv.shiftinv_vel_model(
                params, pos.astype(dtype), za.astype(dtype),
                vel.astype(dtype), idx, box,
                band=_effective_band(cfg, band, n, cells),
                remat=cfg.remat, lattice=lat, masks=masks)

        def apply(params, x_in):
            return apply_with_idx(params, x_in, knn_fn(x_in))

        return Model(init, apply, "shiftinv_vel", impl_record=record,
                     knn_fn=knn_fn, apply_with_idx=apply_with_idx)

    if cfg.family in ("shiftinv", "shiftinv15"):
        if channels[0] != 3:
            channels = list(C.GRAPH_CHANNELS)
        cells = int(round(box / 4.0))
        band = _resolve_band(cfg, box)

        if cfg.family == "shiftinv":
            from nbody_tpu.models import shiftinv

            def init(key):
                return shiftinv.init_shiftinv_params(key, channels, jnp.float32)

            knn = _make_knn(cfg, box, band, mesh, batch_replicated)

            lattice = ((cells, cfg.knn_window)
                       if (cfg.knn_method == "lattice"
                           and cfg.neighbor_impl in ("block", "masked"))
                       else None)

            def knn_fn(x_in):
                pos, _ = _graph_geometry(x_in, box)
                return knn(pos)

            def apply_with_idx(params, x_in, idx):
                pos, za = _graph_geometry(x_in, box)
                n = x_in.shape[-2]
                lat = lattice if (lattice and n == cells ** 3) else None
                masks, lat = _make_masks(cfg, lat, idx, dtype, record, mesh)
                return shiftinv.shiftinv_model(
                    params, pos.astype(dtype), za.astype(dtype), idx, box,
                    band=_effective_band(cfg, band, n, cells),
                    remat=cfg.remat, lattice=lat, masks=masks)

            def apply(params, x_in):
                return apply_with_idx(params, x_in, knn_fn(x_in))

            return Model(init, apply, "shiftinv", impl_record=record,
                         knn_fn=knn_fn, apply_with_idx=apply_with_idx)

        from nbody_tpu.models import shiftinv15

        def init(key):
            return shiftinv15.init_shiftinv15_params(key, channels, jnp.float32)

        knn = _make_knn(cfg, box, band, mesh, batch_replicated)
        lattice15 = ((cells, cfg.knn_window)
                     if (cfg.knn_method == "lattice"
                         and cfg.neighbor_impl in ("block", "masked"))
                     else None)

        def knn_fn(x_in):
            pos, _ = _graph_geometry(x_in, box)
            return knn(pos)

        def apply_with_idx(params, x_in, idx):
            pos, za = _graph_geometry(x_in, box)
            n = x_in.shape[-2]
            lat = lattice15 if (lattice15 and n == cells ** 3) else None
            masks, lat = _make_masks(cfg, lat, idx, dtype, record, mesh)
            return shiftinv15.shiftinv15_model(
                params, pos.astype(dtype), za.astype(dtype), idx, box,
                band=_effective_band(cfg, band, n, cells),
                remat=cfg.remat, lattice=lat, masks=masks)

        def apply(params, x_in):
            return apply_with_idx(params, x_in, knn_fn(x_in))

        return Model(init, apply, "shiftinv15", impl_record=record,
                     knn_fn=knn_fn, apply_with_idx=apply_with_idx)

    if cfg.family == "attn":
        from nbody_tpu.models import attn
        if channels[0] != 6:
            channels = list(C.ATTN_CHANNELS)

        def init(key):
            return attn.init_attn_params(key, channels, jnp.float32)

        def apply(params, x_in):
            return attn.attn_network(params, x_in.astype(dtype),
                                     batch_coupled_gate=cfg.batch_coupled_gate)

        def apply_eval(params, x_in):
            return attn.attn_network(params, x_in.astype(dtype),
                                     batch_coupled_gate=cfg.batch_coupled_gate,
                                     train_mode=False)

        return Model(init, apply, "attn", apply_eval, record)

    raise ValueError(f"unknown model family: {cfg.family!r}")
