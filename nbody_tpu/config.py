"""Configuration: dataclasses + reference-compatible CLI.

Replaces the reference's module-level constants and argparse parser
(reference utils.py:142-202, utils.py:242-271) with a typed, immutable config.
Flag names and semantics are kept: -c -i -b -d -k -n -s -l -t.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Dataset constants (reference utils.py:142-153, 530-545)
# ---------------------------------------------------------------------------
NUM_SAMPLES = 1000
CELLS_PER_SIDE = 32
NUM_PARTICLES = CELLS_PER_SIDE ** 3          # 32**3 (reference utils.py:148)
DATASET_SEED = 12345                          # reference utils.py:149
BOX_SIZE = 128.0                              # raw grid spans [2, 126] step 4
GRID_OFFSET = 64.0                            # reference stores q - 64 (utils.py:615)

# 19-column raw cube schema (reference utils.py:530-545)
COL_ZA_DISP = slice(1, 4)
COL_2LPT_DISP = slice(4, 7)
COL_FPM_DISP = slice(7, 10)
COL_ZA_VEL = slice(10, 13)
COL_2LPT_VEL = slice(13, 16)
COL_FPM_VEL = slice(16, 19)

# Redshift vocabulary: 20 snapshots, z = 9.0 -> 0.0
# (reference visualization/plot_eval.py:19-21)
REDSHIFTS = [9.0000, 4.7897, 3.2985, 2.4950, 1.9792, 1.6141, 1.3385,
             1.1212, 0.9438, 0.7955, 0.6688, 0.5588, 0.4620, 0.3758,
             0.2983, 0.2280, 0.1639, 0.1049, 0.0505, 0.0000]

# ---------------------------------------------------------------------------
# Model constants (reference utils.py:156-202)
# ---------------------------------------------------------------------------
PARAMS_SEED = 77743196                        # reference utils.py:161
CHANNELS = [6, 64, 128, 128, 256, 64, 128, 16, 3]   # reference utils.py:165
# Graph models take 3-channel edge features (relative positions / ZA on the
# self-edge, reference graph.py:289-343); the reference kept graph nets
# shallow for memory (utils.py:163 comment) — same spirit here.
GRAPH_CHANNELS = [3, 32, 64, 64, 32, 16, 3]
# velocity-aware graph model: 9-channel edge features (rel pos + node vels,
# reference include_node_features graph.py:245-275), 6-channel residual out
GRAPH_VEL_CHANNELS = [9, 32, 64, 64, 32, 16, 6]
# Attention/residual model channel list (reference experiment.py:25)
ATTN_CHANNELS = [6] + [16] * 22 + [3]
NUM_NEIGHBORS = 14                            # reference utils.py:166
BIAS_INIT = 1e-8                              # reference utils.py:334
SCALAR_INIT = 0.002                           # reference utils.py:182

BATCH_SIZE = 4                                # reference utils.py:191
NUM_ITERS = 20000                             # reference utils.py:192
NUM_TEST_SAMPLES = 200                        # reference utils.py:193
LEARN_RATE = 0.01                             # reference utils.py:267-268
NUM_VAL_SAMPLES = 100                         # reference utils.py:589

# Model naming (reference utils.py:120-139)
MODEL_NAME_ZA = "ZA-FPM_{}"
CUBE_NAME = "X_{}"
MODEL_TAGLIST = ["arae", "boot", "cari", "drac", "erid", "forn", "gemi",
                 "hyda", "indi", "lyra", "mensa", "norma", "orion", "pavo",
                 "reti", "scut", "taur", "ursa", "virgo"]

MODEL_FAMILIES = ("set", "shiftinv", "shiftinv15", "attn", "shiftinv_vel")


def default_data_dir() -> str:
    return os.environ.get(
        "NBODY_DATA_DIR",
        os.path.join(os.environ.get("HOME", "."), ".Data", "nbody_simulations", "ZA"))


def default_experiments_dir() -> str:
    return os.environ.get(
        "NBODY_EXPERIMENTS_DIR",
        os.path.join(os.environ.get("HOME", "."), ".Data", "Experiments", "Nbody"))


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset selection + split. Mirrors reference Dataset (utils.py:547-621)."""
    data_dir: str = dataclasses.field(default_factory=default_data_dir)
    data_idx: int = 0
    num_test: int = NUM_TEST_SAMPLES
    num_val: int = NUM_VAL_SAMPLES
    seed: int = DATASET_SEED
    cells_per_side: int = CELLS_PER_SIDE
    # joint position+velocity task (9 input channels, 6 target channels)
    include_velocity: bool = False
    # synthetic fallback when no ZA_*.npy on disk (this environment has none)
    synthetic_num_samples: int = NUM_SAMPLES
    # stream train batches off disk via the native mmap loader
    # (native/npy_loader.cc) with background prefetch, instead of loading
    # the whole cube file into RAM
    streaming: bool = False

    @property
    def num_particles(self) -> int:
        return self.cells_per_side ** 3


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    family: str = "set"                       # one of MODEL_FAMILIES
    channels: Tuple[int, ...] = tuple(CHANNELS)
    k_neighbors: int = NUM_NEIGHBORS
    seed: int = PARAMS_SEED
    # attention model extras (reference experiment.py:22-33)
    batch_coupled_gate: bool = True           # reference reshapes (B*N,k) before the gate
    dtype: str = "float32"                    # compute dtype for activations
    # neighbor-index band for the MXU gather/scatter path (ops/banded.py):
    # "auto" derives it from the cube geometry; None disables the band
    # assumption (exact for arbitrary point sets); an int sets it explicitly.
    band: object = "auto"
    # kNN search algorithm: "lattice" (cell-list rolls, fastest, exact for
    # grid-ordered cubes), "banded" (index slab), "exact" (O(N^2))
    knn_method: str = "lattice"
    # lattice search window (grid cells): 3 is conservative; 2 is exact for
    # displacements < ~1.5 grid spacings (true for ZA fields at these
    # redshifts; verify with ops.knn.lattice_violations) and ~1.5x faster
    knn_window: int = 3
    # lattice-search k-selection: "sort" = jax.lax.top_k (full candidate
    # sort); "iter" = k argmin+mask passes (ops.knn.topk_min_iter) — exact,
    # same tie order, avoids sorting (2w+1)^3 lanes for k << that;
    # "pallas" = the same passes with the row tile resident in VMEM
    # (ops/pallas/topk_kernels.py) — one HBM read of the distances total
    knn_select: str = "sort"
    # rematerialize graph layers in backward (memory for FLOPs; 64^3 cubes)
    remat: bool = False
    # neighbor gather/scatter implementation on TPU:
    #   "masked" — one-hot selection masks precomputed ONCE per step from
    #              idx and shared by every neighbor op fwd+bwd; each op is
    #              one XLA batched matmul (no Mosaic per-grid-step floor).
    #              Fastest at 32^3; costs O(N*K*patch) bytes of HBM for the
    #              masks, so large cubes may prefer "block".
    #   "block"  — 3D-block patches, Pallas one-hot dots regenerated
    #              in-VMEM per op — wrap-correct by construction, constant
    #              patch size (scales to 64^3+), minimal HBM.
    #   "banded" — flat index-slab one-hot matmuls (no cube assumption).
    # "masked"/"block" require lattice kNN on a full cube; non-cube data
    # falls back to the banded path; "masked" falls back to "block" above
    # its HBM cap (models/registry.MASKED_BYTES_CAP).  Fastest measured
    # impl at 32^3 b4 K14 in every platform state seen so far (PERF.md
    # has the core sweep and the platform-state caveats).
    neighbor_impl: str = "masked"
    # masked-path core block shape override (None = ops.blocked.MASKED_CORE,
    # swept-optimal); the registry still steps down the candidate list if
    # the mask array would exceed its HBM cap
    masked_core: Optional[Tuple[int, int, int]] = None
    # masked-path mask storage dtype: "auto" follows the compute dtype
    # (bf16/f32 one XLA einsum per op); "int8"/"int4" cut the mask HBM
    # bytes — the step's dominant traffic — 2x/4x by routing every
    # neighbor op through the Pallas mask-dot kernels (integer tile
    # converted to bf16 in VMEM; ops/pallas/mask_kernels.py); "index"
    # stores only the (B, NB, ET) int32 per-edge patch positions and
    # synthesizes the one-hot in VMEM (ops/pallas/idx_kernels.py) — no
    # mask array in HBM at all (~100-800x less mask traffic).  The
    # kernel dots run bf16 on the MXU, so exact-f32 mode should keep
    # "auto".
    mask_dtype: str = "auto"

    @property
    def num_layers(self) -> int:
        return len(self.channels) - 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_iters: int = NUM_ITERS
    batch_size: int = BATCH_SIZE
    learn_rate: float = LEARN_RATE
    checkpoint_every: int = 250               # reference train.py:29
    experiments_dir: str = dataclasses.field(default_factory=default_experiments_dir)
    name: str = ""                            # random constellation tag if empty
    restore: bool = False
    # optimizer steps fused per device dispatch (lax.scan); 0 = one jitted
    # step per dispatch.  Large values amortize host/tunnel latency —
    # checkpoint/metric granularity becomes scan_chunk steps.
    scan_chunk: int = 0
    # device-resident training set ("auto"/"on"/"off"): stage X_train in
    # HBM once and slice minibatches INSIDE the jitted scan, so each
    # dispatch ships only a (T, b) int32 index block instead of streaming
    # (T, b, N, C) batches host->device.  "auto" turns it on for the
    # single-device scan path when the training set fits the HBM budget
    # (NBODY_DEVICE_DATA_CAP_GB, default 6).  Measured on the tunneled
    # TPU: the host batch stream costs ~300 ms/step at 32^3 b4 (~30 MB/s
    # link) on top of the 171 ms device step.
    device_data: str = "auto"
    # parallelism
    data_axis: int = 1                        # mesh size along batch axis
    particle_axis: int = 1                    # mesh size along particle axis
    # multi-seed ensemble: train E independent models as ONE jitted program,
    # members sharded over the "data" mesh axis (BASELINE.json config 5);
    # 0/1 = ordinary single-model training
    ensemble: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def build_parser() -> argparse.ArgumentParser:
    """Reference-compatible CLI (reference utils.py:242-271)."""
    p = argparse.ArgumentParser(
        description="Train an N-body ZA->FastPM correction model (TPU-native).",
        formatter_class=argparse.RawTextHelpFormatter)
    adg = p.add_argument
    adg("-c", "--channels", type=int, nargs="+", default=list(CHANNELS),
        metavar="C", help="List of ints that define layer sizes")
    adg("-i", "--num_iters", type=int, default=NUM_ITERS, metavar="N",
        help="Number of training iterations")
    adg("-b", "--batch_size", type=int, default=BATCH_SIZE, metavar="B",
        help="Number of samples per training batch")
    adg("-d", "--data_idx", type=int, default=0, metavar="i",
        help="Index of the dataset file (ZA_001.npy ... ZA_010.npy)")
    adg("-k", "--kneighbors", type=int, default=NUM_NEIGHBORS, metavar="K",
        help="Number of neighbors in graph model (KNN); K == -1 selects set model")
    adg("-n", "--name", type=str, default="", metavar="name",
        help="Name for model; randomly generated if not specified")
    adg("-s", "--seed", type=int, default=PARAMS_SEED, metavar="X",
        help="Random seed for parameter initialization")
    adg("-l", "--learnrate", type=float, default=LEARN_RATE, metavar="lr",
        help="Learning rate for optimizer")
    adg("-t", "--num_test", type=int, default=NUM_TEST_SAMPLES, metavar="M",
        help="Number of samples in test set")
    # new framework flags (no reference equivalent)
    adg("--model", type=str, default=None, choices=list(MODEL_FAMILIES),
        help="Model family; default: 'set' if -k == -1 else 'shiftinv'")
    adg("--data_dir", type=str, default=None, help="Directory with ZA_*.npy cubes")
    adg("--synthetic", action="store_true",
        help="Force synthetic data even if real cubes exist")
    adg("--velocity", action="store_true",
        help="Joint position+velocity task (9 input, 6 target channels)")
    adg("--streaming", action="store_true",
        help="Stream train batches off disk via the native mmap loader "
             "(background prefetch); requires a real ZA_*.npy file")
    adg("--cells", type=int, default=CELLS_PER_SIDE,
        help="Cube cells per side (particles = cells^3)")
    adg("--samples", type=int, default=NUM_SAMPLES, metavar="S",
        help="Synthetic dataset size (cubes generated when no real data; "
             "reference datasets are fixed at 1000, utils.py:530-545). "
             "Train AND eval must agree for the held-out split to match")
    adg("-r", "--restore", action="store_true",
        help="Restore pretrained model parameters (works here, unlike the reference)")
    adg("--scan", type=int, default=0, metavar="T",
        help="Fuse T optimizer steps per device dispatch (lax.scan); "
             "amortizes host latency on tunneled TPUs")
    adg("--device_data", type=str, default="auto",
        choices=["auto", "on", "off"],
        help="Stage the training set in device HBM once and slice "
             "minibatches inside the jitted scan (dispatches ship (T, b) "
             "int32 indices, not batches). 'auto' enables it on the "
             "single-device --scan path when X_train fits the HBM budget")
    adg("--masked_core", type=int, nargs=3, default=None, metavar="D",
        help="Masked-path core block shape (3 ints); default = swept optimum")
    adg("--impl", type=str, default="masked",
        choices=["masked", "block", "banded"],
        help="Neighbor gather/scatter implementation (ModelConfig."
             "neighbor_impl): 'masked' shared one-hot einsums (the swept "
             "TPU optimum), 'block'/'banded' Pallas one-hot dots on TPU. "
             "On CPU backends block/banded lower to XLA's native gather "
             "— the fast choice there, where the masked path's one-hot "
             "matmuls dominate the step")
    adg("--mask_dtype", type=str, default="auto",
        choices=["auto", "int8", "int4", "index"],
        help="Mask storage dtype: int8/int4 = Pallas mask-dot path (2x/4x "
             "less mask HBM traffic); index = mask-free idx-dot path (the "
             "one-hot is synthesized in VMEM; bf16 MXU dots)")
    adg("--remat", action="store_true",
        help="Rematerialize graph layers in backward (jax.checkpoint): "
             "trades FLOPs for HBM so 64^3 cubes fit on one chip")
    adg("--knn_select", type=str, default="sort",
        choices=["sort", "iter", "pallas"],
        help="Lattice kNN k-selection: top_k sort, k argmin passes, or the "
             "VMEM-resident Pallas selection kernel")
    adg("--knn_window", type=int, default=3, metavar="W",
        help="Lattice kNN search window in grid cells (2 is exact for "
             "ZA-scale displacements and faster; the coverage guard "
             "verifies either way)")
    adg("--dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="Compute dtype for activations (params/optimizer stay f32; "
             "bfloat16 is the TPU MXU setup and is required for the "
             "int8/int4/index mask kernels — exact-f32 mode downgrades "
             "them to einsum masks)")
    adg("--ensemble", type=int, default=0, metavar="E",
        help="Train an E-member multi-seed ensemble as one jitted program, "
             "members sharded over the device mesh (seeds -s, -s+1, ...)")
    adg("--data_axis", type=int, default=1, help="Mesh size along data-parallel axis")
    adg("--particle_axis", type=int, default=1, help="Mesh size along particle axis")
    adg("--platform", type=str, default="auto", choices=["auto", "cpu", "tpu"],
        help="Force a JAX platform (this machine's site config pins 'axon'; "
             "env vars alone cannot override it)")
    adg("--trace", type=str, default="", metavar="DIR",
        help="Capture a jax.profiler trace of the training loop into DIR "
             "(view with TensorBoard / xprof)")
    return p


def apply_platform(platform: str):
    """Force the JAX platform before any computation. Must run before the
    first jax op; env vars are insufficient on hosts whose site customization
    pins a platform (see tests/conftest.py)."""
    if platform and platform != "auto":
        import jax
        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(cache_dir: Optional[str] = None):
    """Persistent XLA compilation cache: compiled executables survive across
    processes.  Important on this machine — TPU compiles go through a remote
    tunnel that is slow (20-60s per program) and occasionally drops."""
    import jax
    if os.environ.get("NBODY_DISABLE_COMPILATION_CACHE"):
        return
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def config_from_args(args: argparse.Namespace) -> Config:
    family = args.model
    if family is None:
        if args.velocity:
            family = "shiftinv_vel"
        else:
            family = "set" if args.kneighbors == -1 else "shiftinv"
    data_dir = args.data_dir or default_data_dir()
    if args.synthetic:
        data_dir = os.path.join(os.path.sep, "nonexistent-force-synthetic")
    data = DataConfig(
        data_dir=data_dir,
        data_idx=args.data_idx,
        num_test=args.num_test,
        # the CLI exposes no --num_val; scale the reference's fixed 100
        # (utils.py:589) with the dataset so a small --samples set is not
        # starved of train cubes (100/1000 = 10%, preserved exactly at the
        # reference size)
        num_val=min(NUM_VAL_SAMPLES, max(1, args.samples // 10)),
        cells_per_side=args.cells,
        synthetic_num_samples=args.samples,
        include_velocity=args.velocity,
        streaming=args.streaming)
    model = ModelConfig(
        family=family,
        channels=tuple(args.channels),
        k_neighbors=(args.kneighbors if args.kneighbors > 0 else NUM_NEIGHBORS),
        seed=args.seed,
        masked_core=(tuple(args.masked_core) if args.masked_core else None),
        neighbor_impl=args.impl,
        mask_dtype=args.mask_dtype,
        knn_select=args.knn_select,
        knn_window=args.knn_window,
        remat=args.remat,
        dtype=args.dtype)
    train = TrainConfig(
        num_iters=args.num_iters,
        batch_size=args.batch_size,
        learn_rate=args.learnrate,
        name=args.name,
        restore=args.restore,
        scan_chunk=args.scan,
        device_data=args.device_data,
        data_axis=args.data_axis,
        particle_axis=args.particle_axis,
        ensemble=args.ensemble)
    return Config(data=data, model=model, train=train)
