"""nbody_tpu — TPU-native N-body point-cloud evolution framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference TF1 codebase (evdcush/N-Body_PointCloudEvolution): neural networks
that correct cheap analytic N-body cosmology approximations (Zel'dovich, "ZA")
toward quasi-N-body simulation truth (FastPM) on periodic particle cubes.

Design stance (TPU-first, see SURVEY.md §7):
  * The reference's host/device split — numpy+sklearn kNN graph build on CPU,
    TF math on device, feed_dict every step — inverts here: the entire train
    step (periodic kNN rebuild, graph featurization, network fwd/bwd, Adam
    update) is ONE jitted, donated XLA program.
  * Periodic boundary conditions live in the distance metric (min-image),
    replacing the reference's host-side ghost-particle padding
    (reference graph.py:798-917).
  * kNN graphs are dense (b, N, K) int32 neighbor-index arrays — no CSR/COO
    sparse formats (reference graph.py:570-697); segment IDs are derived by
    iota arithmetic when needed.
  * Scaling is mesh-based: data-parallel batches, particle-axis sharding,
    multi-seed ensembles via jax.sharding + shard_map over ICI.
"""

__version__ = "0.1.0"

from nbody_tpu import config  # noqa: F401
