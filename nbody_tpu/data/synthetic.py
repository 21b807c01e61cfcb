"""Synthetic ZA/FastPM-like cube generator.

The real datasets (ZA_001.npy ... ZA_010.npy, shape (1000, 32, 32, 32, 19),
reference utils.py:530-545) are not present in this environment, so the
framework ships a physically-flavored generator producing the same schema:

  * ZA displacements: gradient of a Gaussian random potential with a
    power-law spectrum (smooth, curl-free — like real Zel'dovich fields).
  * 2LPT displacements: ZA plus a small second-order correction.
  * FastPM displacements: ZA plus a *nonlinear, locally-determined*
    correction, so the learning problem (predict fpm - za from [grid, za])
    is well-posed and models can demonstrably reduce the loss.
  * Velocities proportional to displacements (exact for ZA growth).

Used for tests and for benchmarking when no real data is on disk.
"""

from __future__ import annotations

import numpy as np


def _za_displacement_field(rng: np.random.Generator, cells: int,
                           amplitude: float, slope: float = -2.5) -> np.ndarray:
    """(C, C, C, 3) smooth random displacement = -grad(phi), periodic."""
    k1 = np.fft.fftfreq(cells) * cells
    kx, ky, kz = np.meshgrid(k1, k1, k1, indexing="ij")
    k2 = kx**2 + ky**2 + kz**2
    k2[0, 0, 0] = 1.0
    power = k2 ** (slope / 2.0)
    power[0, 0, 0] = 0.0
    noise = rng.normal(size=(cells, cells, cells))
    phi_k = np.fft.fftn(noise) * power
    disp = np.empty((cells, cells, cells, 3))
    for d, kd in enumerate((kx, ky, kz)):
        disp[..., d] = np.real(np.fft.ifftn(1j * kd * phi_k))
    rms = np.sqrt(np.mean(disp ** 2)) + 1e-12
    return disp * (amplitude / rms)


def synthetic_raw_cubes(num_samples: int = 16, cells: int = 32,
                        seed: int = 0, za_rms: float = 1.0) -> np.ndarray:
    """Generate (S, C, C, C, 19) raw cubes matching the reference schema.

    Column layout (reference utils.py:538-544):
      [...,  1: 4] ZA displacements     [..., 10:13] ZA velocity
      [...,  4: 7] 2LPT displacements   [..., 13:16] 2LPT velocity
      [...,  7:10] FastPM displacements [..., 16:19] FastPM velocity
    Displacements are in grid units (box = 4*C like the real 128-box data).
    """
    rng = np.random.default_rng(seed)
    out = np.zeros((num_samples, cells, cells, cells, 19), dtype=np.float32)
    for s in range(num_samples):
        za = _za_displacement_field(rng, cells, amplitude=za_rms)
        # second-order-like correction: quadratic in the local field
        za_mag2 = np.sum(za ** 2, axis=-1, keepdims=True)
        lpt2 = za * (1.0 + 0.05 * za_mag2)
        # "FastPM" truth: nonlinear local response of the ZA field plus a
        # small smooth component — deterministic given ZA, hence learnable.
        fpm = za * (1.0 + 0.15 * np.tanh(za_mag2)) + 0.05 * np.roll(za, 1, axis=0)
        f_growth = 0.5  # velocity ~ f * H * displacement, arbitrary units
        out[s, ..., 1:4] = za
        out[s, ..., 4:7] = lpt2
        out[s, ..., 7:10] = fpm
        out[s, ..., 10:13] = f_growth * za
        out[s, ..., 13:16] = f_growth * lpt2
        out[s, ..., 16:19] = f_growth * fpm
    return out
