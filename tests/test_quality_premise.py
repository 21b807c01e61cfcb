"""The quality leg's premise, pinned.

The reference's headline quality comparison scores a trained model against
the least-squares linear-velocity baseline (reference
visualization/plot_eval.py:85-93,130-147).  For that comparison to be
meaningful on synthetic data, the generator must produce a truth that is
(a) NOT absorbable by the baseline's single fitted timestep, and (b)
locally learnable by a graph model with a few-cell receptive field.  An
earlier generator failed (a)-by-construction (truth nearly affine in the
input velocity); these tests pin the 2LPT-based generator's guarantees so
future edits cannot silently reintroduce an unwinnable or unlearnable
learning problem.
"""

import numpy as np
import pytest

from nbody_tpu.data.synthetic import synthetic_raw_cubes, _lpt_displacement_fields


CELLS = 16


@pytest.fixture(scope="module")
def raw():
    return synthetic_raw_cubes(num_samples=4, cells=CELLS, seed=0)


def _cols(raw):
    s = raw.shape[0]
    za = raw[..., 1:4].reshape(s, -1, 3)
    lpt2 = raw[..., 4:7].reshape(s, -1, 3)
    fpm = raw[..., 7:10].reshape(s, -1, 3)
    return za, lpt2, fpm


def test_psi1_curl_free():
    """ZA displacements are a gradient field: curl(psi1) == 0 spectrally."""
    rng = np.random.default_rng(3)
    psi1, _, _ = _lpt_displacement_fields(rng, CELLS, amplitude=1.0)
    k1 = np.fft.fftfreq(CELLS) * CELLS
    kx, ky, kz = np.meshgrid(k1, k1, k1, indexing="ij")
    fk = [np.fft.fftn(psi1[..., d]) for d in range(3)]
    curl = [kx * fk[1] - ky * fk[0], ky * fk[2] - kz * fk[1],
            kz * fk[0] - kx * fk[2]]
    num = sum(np.abs(c).sum() for c in curl)
    den = sum(np.abs(k * f).sum() for k, f in zip((kx, ky, kz), fk))
    assert num / den < 1e-8


def test_psi2_solves_2lpt_poisson():
    """psi2 is (up to the documented epoch rescale) the gradient of the
    solution of del^2 phi2 = sum_{i<j}[phi1,ii phi1,jj - phi1,ij^2]."""
    rng = np.random.default_rng(7)
    psi1, psi2, _ = _lpt_displacement_fields(rng, CELLS, amplitude=1.0)
    # Recompute the source from psi1 alone (phi1,ij = -d psi1_i / d x_j).
    k1 = np.fft.fftfreq(CELLS) * CELLS
    kv = np.meshgrid(k1, k1, k1, indexing="ij")
    k2 = sum(k ** 2 for k in kv)
    k2[0, 0, 0] = 1.0
    psik = [np.fft.fftn(psi1[..., d]) for d in range(3)]
    hess = {}
    for i in range(3):
        for j in range(3):
            hess[(i, j)] = np.real(np.fft.ifftn(-1j * kv[j] * psik[i]))
    src = (hess[(0, 0)] * hess[(1, 1)] - hess[(0, 1)] ** 2
           + hess[(0, 0)] * hess[(2, 2)] - hess[(0, 2)] ** 2
           + hess[(1, 1)] * hess[(2, 2)] - hess[(1, 2)] ** 2)
    phi2k = -np.fft.fftn(src) / k2
    phi2k[0, 0, 0] = 0.0
    expect = np.stack([np.real(np.fft.ifftn(1j * k * phi2k)) for k in kv], -1)
    # parallel up to a positive scalar (the epoch rescale)
    a, b = expect.ravel(), psi2.ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9999


def test_delta_is_minus_divergence_of_psi1():
    """The returned density contrast is -div(psi1) (continuity equation at
    first order), up to the unit-rms normalization."""
    rng = np.random.default_rng(5)
    psi1, _, delta = _lpt_displacement_fields(rng, CELLS, amplitude=1.0)
    k1 = np.fft.fftfreq(CELLS) * CELLS
    kv = np.meshgrid(k1, k1, k1, indexing="ij")
    div = sum(np.real(np.fft.ifftn(1j * kv[d] * np.fft.fftn(psi1[..., d])))
              for d in range(3))
    cos = (-div.ravel() @ delta.ravel()) / (
        np.linalg.norm(div) * np.linalg.norm(delta))
    assert cos > 0.9999, cos
    assert abs(np.std(delta) - 1.0) < 1e-6


def test_coupling_term_is_one_hop_learnable():
    """The psi1*delta mode-coupling term added to the FastPM truth is
    (a) orthogonal to the baseline's fitted direction (quadratic in the
    Gaussian field — third moments vanish), and (b) visible in ONE hop:
    the 6-neighbor central-difference divergence of psi1 — exactly the
    information in neighbor relative positions — reproduces delta at
    cos > 0.85 (measured 0.917 at 16^3)."""
    rng = np.random.default_rng(5)
    psi1, _, delta = _lpt_displacement_fields(rng, CELLS, amplitude=1.0)
    coup = psi1 * delta[..., None]
    cos_base = abs(coup.ravel() @ psi1.ravel()) / (
        np.linalg.norm(coup) * np.linalg.norm(psi1))
    assert cos_base < 0.05, cos_base
    fd = np.zeros_like(delta)
    for d in range(3):
        fd -= (np.roll(psi1[..., d], -1, axis=d)
               - np.roll(psi1[..., d], 1, axis=d)) / 2.0
    cos_fd = (fd.ravel() @ delta.ravel()) / (
        np.linalg.norm(fd) * np.linalg.norm(delta))
    assert cos_fd > 0.85, cos_fd


def test_linear_velocity_baseline_cannot_absorb_truth(raw):
    """The target residual fpm - za keeps >=80% of its rms after the best
    global linear-velocity fit — the baseline is honestly beatable."""
    za, _, fpm = _cols(raw)
    tgt = fpm - za
    vel = 0.5 * za  # ZA velocity column is f_growth * za
    t = (vel.ravel() @ tgt.ravel()) / (vel.ravel() @ vel.ravel())
    resid = tgt - t * vel
    frac = np.sqrt((resid ** 2).sum() / (tgt ** 2).sum())
    assert frac > 0.8, frac


def test_second_order_term_dominates_target(raw):
    """psi2 (the structure-dependent, baseline-orthogonal part) carries the
    bulk of the target: a model that learns it wins by a wide margin."""
    za, lpt2, fpm = _cols(raw)
    psi2 = lpt2 - za
    tgt = fpm - za
    # psi2 is nearly uncorrelated with za (quadratic in the Gaussian field)
    c = abs(psi2.ravel() @ za.ravel()) / (
        np.linalg.norm(psi2) * np.linalg.norm(za))
    assert c < 0.2, c
    assert (psi2 ** 2).sum() / (tgt ** 2).sum() > 0.5


def test_psi2_is_locally_determined():
    """>=85% of psi2's variance is reconstructible from the source field
    within a 3-cell-radius window (Green's function truncation) — i.e. the
    learning problem sits inside a graph model's receptive field."""
    rng = np.random.default_rng(0)
    cells = CELLS
    k1 = np.fft.fftfreq(cells) * cells
    kv = np.meshgrid(k1, k1, k1, indexing="ij")
    k2 = sum(k ** 2 for k in kv)
    k2[0, 0, 0] = 1.0
    power = k2 ** (-2.5 / 2.0)
    power[0, 0, 0] = 0.0
    phik = np.fft.fftn(rng.normal(size=(cells,) * 3)) * power
    hess = {}
    for i in range(3):
        for j in range(i, 3):
            hess[(i, j)] = np.real(np.fft.ifftn(-(kv[i] * kv[j]) * phik))
    src = (hess[(0, 0)] * hess[(1, 1)] - hess[(0, 1)] ** 2
           + hess[(0, 0)] * hess[(2, 2)] - hess[(0, 2)] ** 2
           + hess[(1, 1)] * hess[(2, 2)] - hess[(1, 2)] ** 2)
    srck = np.fft.fftn(src)
    phi2k = -srck / k2
    phi2k[0, 0, 0] = 0.0
    psi2 = np.stack([np.real(np.fft.ifftn(1j * k * phi2k)) for k in kv], -1)

    r1 = np.minimum(np.arange(cells), cells - np.arange(cells))
    rx, ry, rz = np.meshgrid(r1, r1, r1, indexing="ij")
    win = (np.sqrt(rx ** 2 + ry ** 2 + rz ** 2) <= 3.0).astype(float)
    approx = np.empty_like(psi2)
    for d in range(3):
        gk = 1j * kv[d] / k2
        gk[0, 0, 0] = 0.0
        gk_win = np.fft.fftn(np.real(np.fft.ifftn(gk)) * win)
        approx[..., d] = np.real(np.fft.ifftn(gk_win * srck))
    a, b = approx.reshape(-1), psi2.reshape(-1)
    coef = (a @ b) / (a @ a)
    frac = 1.0 - ((b - coef * a) ** 2).sum() / (b ** 2).sum()
    assert frac > 0.85, frac
