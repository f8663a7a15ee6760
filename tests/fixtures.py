"""Shared offline test fixtures: synthetic light curves and a synthetic
TRILEGAL population csv (no network)."""

import numpy as np
import jax.numpy as jnp

from triceratops_tpu.constants import G, MSUN, RSUN, REARTH
from triceratops_tpu.core.kepler import projected_z
from triceratops_tpu.ops.occult import occult_quad_deficit


def make_transit_lightcurve(n_t=120, P=3.0, M_s=1.0, R_s=1.0, rp_re=10.0,
                            inc=89.5, u1=0.4, u2=0.2, sigma=5e-4, seed=0,
                            window=0.15):
    """Noise-free transit + Gaussian noise; returns (time, flux, sigma,
    depth_ppm)."""
    time = np.linspace(-window, window, n_t)
    a = ((G * M_s * MSUN) / (4 * np.pi**2) * (P * 86400.0) ** 2) ** (1 / 3)
    a_R = a / (R_s * RSUN)
    k = rp_re * REARTH / (R_s * RSUN)
    z, front = projected_z(jnp.asarray(time), 0.0, P, a_R,
                           np.deg2rad(inc), 0.0, 0.0)
    D = np.asarray(occult_quad_deficit(jnp.float64(k), z,
                                       jnp.float64(u1), jnp.float64(u2)))
    D = D * np.asarray(front)
    flux = 1.0 - D
    rng = np.random.default_rng(seed)
    flux_noisy = flux + rng.normal(0, sigma, n_t)
    depth_ppm = float(D.max() * 1e6)
    return time, flux_noisy, sigma, depth_ppm


def make_trilegal_csv(path, n_stars=300, Tmag_target=10.0, seed=0):
    """Synthetic background population parseable by trilegal_results
    (physically consistent; see populations/synthetic.py)."""
    from triceratops_tpu.populations.synthetic import make_synthetic_trilegal
    return make_synthetic_trilegal(path, Tmag_target=Tmag_target,
                                   n_stars=n_stars, seed=seed)
