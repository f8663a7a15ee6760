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
    """Synthetic TRILEGAL-like table parseable by trilegal_results
    (columns as saved by save_trilegal; last two rows are dropped by the
    parser like the reference's termination banner)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    n = n_stars + 2
    mact = rng.uniform(0.2, 1.5, n)
    logte = np.log10(np.clip(3000 + 4000 * mact, 2900, 9800))
    logg = rng.uniform(3.6, 5.0, n)
    tmag = rng.uniform(Tmag_target, Tmag_target + 10, n)
    j = tmag - rng.uniform(0.3, 1.2, n)
    h = j - rng.uniform(0.05, 0.4, n)
    ks = h - rng.uniform(0.02, 0.2, n)
    df = pd.DataFrame({
        "Gc": np.ones(n, int), "logAge": np.full(n, 9.0),
        "[M/H]": rng.uniform(-0.5, 0.3, n), "m_ini": mact,
        "Mact": mact, "logL": np.zeros(n), "logTe": logte, "logg": logg,
        "m-M0": np.full(n, 10.0), "Av": np.zeros(n),
        "TESS": tmag, "J": j, "H": h, "Ks": ks,
    })
    df.to_csv(path)
    return str(path)
