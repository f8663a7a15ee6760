"""End-to-end offline example: vet a synthetic TESS planet candidate.

Mirrors the reference's examples/example.ipynb workflow (field setup ->
calc_depths -> calc_probs -> FPP/NFPP -> plots) without any network
access: the star field, TRILEGAL population, and light curve are built
locally. Swap `target.from_stars` for `target(ID, sectors)` to run
against live MAST/TessCut/TRILEGAL services.

Run:  python examples/example_offline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import pandas as pd

import matplotlib
matplotlib.use("Agg")

from triceratops_tpu import target
from triceratops_tpu.constants import G, MSUN, RSUN, REARTH
from triceratops_tpu.core.kepler import projected_z
from triceratops_tpu.ops.occult import occult_quad_deficit
import jax.numpy as jnp


def make_field():
    """A bright target plus one faint nearby star, with the TIC columns
    calc_probs needs."""
    return pd.DataFrame([
        dict(ID="100100100", Tmag=9.7, Jmag=8.9, Hmag=8.7, Kmag=8.6,
             ra=120.0, dec=-30.0, mass=1.05, rad=1.02, Teff=5900.0,
             plx=12.0, **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0}),
        dict(ID="100100101", Tmag=14.2, Jmag=13.5, Hmag=13.3, Kmag=13.2,
             ra=120.002, dec=-30.003, mass=0.6, rad=0.6, Teff=4000.0,
             plx=3.0, **{"sep (arcsec)": 18.0, "PA (E of N)": 120.0}),
    ])


def make_trilegal(path, Tmag=9.7, n=3000, seed=0):
    from triceratops_tpu.populations.synthetic import make_synthetic_trilegal
    return make_synthetic_trilegal(path, Tmag_target=Tmag, n_stars=n,
                                   seed=seed)


def make_lightcurve(P=3.2, rp_re=6.0, M_s=1.05, R_s=1.02, sigma=4e-4,
                    n_t=120, seed=1):
    """Synthetic phase-folded transit of a warm mini-Neptune."""
    time = np.linspace(-0.15, 0.15, n_t)
    a = ((G * M_s * MSUN) / (4 * np.pi**2) * (P * 86400) ** 2) ** (1 / 3)
    z, front = projected_z(jnp.asarray(time), 0.0, P, a / (R_s * RSUN),
                           np.deg2rad(89.2), 0.0, 0.0)
    D = np.asarray(occult_quad_deficit(
        jnp.asarray(rp_re * REARTH / (R_s * RSUN)), z,
        jnp.asarray(0.35), jnp.asarray(0.25))) * np.asarray(front)
    rng = np.random.default_rng(seed)
    return time, 1.0 - D + rng.normal(0, sigma, n_t), sigma, float(D.max())


def main():
    trilegal = make_trilegal("/tmp/example_trilegal.csv")
    t = target.from_stars(make_field(), ID=100100100, sectors=[14],
                          trilegal_fname=trilegal)

    time, flux, sigma, depth = make_lightcurve()
    print(f"synthetic candidate: depth = {depth*1e6:.0f} ppm")

    # dilution bookkeeping: which stars could produce this depth?
    t.calc_depths(tdepth=depth)
    print(t.stars[["ID", "Tmag", "fluxratio", "tdepth"]].to_string())

    # full scenario marginalization (reduce N for a quick demo run)
    t.calc_probs(time, flux, sigma, P_orb=3.2, N=200000, verbose=1)
    print()
    print(t.probs[["ID", "scenario", "prob"]].to_string())
    print(f"\nFPP  = {t.FPP:.4g}")
    print(f"NFPP = {t.NFPP:.4g}")

    t.plot_field(sector=14, save=True, fname="/tmp/example_field")
    t.plot_fits(time, flux, sigma, save=True, fname="/tmp/example_fits")
    print("plots: /tmp/example_field.pdf /tmp/example_fits.pdf")


if __name__ == "__main__":
    main()
