"""Contrast-curve and MOLUSC constraint ingestion example.

Mirrors the reference's TSCIII_tutorial.ipynb workflow: high-contrast
imaging constraints prune the unresolved-companion scenarios (PTP/PEB/
STP/SEB), and a MOLUSC posterior sample can replace the analytic
companion mass-ratio prior.

Run:  python examples/example_contrast_curve.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import pandas as pd

from triceratops_tpu import target
from example_offline import make_field, make_trilegal, make_lightcurve


def make_contrast_curve(path):
    """Separation [arcsec] vs contrast [delta mag] (e.g. speckle K-band)."""
    seps = np.linspace(0.05, 1.5, 30)
    dmag = np.clip(8.0 * (1 - np.exp(-seps / 0.25)), 0.5, 8.0)
    np.savetxt(path, np.c_[seps, dmag], delimiter=",")
    return str(path)


def make_molusc(path, n=5000, seed=3):
    """A MOLUSC-style surviving-binary posterior sample csv."""
    rng = np.random.default_rng(seed)
    pd.DataFrame({
        "mass ratio": rng.uniform(0.05, 1.0, n),
        "semi-major axis(AU)": 10 ** rng.uniform(-1, 3, n),
        "eccentricity": rng.uniform(0, 0.9, n),
    }).to_csv(path, index=False)
    return str(path)


def main():
    trilegal = make_trilegal("/tmp/cc_trilegal.csv")
    cc = make_contrast_curve("/tmp/cc_curve.csv")
    molusc = make_molusc("/tmp/cc_molusc.csv")
    time, flux, sigma, depth = make_lightcurve()

    for label, kwargs in [
        ("no constraints", {}),
        ("contrast curve (K band)", dict(contrast_curve_file=cc, filt="K")),
        ("contrast curve + MOLUSC", dict(contrast_curve_file=cc, filt="K",
                                         molusc_file=molusc)),
    ]:
        t = target.from_stars(make_field(), ID=100100100, sectors=[14],
                              trilegal_fname=trilegal)
        t.calc_depths(tdepth=depth)
        t.calc_probs(time, flux, sigma, P_orb=3.2, N=100000, verbose=0,
                     **kwargs)
        print(f"{label:28s}: FPP = {t.FPP:.4g}  NFPP = {t.NFPP:.4g}")


if __name__ == "__main__":
    main()
