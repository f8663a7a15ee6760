"""FPP repeatability sweep: TOI-465.01 over many PRNG keys.

The reference quantifies its Monte-Carlo scatter by running the full
calculation 20 times (examples/example.ipynb cell 14: FPP
0.0432 +/- 0.0578). This script reproduces that experiment.
"""

import os
import sys
import time as _time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validate_golden import make_trilegal  # noqa: E402

REF = "/root/reference/examples"


def main(n_runs=20, N=1000000, contrast_curve=False):
    import jax
    from triceratops_tpu import target

    lc = pd.read_csv(os.path.join(REF, "TOI465_01_lightcurve.csv"),
                     header=None)
    t_arr, flux = lc[0].values, lc[1].values
    sigma = float(np.mean(lc[2].values))
    tri = make_trilegal("/tmp/spread_trilegal.csv", Tmag_target=9.66)
    stars = pd.DataFrame([dict(
        ID="422756130", Tmag=9.66, Jmag=8.87, Hmag=8.62, Kmag=8.55,
        ra=86.25, dec=-57.54, mass=1.09, rad=1.06, Teff=5950.0, plx=10.9,
        **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0})])
    t = target.from_stars(stars, ID=422756130, sectors=[1],
                          trilegal_fname=tri)
    t.calc_depths(tdepth=2.64e-3)

    kw = {}
    label = ""
    if contrast_curve:
        kw = dict(contrast_curve_file=os.path.join(
            REF, "TOI465_01_contrastcurve.csv"), filt="TESS")
        label = " + contrast curve"
    fpps, nfpps = [], []
    t0 = _time.time()
    for i in range(n_runs):
        t.calc_probs(t_arr, flux, sigma, P_orb=3.18, N=N, nsamples=20,
                     verbose=0, key=jax.random.key(100 + i), **kw)
        fpps.append(t.FPP)
        nfpps.append(t.NFPP)
        print(f"run {i}: FPP={t.FPP:.4f}")
    wall = _time.time() - t0
    fpps = np.array(fpps)
    anchor = ("0.0032 +/- 0.005" if contrast_curve else "0.0432 +/- 0.0578")
    print(f"\nTOI-465.01{label} over {n_runs} runs: FPP = "
          f"{fpps.mean():.4f} +/- {fpps.std():.4f}  (reference: {anchor})")
    print(f"total wall {wall:.0f}s ({wall/n_runs:.1f}s/run incl. first "
          "compile)")


if __name__ == "__main__":
    main(contrast_curve="--cc" in sys.argv)
