"""TPU validation run against the reference's bundled example light
curves (read at runtime from /root/reference/examples; never copied).

Runs the Kepler-10b and TOI-465-class configurations and prints FPP/NFPP
next to the reference anchors from BASELINE.md. FPP is Monte-Carlo noisy
(the reference's own 20-run spread at TOI-465 is +/-0.058), so this is a
sanity sweep, not an exact-equality test.

Usage:  python bench_scripts/validate_golden.py
"""

import os
import sys
import time as _time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/examples"


def make_trilegal(path, n_stars=3000, Tmag_target=10.0, seed=0):
    from triceratops_tpu.populations.synthetic import make_synthetic_trilegal
    return make_synthetic_trilegal(path, Tmag_target=Tmag_target,
                                   n_stars=n_stars, seed=seed)


def run_case(name, lc_file, stars_row, P_orb, tdepth, mission="TESS",
             exptime=0.00139, N=1000000, anchor=None, **kw):
    import jax
    from triceratops_tpu import target

    lc = pd.read_csv(os.path.join(REF, lc_file), header=None)
    time_arr, flux = lc[0].values, lc[1].values
    sigma = float(np.mean(lc[2].values))
    tri = make_trilegal(f"/tmp/golden_{name}_trilegal.csv",
                        Tmag_target=stars_row["Tmag"])
    t = target.from_stars(pd.DataFrame([stars_row]), ID=stars_row["ID"],
                          sectors=[1], trilegal_fname=tri)
    t.mission = mission
    t.calc_depths(tdepth=tdepth)
    t0 = _time.time()
    t.calc_probs(time_arr, flux, sigma, P_orb=P_orb, N=N, nsamples=20,
                 exptime=exptime, verbose=0, key=jax.random.key(1), **kw)
    wall = _time.time() - t0
    ref = f" (reference anchor: {anchor})" if anchor else ""
    print(f"{name}: FPP={t.FPP:.4g} NFPP={t.NFPP:.4g} "
          f"wall={wall:.1f}s{ref}")
    return t


def main():
    run_case(
        "Kepler-10b", "Kepler10b_lightcurve.csv",
        dict(ID="11904151", Tmag=10.96, Jmag=9.889, Hmag=9.563, Kmag=9.496,
             ra=285.679, dec=50.241, mass=0.91, rad=1.065, Teff=5708.0,
             plx=5.88, **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0}),
        P_orb=0.837, tdepth=1.52e-4, mission="Kepler",
        anchor="FPP 8.4e-6, NFPP 0 (BASELINE.md)")
    run_case(
        "TOI-465.01", "TOI465_01_lightcurve.csv",
        dict(ID="422756130", Tmag=9.66, Jmag=8.87, Hmag=8.62, Kmag=8.55,
             ra=86.25, dec=-57.54, mass=1.09, rad=1.06, Teff=5950.0,
             plx=10.9, **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0}),
        P_orb=3.18, tdepth=2.64e-3,
        anchor="FPP 0.043 +/- 0.058 over 20 runs (BASELINE.md)")


if __name__ == "__main__":
    main()
