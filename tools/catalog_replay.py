"""Catalog replay driver: batch FPP vetting over many TOIs.

The practical form of BASELINE.json configs[4] ("batch vetting sweep:
384-TOI catalog replay at 1M draws/scenario"): every target reuses the
same compiled scenario programs (shapes are fixed by the shared light-
curve binning and draw count), so per-target cost after the first is the
steady-state FPP wall time (~7 s at the benchmark shape on one v5e).
Results are written as a csv alongside the published-catalog columns for
comparison (populations/catalogs.py).

With only synthetic data available offline, the sweep runs on
synthesized light curves drawn from the catalog's (Rp, Porb) rows; swap
``build_target`` for real per-TOI field queries + folded light curves to
reproduce the paper tables.

Usage:
    python tools/catalog_replay.py [n_targets] [N_draws]
"""

import os
import sys
import time as _time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_target(row, trilegal, n_t=100, sigma=4e-4):
    import jax.numpy as jnp
    from triceratops_tpu import target
    from triceratops_tpu.constants import G, MSUN, RSUN, REARTH
    from triceratops_tpu.core.kepler import projected_z
    from triceratops_tpu.ops.occult import occult_quad_deficit

    P = float(np.clip(row["Porb"], 0.8, 20.0))
    rp = float(np.clip(row["Rp"], 1.0, 16.0))
    M_s = R_s = 1.0
    time = np.linspace(-0.15, 0.15, n_t)
    a = ((G * M_s * MSUN) / (4 * np.pi**2) * (P * 86400) ** 2) ** (1 / 3)
    z, front = projected_z(jnp.asarray(time), 0.0, P, a / (R_s * RSUN),
                           np.deg2rad(89.3), 0.0, 0.0)
    D = np.asarray(occult_quad_deficit(
        jnp.asarray(rp * REARTH / (R_s * RSUN)), z,
        jnp.asarray(0.35), jnp.asarray(0.25))) * np.asarray(front)
    rng = np.random.default_rng(int(row["TOI"] * 100) % 2**31)
    flux = 1.0 - D + rng.normal(0, sigma, n_t)
    stars = pd.DataFrame([dict(
        ID=str(int(row["TICID"])), Tmag=10.0, Jmag=9.3, Hmag=9.1,
        Kmag=9.0, ra=90.0, dec=-60.0, mass=M_s, rad=R_s, Teff=5800.0,
        plx=10.0, **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0})])
    t = target.from_stars(stars, ID=int(row["TICID"]), sectors=[1],
                          trilegal_fname=trilegal)
    t.calc_depths(tdepth=float(D.max()))
    return t, time, flux, sigma, P


def main(n_targets=8, N=1000000, out_csv="/tmp/catalog_replay.csv"):
    import jax
    from triceratops_tpu.populations.catalogs import vetting_catalog
    from triceratops_tpu.populations.synthetic import make_synthetic_trilegal

    cat = vetting_catalog().sample(n_targets, random_state=0)
    trilegal = make_synthetic_trilegal("/tmp/replay_trilegal.csv",
                                       Tmag_target=10.0, seed=1)
    rows = []
    t_start = _time.time()
    for i, (_, row) in enumerate(cat.iterrows()):
        t, time, flux, sigma, P = build_target(row, trilegal)
        t0 = _time.time()
        t.calc_probs(time, flux, sigma, P_orb=P, N=N, nsamples=20,
                     verbose=0, key=jax.random.key(i))
        wall = _time.time() - t0
        rows.append(dict(TOI=row["TOI"], TICID=row["TICID"],
                         Rp=row["Rp"], Porb=row["Porb"],
                         FPP=t.FPP, NFPP=t.NFPP,
                         FPP_paper=row["FPP"], NFPP_paper=row["NFPP"],
                         Classification=row["Classification"],
                         wall_s=round(wall, 2)))
        print(f"[{i+1}/{n_targets}] TOI {row['TOI']}: FPP={t.FPP:.3g} "
              f"({wall:.1f}s)")
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    total = _time.time() - t_start
    print(f"\nwrote {out_csv}; {n_targets} targets in {total:.0f}s "
          f"({total/n_targets:.1f}s/target incl. first compile)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000000
    main(n, N)
