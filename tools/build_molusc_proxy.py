"""Synthesize a MOLUSC-format bound-companion posterior from a contrast
curve, so the ``molusc_file=`` path can be exercised end-to-end offline.

MOLUSC (Wood et al. 2021) samples hypothetical bound companions from
population priors and rejects those inconsistent with follow-up imaging
/ RV / Gaia data; the survivors ship as a CSV that the reference ingests
via ``molusc_file`` (reference marginal_likelihoods.py:455-464;
TSCIII_tutorial.ipynb cell 20-21). The real TOI-1228 file
(``TOI1228_molusc_kept.csv``) is a stripped large blob offline, so this
proxy rebuilds a posterior of the same *form* from the one real
constraint that is bundled: the speckle contrast curve
(/root/reference/examples/TOI1228_cc.tbl).

Sampling model (documented, NOT the real MOLUSC — no RV or Gaia
constraints, so the proxy keeps more close/bright companions):

* one hypothetical companion per MC draw (N trials);
* existence thinned by the framework's own bound-companion frequency
  model ``exp(lnprior_bound_TP)`` evaluated WITHOUT the contrast curve
  (priors/companion.py; the curve must enter exactly once, below) — the
  same Moe & Di Stefano rates the no-molusc path integrates;
* q ~ ``sample_q_companion`` (long-period companion law, F_twin=0.05);
* log10 P[d] ~ N(5.03, 2.28) (Raghavan et al. 2010 — MOLUSC's own
  period prior); e ~ U[0, 0.95]; a from Kepler III;
* projected sky separation from a random circular-orbit phase and
  isotropic inclination;
* REJECT companions the contrast curve would have detected: delta-mag
  (band = the curve's filter, via ``flux_relation``) brighter than the
  detection limit interpolated at the companion's separation.

The survivors are written with the reference CSV schema ("mass ratio",
"semi-major axis(AU)", "eccentricity"); zero-padding to N at load time
then makes kept/N the companion-frequency weight, exactly as with a real
MOLUSC file.

Usage:
    python tools/build_molusc_proxy.py [out.csv]   # TOI-1228 defaults
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_molusc_proxy(out_csv: str, M_s: float, plx: float, cc_file: str,
                       filt: str = "TESS", N: int = 1_000_000,
                       seed: int = 0, verbose: bool = True) -> str:
    import jax
    import jax.numpy as jnp
    from triceratops_tpu.funcs import file_to_contrast_curve
    from triceratops_tpu.populations.stellar import flux_relation
    from triceratops_tpu.priors.samplers import sample_q_companion
    from triceratops_tpu.priors.companion import lnprior_bound_TP

    seps_c, cons_c = file_to_contrast_curve(cc_file)
    rng = np.random.default_rng(seed)

    # jit the jnp evaluations: eager jnp ops would dispatch to a remote
    # accelerator one blocking round trip at a time (CLAUDE.md gotchas)
    q = np.asarray(jax.jit(sample_q_companion, static_argnums=1)(
        rng.uniform(size=N), M_s))
    logP = rng.normal(5.03, 2.28, N)          # Raghavan 2010, log10 days
    P_yr = 10.0**logP / 365.25
    e = rng.uniform(0.0, 0.95, N)
    a_AU = (M_s * (1.0 + q)) ** (1.0 / 3.0) * P_yr ** (2.0 / 3.0)

    # projected separation: random phase on the sky for an isotropic
    # circular orbit (eccentricity projection neglected for the proxy)
    cosi = rng.uniform(0.0, 1.0, N)
    theta = rng.uniform(0.0, 2.0 * np.pi, N)
    s_AU = a_AU * np.sqrt(np.cos(theta) ** 2
                          + np.sin(theta) ** 2 * cosi ** 2)
    sep_arcsec = s_AU * (plx / 1000.0)        # plx [mas] -> 1/d [1/pc]

    f_c = flux_relation(q * M_s, filt)
    f_t = flux_relation(np.array([M_s]), filt)[0]
    delta_mag = -2.5 * np.log10(f_c / f_t)

    # companion-frequency thinning (framework's own rate model, no cc)
    lnp = np.asarray(jax.jit(lnprior_bound_TP)(
        jnp.float32(M_s), jnp.float32(plx),
        jnp.asarray(np.abs(delta_mag), jnp.float32),
        jnp.asarray([2.2], jnp.float32), jnp.asarray([1.0], jnp.float32)))
    exists = rng.uniform(size=N) < np.clip(np.exp(lnp), 0.0, 1.0)

    # imaging rejection: detectable iff brighter (smaller delta-mag)
    # than the curve's limit at the companion's separation
    limit = np.interp(sep_arcsec, seps_c, cons_c)
    undetected = delta_mag > limit

    kept = exists & undetected
    df = pd.DataFrame({
        "mass ratio": q[kept],
        "semi-major axis(AU)": a_AU[kept],
        "eccentricity": e[kept],
    })
    df.to_csv(out_csv, index=False)
    if verbose:
        print(f"{out_csv}: {kept.sum()} / {N} companions kept "
              f"(existence {exists.mean():.3f}, "
              f"undetected|exists {undetected[exists].mean():.3f}); "
              f"periastron>10AU survivors at load: "
              f"{(a_AU[kept] * (1 - e[kept]) > 10).mean():.3f}")
    return out_csv


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/TOI1228_molusc_proxy.csv"
    # TOI-1228 host (TSCIII_tutorial.ipynb cells 16-18): M_s = 2.13 Msun,
    # plx = 3.64491 mas; curve band TESS (tutorial cell 20)
    build_molusc_proxy(out, M_s=2.13, plx=3.64491,
                       cc_file="/root/reference/examples/TOI1228_cc.tbl")
