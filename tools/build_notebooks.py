"""Author + execute the tutorial notebooks in examples/.

Mirrors the reference's notebook-based docs (examples/example.ipynb,
TSCIII_tutorial.ipynb) with fully-offline equivalents: synthetic star
field + TRILEGAL population, injected transit, FPP/NFPP, plots,
ensemble runs, contrast curves. Run on CPU with a reduced N so the
embedded outputs build in about a minute:

    python tools/build_notebooks.py
"""

import os
import sys

import nbformat as nbf
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.join(os.path.dirname(HERE), "examples")


def _nb(cells):
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_markdown_cell(src) if kind == "md"
                else nbf.v4.new_code_cell(src) for kind, src in cells]
    nb.metadata["kernelspec"] = {"name": "python3", "language": "python",
                                 "display_name": "Python 3"}
    return nb


SETUP = """\
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
try:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
except Exception:
    pass
import numpy as np
import pandas as pd
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

import triceratops_tpu.triceratops as tr
from triceratops_tpu.populations.synthetic import make_synthetic_trilegal
from triceratops_tpu.likelihoods import simulate_TP_transit
from triceratops_tpu.constants import G, MSUN

# keep the notebook quick to execute; use N=1_000_000 for production runs
N = int(os.environ.get("TRICERATOPS_NB_N", 100_000))"""


TUTORIAL = [
    ("md", """\
# triceratops_tpu tutorial — vetting a transit candidate offline

This notebook walks through the full TRICERATOPS workflow on the
TPU-native rebuild: build a star field, compute per-star dilution,
marginalize the scenario likelihoods, and read off the false-positive
probability (FPP) and nearby false-positive probability (NFPP).

It runs fully offline: the star field is a prepared table
(`target.from_stars`) and the background population is a synthetic
TRILEGAL catalog. With network access you would instead construct
`tr.target(ID=..., sectors=...)`, which queries the TIC and TessCut and
submits the real TRILEGAL form — the rest of the workflow is
identical (reference workflow: examples/example.ipynb)."""),
    ("code", SETUP),
    ("md", """\
## Step 1 — the star field

The `stars` table uses the reference's TIC columns. The first row is
the target; subsequent rows are nearby resolved stars (their `sep`/`PA`
place them in the synthetic field)."""),
    ("code", """\
stars = pd.DataFrame([
    dict(ID="100", Tmag=10.0, Jmag=9.3, Hmag=9.1, Kmag=9.0,
         ra=90.0, dec=-60.0, mass=1.0, rad=1.0, Teff=5800.0, plx=10.0,
         **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0}),
    dict(ID="101", Tmag=13.0, Jmag=12.3, Hmag=12.1, Kmag=12.0,
         ra=90.001, dec=-60.001, mass=0.8, rad=0.8, Teff=5000.0, plx=5.0,
         **{"sep (arcsec)": 6.0, "PA (E of N)": 45.0}),
])
trilegal = make_synthetic_trilegal("/tmp/tutorial_trilegal.csv",
                                   Tmag_target=10.0, seed=2)
t = tr.target.from_stars(stars, ID=100, sectors=[1],
                         trilegal_fname=trilegal)
t.stars"""),
    ("md", """\
## Step 2 — a transit to vet

We synthesize a 3 R_earth planet transit with the package's own forward
model and add white noise. With real data you would phase-fold and
(optionally) bin your light curve — unbinned 20k-point curves are fine
on TPU."""),
    ("code", """\
n_t, sigma, P_orb = 100, 4e-4, 3.0
time = np.linspace(-0.15, 0.15, n_t)
a_cm = ((G * MSUN) / (4 * np.pi**2) * (P_orb * 86400) ** 2) ** (1 / 3)
flux_model = simulate_TP_transit(time, 3.0, P_orb, 89.5, a_cm, 1.0,
                                 0.4, 0.2, 0.0, 0.0)
rng = np.random.default_rng(5)
flux = flux_model + rng.normal(0, sigma, n_t)
plt.errorbar(time, flux, sigma, fmt=".", ms=3, alpha=0.6)
plt.plot(time, flux_model, lw=2)
plt.xlabel("days from transit center"); plt.ylabel("relative flux");"""),
    ("md", """\
## Step 3 — per-star dilution

`calc_depths` integrates the pixel PSF over the aperture to find each
star's flux contribution, then the transit depth each star would need
to produce the observed signal. Stars with `tdepth > 0` enter the
scenario set."""),
    ("code", """\
t.calc_depths(tdepth=float(1.0 - flux_model.min()))
t.stars[["ID", "Tmag", "fluxratio", "tdepth"]]"""),
    ("md", """\
## Step 4 — scenario probabilities

`calc_probs` marginalizes all scenarios (15 for the target + 3 per
qualifying nearby star) over `N` Monte-Carlo draws each. Pass
`key=jax.random.key(...)` (or an int) for reproducible draws."""),
    ("code", """\
t.calc_probs(time, flux, sigma, P_orb=P_orb, N=N, verbose=0, key=3)
t.probs"""),
    ("code", """\
print("FPP  =", t.FPP)
print("NFPP =", t.NFPP)"""),
    ("md", """\
## Step 5 — best-fit models per scenario"""),
    ("code", """\
t.plot_fits(time, flux, sigma)"""),
    ("md", """\
## Step 6 — quote an ensemble, not one draw

The FPP is Monte-Carlo noisy; the reference's own 20-run spreads are
the published error bars. `calc_probs_ensemble` runs the whole
calculation across several keys and returns the per-run FPP/NFPP."""),
    ("code", """\
t.calc_probs_ensemble(time, flux, sigma, P_orb=P_orb, N=N,
                      n_runs=5, verbose=0, key=3)
print("FPP  = %.4g +/- %.2g" % (t.FPP, t.FPP_std))
print("NFPP = %.4g +/- %.2g" % (t.NFPP, t.NFPP_std))"""),
]


VALIDATION = [
    ("md", """\
# Follow-up data: contrast curves, dropped scenarios, MOLUSC

This notebook shows the follow-up-data switches of `calc_probs`
(reference workflow: examples/TSCIII_tutorial.ipynb):

* a **contrast curve** from speckle/AO imaging truncates the
  bound-companion and background priors at the ruled-out separations,
* `drop_scenario` removes scenarios your follow-up excludes,
* a **MOLUSC** posterior file replaces the analytic bound-companion
  mass-ratio prior."""),
    ("code", SETUP),
    ("code", """\
stars = pd.DataFrame([
    dict(ID="200", Tmag=9.5, Jmag=8.9, Hmag=8.7, Kmag=8.65,
         ra=120.0, dec=-55.0, mass=1.05, rad=1.02, Teff=5900.0, plx=12.0,
         **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0}),
])
trilegal = make_synthetic_trilegal("/tmp/validation_trilegal.csv",
                                   Tmag_target=9.5, seed=7)
t = tr.target.from_stars(stars, ID=200, sectors=[1],
                         trilegal_fname=trilegal)

n_t, sigma, P_orb = 120, 3e-4, 5.2
time = np.linspace(-0.2, 0.2, n_t)
a_cm = ((G * 1.05 * MSUN) / (4 * np.pi**2) * (P_orb * 86400) ** 2) ** (1 / 3)
flux_model = simulate_TP_transit(time, 2.2, P_orb, 89.7, a_cm, 1.02,
                                 0.35, 0.25, 0.0, 0.0)
rng = np.random.default_rng(11)
flux = flux_model + rng.normal(0, sigma, n_t)
t.calc_depths(tdepth=float(1.0 - flux_model.min()))
t.calc_probs(time, flux, sigma, P_orb=P_orb, N=N, verbose=0, key=1)
fpp_plain = t.FPP
print("FPP without follow-up:", fpp_plain)"""),
    ("md", """\
## A contrast curve

Two comma-separated columns: separation (arcsec), Delta-magnitude.
`filt` names the band ("TESS", "Vis", "J", "H", or "K")."""),
    ("code", """\
cc_file = "/tmp/tutorial_cc.csv"
sep = np.linspace(0.05, 2.2, 40)
dmag = np.clip(8.0 * np.sqrt(sep / 2.2), 0.5, 8.0)
np.savetxt(cc_file, np.c_[sep, dmag], delimiter=",")
plt.plot(sep, dmag); plt.gca().invert_yaxis()
plt.xlabel("separation (arcsec)"); plt.ylabel(r"$\\Delta$mag");"""),
    ("code", """\
t.calc_probs(time, flux, sigma, P_orb=P_orb, N=N, verbose=0, key=1,
             contrast_curve_file=cc_file, filt="TESS")
print("FPP with contrast curve:", t.FPP, "(was %.4g)" % fpp_plain)"""),
    ("md", """\
## Dropping scenarios

If follow-up spectroscopy rules out a bound companion entirely, drop
the companion scenarios (names follow the reference:
`drop_scenario=["PTP", "PEB", "PEBx2P", "STP", "SEB", "SEBx2P"]`).
Dropped scenarios get ln Z = -inf and zero probability."""),
    ("code", """\
t.calc_probs(time, flux, sigma, P_orb=P_orb, N=N, verbose=0, key=1,
             drop_scenario=["PTP", "PEB", "PEBx2P", "STP", "SEB",
                            "SEBx2P"])
t.probs[["scenario", "prob"]]"""),
    ("md", """\
## MOLUSC companion posteriors

A MOLUSC csv (`molusc_file=...`) replaces the analytic
`sample_q_companion` prior with the survivor posterior of your imaging
+ RV constraints; companions are filtered to periastron > 10 AU and the
q floor, exactly as the reference does
(marginal_likelihoods.py:455-464). Here we synthesize a small survivor
posterior in the MOLUSC `*_kept.csv` schema — in practice you would run
MOLUSC on your imaging/RV data and pass its output file. For a real
end-to-end example see `tools/build_molusc_proxy.py`, which builds an
imaging-only proxy posterior for TOI-1228 from its bundled speckle
contrast curve."""),
    ("code", """\
rng = np.random.default_rng(21)
n_surv = 400
molusc = pd.DataFrame({
    "mass ratio": rng.uniform(0.1, 1.0, n_surv),
    "semi-major axis(AU)": 10 ** rng.uniform(1.2, 3.5, n_surv),
    "eccentricity": rng.uniform(0.0, 0.6, n_surv),
})
molusc_file = "/tmp/tutorial_molusc_kept.csv"
molusc.to_csv(molusc_file, index=False)
t.calc_probs(time, flux, sigma, P_orb=P_orb, N=N, verbose=0, key=1,
             molusc_file=molusc_file)
print("FPP with MOLUSC posterior:", t.FPP, "(was %.4g)" % fpp_plain)"""),
]


KEPLER = [
    ("md", """\
# Kepler-10b — a real-data anchor

This notebook reproduces the reference's `kepler_example.ipynb` on the
TPU-native rebuild: the real folded short-cadence Kepler-10b light
curve, the published stellar parameters, and the full FPP calculation.
The published reference FPP is **8.4e-6** (kepler_example.ipynb cell
12); this run lands within the Monte-Carlo/background spread of that
value (measured 3.8e-6 at N=1e6 on TPU; see `docs/parity.md`).

The light curve is read from the reference's bundled examples at
`/root/reference/examples` (kept external to this package). The
TRILEGAL background here is synthetic — with network access the real
form submission is used instead — so background-scenario evidences
differ in detail while the verdict (planet, FPP << 1e-3) reproduces."""),
    ("code", SETUP),
    ("code", """\
lc = pd.read_csv("/root/reference/examples/Kepler10b_lightcurve.csv",
                 header=None)
time, flux, sigma = lc[0].values, lc[1].values, float(np.mean(lc[2].values))
plt.errorbar(time, flux, sigma, fmt=".", ms=2, alpha=0.4)
plt.xlabel("days from transit center"); plt.ylabel("relative flux")
print(len(time), "points, sigma =", sigma)"""),
    ("md", """\
## The target star

Kepler-10 published parameters (Batalha et al. 2011). `mission`
switches the bandpass/aperture model to Kepler's."""),
    ("code", """\
stars = pd.DataFrame([
    dict(ID="11904151", Tmag=10.96, Jmag=9.889, Hmag=9.563, Kmag=9.496,
         ra=285.679, dec=50.241, mass=0.91, rad=1.065, Teff=5708.0,
         plx=5.88, **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0}),
])
trilegal = make_synthetic_trilegal("/tmp/kepler10_trilegal.csv",
                                   Tmag_target=10.96, seed=4)
t = tr.target.from_stars(stars, ID=11904151, sectors=[1],
                         trilegal_fname=trilegal)
t.mission = "Kepler"
t.calc_depths(tdepth=1.52e-4)
t.stars"""),
    ("md", """\
## FPP

P_orb = 0.837 d; importance sampling makes N=100k here comparable in
effective sample size to the reference's 1e6 rejection draws (on TPU
use N=1e6 — the full 15-scenario set runs in ~1.6 s)."""),
    ("code", """\
t.calc_probs(time, flux, sigma, P_orb=0.837, N=N, nsamples=2,
             verbose=0, key=jax.random.key(0))
t.probs"""),
    ("code", """\
print("FPP  =", t.FPP, " (published reference value 8.4e-6)")
print("NFPP =", t.NFPP)"""),
    ("md", """\
## Best-fit scenario models"""),
    ("code", """\
t.plot_fits(time, flux, sigma)"""),
]


def build(name, cells, execute=True):
    nb = _nb(cells)
    path = os.path.join(EXAMPLES, name)
    if execute:
        client = NotebookClient(nb, timeout=1200,
                                resources={"metadata": {"path": EXAMPLES}})
        client.execute()
    nbf.write(nb, path)
    print("wrote", path)


if __name__ == "__main__":
    execute = "--no-execute" not in sys.argv
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    build("tutorial.ipynb", TUTORIAL, execute)
    build("tutorial_followup.ipynb", VALIDATION, execute)
    # the Kepler-10b notebook needs the reference's bundled light curve
    kepler_ok = os.path.exists(
        "/root/reference/examples/Kepler10b_lightcurve.csv")
    build("kepler10b.ipynb", KEPLER, execute and kepler_ok)
    if not kepler_ok:
        print("NOTE: reference light curve absent; kepler10b.ipynb "
              "written unexecuted")
