"""Scenario-evidence API smoke + behavioral tests (offline, small N)."""

import numpy as np
import jax
import pytest

from triceratops_tpu.scenarios import api
from fixtures import make_transit_lightcurve, make_trilegal_csv

N = 4000
NS = 2  # supersampling kept small for test speed
RES_KEYS = {"M_s", "R_s", "u1", "u2", "P_orb", "inc", "b", "R_p", "ecc",
            "argp", "M_EB", "R_EB", "fluxratio_EB", "fluxratio_comp", "lnZ"}

STAR = dict(M_s=1.0, R_s=1.0, Teff=5800.0, Z=0.0)


@pytest.fixture(scope="module")
def lc():
    return make_transit_lightcurve(n_t=80, sigma=5e-4)


@pytest.fixture(scope="module")
def trilegal(tmp_path_factory):
    p = tmp_path_factory.mktemp("tri") / "trilegal.csv"
    return make_trilegal_csv(p, Tmag_target=10.0)


def _check_res(res):
    assert RES_KEYS <= set(res.keys())
    for k in RES_KEYS - {"lnZ"}:
        assert np.asarray(res[k]).shape == (100,), k
    assert np.isfinite(res["lnZ"]) or res["lnZ"] == -np.inf


class TestPlanetScenarios:
    def test_ttp(self, lc):
        time, flux, sigma, _ = lc
        res = api.lnZ_TTP(time, flux, sigma, 3.0, **STAR, N=N, nsamples=NS,
                          key=jax.random.key(0))
        _check_res(res)
        assert np.isfinite(res["lnZ"])
        # best-fit R_p should be near the injected 10 Rearth
        assert 5.0 < res["R_p"][0] < 16.0

    def test_ttp_deterministic(self, lc):
        time, flux, sigma, _ = lc
        r1 = api.lnZ_TTP(time, flux, sigma, 3.0, **STAR, N=N, nsamples=NS,
                         key=jax.random.key(7))
        r2 = api.lnZ_TTP(time, flux, sigma, 3.0, **STAR, N=N, nsamples=NS,
                         key=jax.random.key(7))
        assert r1["lnZ"] == r2["lnZ"]

    def test_ttp_period_range(self, lc):
        time, flux, sigma, _ = lc
        res = api.lnZ_TTP(time, flux, sigma, [2.0, 4.0], **STAR, N=N,
                          nsamples=NS, key=jax.random.key(1))
        _check_res(res)
        assert 2.0 <= res["P_orb"].min() and res["P_orb"].max() <= 4.0

    def test_ptp(self, lc):
        time, flux, sigma, _ = lc
        res = api.lnZ_PTP(time, flux, sigma, 3.0, **STAR, plx=20.0, N=N,
                          nsamples=NS, key=jax.random.key(2))
        _check_res(res)

    def test_stp(self, lc):
        time, flux, sigma, _ = lc
        res = api.lnZ_STP(time, flux, sigma, 3.0, **STAR, plx=20.0, N=N,
                          nsamples=NS, key=jax.random.key(3))
        _check_res(res)

    def test_ntp_evolved(self, lc):
        time, flux, sigma, _ = lc
        res = api.lnZ_NTP_evolved(time, flux, sigma, 3.0, R_s=2.0,
                                  Teff=5000.0, Z=0.0, N=N, nsamples=NS,
                                  key=jax.random.key(4))
        _check_res(res)


class TestEBScenarios:
    def test_teb(self, lc):
        time, flux, sigma, _ = lc
        res, res_twin = api.lnZ_TEB(time, flux, sigma, 3.0, **STAR, N=N,
                                    nsamples=NS, key=jax.random.key(5))
        _check_res(res)
        _check_res(res_twin)
        assert np.allclose(res_twin["P_orb"], 2 * res_twin["P_orb"] / 2)

    def test_peb(self, lc):
        time, flux, sigma, _ = lc
        res, res_twin = api.lnZ_PEB(time, flux, sigma, 3.0, **STAR, plx=20.0,
                                    N=N, nsamples=NS, key=jax.random.key(6))
        _check_res(res)
        _check_res(res_twin)

    def test_seb(self, lc):
        time, flux, sigma, _ = lc
        res, res_twin = api.lnZ_SEB(time, flux, sigma, 3.0, **STAR, plx=20.0,
                                    N=N, nsamples=NS, key=jax.random.key(7))
        _check_res(res)
        _check_res(res_twin)

    def test_neb_evolved(self, lc):
        time, flux, sigma, _ = lc
        res, res_twin = api.lnZ_NEB_evolved(time, flux, sigma, 3.0, R_s=2.0,
                                            Teff=5000.0, Z=0.0, N=N,
                                            nsamples=NS,
                                            key=jax.random.key(8))
        _check_res(res)
        _check_res(res_twin)
        assert np.allclose(res_twin["R_EB"], 2.0)


class TestBackgroundScenarios:
    def test_dtp(self, lc, trilegal):
        time, flux, sigma, _ = lc
        res = api.lnZ_DTP(time, flux, sigma, 3.0, **STAR, Tmag=10.0,
                          Jmag=9.3, Hmag=9.1, Kmag=9.0,
                          trilegal_fname=trilegal, N=N, nsamples=NS,
                          key=jax.random.key(9))
        _check_res(res)

    def test_deb(self, lc, trilegal):
        time, flux, sigma, _ = lc
        res, res_twin = api.lnZ_DEB(time, flux, sigma, 3.0, **STAR,
                                    Tmag=10.0, Jmag=9.3, Hmag=9.1, Kmag=9.0,
                                    trilegal_fname=trilegal, N=N,
                                    nsamples=NS, key=jax.random.key(10))
        _check_res(res)
        _check_res(res_twin)

    def test_btp(self, lc, trilegal):
        time, flux, sigma, _ = lc
        res = api.lnZ_BTP(time, flux, sigma, 3.0, M_s=1.0, R_s=1.0,
                          Teff=5800.0, Tmag=10.0, Jmag=9.3, Hmag=9.1,
                          Kmag=9.0, trilegal_fname=trilegal, N=N,
                          nsamples=NS, key=jax.random.key(11))
        _check_res(res)

    def test_beb(self, lc, trilegal):
        time, flux, sigma, _ = lc
        res, res_twin = api.lnZ_BEB(time, flux, sigma, 3.0, M_s=1.0,
                                    R_s=1.0, Teff=5800.0, Tmag=10.0,
                                    Jmag=9.3, Hmag=9.1, Kmag=9.0,
                                    trilegal_fname=trilegal, N=N,
                                    nsamples=NS, key=jax.random.key(12))
        _check_res(res)
        _check_res(res_twin)

    def test_ntp_unknown(self, lc, trilegal):
        time, flux, sigma, _ = lc
        res = api.lnZ_NTP_unknown(time, flux, sigma, 3.0, Tmag=10.0,
                                  trilegal_fname=trilegal, N=N, nsamples=NS,
                                  key=jax.random.key(13))
        _check_res(res)

    def test_neb_unknown(self, lc, trilegal):
        time, flux, sigma, _ = lc
        res, res_twin = api.lnZ_NEB_unknown(time, flux, sigma, 3.0,
                                            Tmag=10.0,
                                            trilegal_fname=trilegal, N=N,
                                            nsamples=NS,
                                            key=jax.random.key(14))
        _check_res(res)
        _check_res(res_twin)

    def test_ntp_unknown_empty_population(self, lc, trilegal):
        time, flux, sigma, _ = lc
        # no stars within Tmag +/- 1 of a very bright target
        res = api.lnZ_NTP_unknown(time, flux, sigma, 3.0, Tmag=-5.0,
                                  trilegal_fname=trilegal, N=N, nsamples=NS)
        assert res["lnZ"] == -np.inf
        assert "b" not in res  # reference quirk (ml.py:2452-2468)
        res2 = api.lnZ_NEB_unknown(time, flux, sigma, 3.0, Tmag=-5.0,
                                   trilegal_fname=trilegal, N=N, nsamples=NS)
        assert res2["lnZ"] == -np.inf and "b" in res2


class TestBehavior:
    def test_planet_beats_eb_for_planet_signal(self, lc):
        """A clean 10 Rearth transit: TP evidence should exceed the EB
        evidence (the EB secondary veto and radius priors punish EBs)."""
        time, flux, sigma, _ = lc
        r_tp = api.lnZ_TTP(time, flux, sigma, 3.0, **STAR, N=20000,
                           nsamples=NS, key=jax.random.key(20))
        r_eb, _ = api.lnZ_TEB(time, flux, sigma, 3.0, **STAR, N=20000,
                              nsamples=NS, key=jax.random.key(21))
        assert r_tp["lnZ"] > r_eb["lnZ"]

    def test_twin_evidence_stable_when_twin_dominates(self):
        """Twin-branch estimator stability in the regime where it MATTERS:
        data generated BY a q=0.97 twin EB (true period 2*P_det, folded at
        the detected period so primary and secondary overlay, reference
        ml.py:253-268 twin construction). There the twin likelihood is
        broad — not a needle — and the conditioned + LHS-stratified twin
        draw sets (engine module notes) must deliver key-to-key lnZ
        agreement well inside the 2-nat sharding gate (measured sd 0.076
        at 64k draws, docs/parity.md)."""
        from triceratops_tpu import likelihoods as lk
        from triceratops_tpu.constants import G, MSUN

        P_det, q = 3.0, 0.97
        P_true = 2 * P_det
        a = ((G * (1.0 + q) * MSUN) / (4 * np.pi**2)
             * (P_true * 86400.0) ** 2) ** (1 / 3)
        time = np.linspace(-0.15, 0.15, 40)
        flux_mod, _ = lk.simulate_EB_transit(time, 0.95, 0.45, P_true,
                                             88.5, a, 1.0, 0.4, 0.2,
                                             0.0, 0.0)
        sigma = 2e-2
        flux = flux_mod + np.random.default_rng(5).normal(0, sigma,
                                                          len(time))
        twin_lnZ, norm_lnZ = [], []
        for k in range(4):
            r, r_twin = api.lnZ_TEB(time, flux, sigma, P_det, **STAR,
                                    N=32768, nsamples=NS,
                                    key=jax.random.key(40 + k))
            norm_lnZ.append(float(r["lnZ"]))
            twin_lnZ.append(float(r_twin["lnZ"]))
        twin_lnZ = np.array(twin_lnZ)
        # the twin branch dominates the normal branch by a huge margin
        assert twin_lnZ.min() > max(norm_lnZ) + 20.0, (twin_lnZ, norm_lnZ)
        # and is stable across keys (the normal branch is a deep-losing
        # needle here and legitimately noisy — not gated)
        assert twin_lnZ.max() - twin_lnZ.min() < 2.0, twin_lnZ

    def test_contrast_curve_suppresses_companions(self, lc, tmp_path):
        """A deep contrast curve shrinks the bound-companion prior, so
        PTP evidence must drop relative to the unconstrained case."""
        time, flux, sigma, _ = lc
        cc = tmp_path / "cc.csv"
        seps = np.linspace(0.1, 2.0, 20)
        cons = np.full(20, 9.0)  # very deep: companions ruled out
        np.savetxt(cc, np.c_[seps, cons], delimiter=",")
        r_free = api.lnZ_PTP(time, flux, sigma, 3.0, **STAR, plx=20.0,
                             N=20000, nsamples=NS, key=jax.random.key(22))
        r_cc = api.lnZ_PTP(time, flux, sigma, 3.0, **STAR, plx=20.0,
                           contrast_curve_file=str(cc), filt="K",
                           N=20000, nsamples=NS, key=jax.random.key(22))
        assert r_cc["lnZ"] <= r_free["lnZ"] + 0.5


class TestMissionsAndRanges:
    def test_k2_mission_uses_kepler_grids(self, lc):
        time, flux, sigma, _ = lc
        r_k2 = api.lnZ_TTP(time, flux, sigma, 3.0, **STAR, N=N, nsamples=NS,
                           mission="K2", key=jax.random.key(30))
        r_kep = api.lnZ_TTP(time, flux, sigma, 3.0, **STAR, N=N, nsamples=NS,
                            mission="Kepler", key=jax.random.key(30))
        # same LDC table and draws -> identical results
        assert r_k2["lnZ"] == r_kep["lnZ"]
        assert r_k2["u1"][0] == r_kep["u1"][0]

    def test_target_period_range(self, trilegal):
        import pandas as pd
        from triceratops_tpu import target as _t
        stars = pd.DataFrame([dict(
            ID="1", Tmag=10.0, Jmag=9.3, Hmag=9.1, Kmag=9.0, ra=1.0,
            dec=1.0, mass=1.0, rad=1.0, Teff=5800.0, plx=20.0,
            **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0})])
        t = _t.from_stars(stars, ID=1, sectors=[1], trilegal_fname=trilegal)
        t.calc_depths(tdepth=0.005)
        time, flux, sigma, _ = make_transit_lightcurve(n_t=40)
        t.calc_probs(time, flux, sigma, P_orb=[2.5, 3.5], N=2000,
                     nsamples=2, verbose=0, key=jax.random.key(31))
        assert 0.0 <= t.FPP <= 1.0
        assert 2.5 <= t.probs["P_orb"].iloc[0] <= 7.0  # twin rows reach 2P


class TestPrepCaching:
    def test_rewritten_csv_invalidates_cache(self, tmp_path):
        """A same-path rewrite of the TRILEGAL csv must not serve stale
        device arrays (cache keys on path+mtime+size, not path alone)."""
        p = str(tmp_path / "tri.csv")
        make_trilegal_csv(p, n_stars=200, seed=1)
        _, n1 = api._prep_background(p, 10.0, 9.3, 9.1, 9.0, "TESS",
                                     "TESS", need_ldc=False)
        _, n1b = api._prep_background(p, 10.0, 9.3, 9.1, 9.0, "TESS",
                                      "TESS", need_ldc=False)
        assert n1b == n1
        make_trilegal_csv(p, n_stars=500, seed=2)
        _, n2 = api._prep_background(p, 10.0, 9.3, 9.1, 9.0, "TESS",
                                     "TESS", need_ldc=False)
        assert n2 != n1

        pop1, m1 = api._prep_lookalikes(p, 10.0, "TESS")
        make_trilegal_csv(p, n_stars=900, seed=3)
        pop2, m2 = api._prep_lookalikes(p, 10.0, "TESS")
        assert m2 != m1
