"""Frontend target-class tests: offline construction, calc_depths PSF
math, calc_probs orchestration, star edits, plots (offline, small N)."""

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest
import jax

from triceratops_tpu import target
from fixtures import make_transit_lightcurve, make_trilegal_csv


def _stars_df(n_nearby=1):
    rows = [dict(ID="1000", Tmag=10.0, Jmag=9.3, Hmag=9.1, Kmag=9.0,
                 ra=120.0, dec=-30.0, mass=1.0, rad=1.0, Teff=5800.0,
                 plx=20.0, **{"sep (arcsec)": 0.0, "PA (E of N)": 0.0})]
    for i in range(n_nearby):
        rows.append(dict(ID=str(2000 + i), Tmag=13.5 + i, Jmag=12.9,
                         Hmag=12.7, Kmag=12.6, ra=120.001, dec=-30.001,
                         mass=0.8, rad=0.8, Teff=5000.0, plx=5.0,
                         **{"sep (arcsec)": 25.0, "PA (E of N)": 45.0}))
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def trilegal(tmp_path_factory):
    p = tmp_path_factory.mktemp("tri2") / "trilegal.csv"
    return make_trilegal_csv(p, Tmag_target=10.0)


@pytest.fixture(scope="module")
def tgt(trilegal):
    t = target.from_stars(_stars_df(), ID=1000, sectors=[1],
                          trilegal_fname=trilegal)
    return t


class TestCalcDepths:
    def test_fluxratio_and_tdepth(self, tgt):
        tgt.calc_depths(tdepth=0.005)
        fr = tgt.stars["fluxratio"].values
        assert np.isclose(fr.sum(), 1.0, atol=1e-6)
        assert fr[0] > 0.9  # target dominates its own aperture
        td = tgt.stars["tdepth"].values
        # target's required depth ~ tdepth / fluxratio
        assert np.isclose(td[0], 1 - (fr[0] - 0.005) / fr[0], atol=1e-12)

    def test_analytic_psf_matches_numeric(self):
        """ndtr-product closed form equals the numeric 2D Gaussian
        integral over a pixel (reference tests/test_analytic_psf.py)."""
        from scipy.integrate import dblquad
        from scipy.special import ndtr
        from triceratops_tpu.funcs import Gauss2D

        sigma, mu_x, mu_y, A = 0.75, 5.3, 4.2, 2.0
        for (px, py) in [(5, 4), (6, 4), (3, 7)]:
            numeric = dblquad(
                lambda y, x: Gauss2D(x, y, mu_x, mu_y, sigma, A),
                px - 0.5, px + 0.5, py - 0.5, py + 0.5)[0]
            closed = A * (
                (ndtr((px + 0.5 - mu_x) / sigma)
                 - ndtr((px - 0.5 - mu_x) / sigma))
                * (ndtr((py + 0.5 - mu_y) / sigma)
                   - ndtr((py - 0.5 - mu_y) / sigma)))
            assert abs(numeric - closed) < 1e-8


class TestFromStarsNaNPA:
    def test_nan_pa_target_row_is_on_center(self, trilegal):
        """PA is undefined (NaN) for the target row of a real TIC cone
        search (sep = 0); pixel coords must stay finite and on-center."""
        df = _stars_df()
        df.loc[0, "PA (E of N)"] = np.nan
        t = target.from_stars(df, ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        assert np.all(np.isfinite(t.pix_coords[0]))
        np.testing.assert_allclose(t.pix_coords[0][0], t.N_pix / 2.0)
        t.calc_depths(tdepth=0.005)  # used to crash on NaN arange
        assert np.isfinite(t.stars["fluxratio"].values).all()


class TestStarEdits:
    def test_add_update_remove(self, trilegal):
        t = target.from_stars(_stars_df(), trilegal_fname=trilegal)
        n0 = len(t.stars)
        t.add_star(9999, Tmag=12.0, bound=True)
        assert len(t.stars) == n0 + 1
        assert t.stars["plx"].values[-1] == t.stars["plx"].values[0]
        assert len(t.pix_coords[0]) == n0 + 1
        t.update_star(9999, "mass", 0.5)
        assert t.stars[t.stars.ID.astype(str) == "9999"]["mass"].values[0] == 0.5
        t.remove_star([9999])
        assert len(t.stars) == n0


class TestCalcProbs:
    @pytest.fixture(scope="class")
    def result(self, trilegal):
        t = target.from_stars(_stars_df(), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        t.calc_depths(tdepth=0.005)
        time, flux, sigma, _ = make_transit_lightcurve(n_t=60, sigma=5e-4)
        t.calc_probs(time, flux, sigma, P_orb=3.0, N=3000, nsamples=2,
                     verbose=0, key=jax.random.key(0))
        return t

    def test_structure(self, result):
        t = result
        n_nearby = 1
        assert len(t.probs) == 15 + 3 * n_nearby
        assert list(t.probs["scenario"].values[:15]) == [
            "TP", "EB", "EBx2P", "PTP", "PEB", "PEBx2P", "STP", "SEB",
            "SEBx2P", "DTP", "DEB", "DEBx2P", "BTP", "BEB", "BEBx2P"]
        assert list(t.probs["scenario"].values[15:]) == ["NTP", "NEB",
                                                         "NEBx2P"]
        assert np.isclose(t.probs["prob"].sum(), 1.0, atol=1e-6)
        assert 0.0 <= t.FPP <= 1.0
        assert 0.0 <= t.NFPP <= 1.0
        assert not t.FPP_degenerate

    def test_fpp_definition(self, result):
        t = result
        p = t.probs["prob"].values
        assert np.isclose(t.FPP, 1 - (p[0] + p[3] + p[9]), atol=1e-12)
        assert np.isclose(t.NFPP, p[15:].sum(), atol=1e-12)

    def test_star_num(self, result):
        np.testing.assert_array_equal(
            result.star_num[:15],
            [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 2, 2, 2])

    def test_lc_window(self, trilegal):
        """lc_window crops |time| > window; a window wider than the
        curve is a no-op (bitwise-identical run at the same key)."""
        t = target.from_stars(_stars_df(n_nearby=0), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        t.calc_depths(tdepth=0.005)
        time, flux, sigma, _ = make_transit_lightcurve(n_t=60, sigma=5e-4)
        t.calc_probs(time, flux, sigma, P_orb=3.0, N=2000, nsamples=2,
                     verbose=0, key=jax.random.key(2))
        fpp_full = t.FPP
        lnZ_full = t.lnZ.copy()
        # window covering every point: identical analysis
        t.calc_probs(time, flux, sigma, P_orb=3.0, N=2000, nsamples=2,
                     verbose=0, key=jax.random.key(2),
                     lc_window=float(np.abs(time).max()) + 1.0)
        assert t.FPP == fpp_full
        np.testing.assert_array_equal(t.lnZ, lnZ_full)
        # real crop: fewer points, still a finite normalized result
        w = 0.6 * float(np.abs(time).max())
        t.calc_probs(time, flux, sigma, P_orb=3.0, N=2000, nsamples=2,
                     verbose=0, key=jax.random.key(2), lc_window=w)
        assert np.isfinite(t.FPP)
        assert np.isclose(t.probs["prob"].sum(), 1.0, atol=1e-6)
        assert not np.array_equal(t.lnZ, lnZ_full)

    def test_drop_scenario(self, trilegal):
        t = target.from_stars(_stars_df(n_nearby=0), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        t.calc_depths(tdepth=0.005)
        time, flux, sigma, _ = make_transit_lightcurve(n_t=60, sigma=5e-4)
        t.calc_probs(time, flux, sigma, P_orb=3.0, N=2000, nsamples=2,
                     verbose=0, drop_scenario=["EB", "SEB", "BEB"],
                     key=jax.random.key(1))
        pr = t.probs
        for s in ["EB", "EBx2P", "SEB", "SEBx2P", "BEB", "BEBx2P"]:
            assert pr[pr.scenario == s]["prob"].values[0] == 0.0
        assert t.NFPP == 0.0

    def test_plots(self, result, tmp_path):
        time, flux, sigma, _ = make_transit_lightcurve(n_t=60, sigma=5e-4)
        fig = result.plot_field(sector=1, save=True,
                                fname=str(tmp_path / "field"))
        result.plot_fits(time, flux, sigma, save=True,
                         fname=str(tmp_path / "fits"))
        assert (tmp_path / "field.pdf").exists()
        assert (tmp_path / "fits.pdf").exists()
        # the WCS-oriented N/E compass (reference triceratops.py:433-459)
        # must be drawn whenever a nearby star defines the orientation
        from mpl_toolkits.axes_grid1.anchored_artists import (
            AnchoredDirectionArrows)
        arrows = [a for a in fig.axes[0].artists
                  if isinstance(a, AnchoredDirectionArrows)]
        assert len(arrows) == 1

    def test_compass_rotation(self, trilegal):
        """The compass rotation reproduces the reference's formula: the
        nearby star's pixel-offset angle minus its PA (E of N)."""
        from triceratops_tpu.frontend.plotting import _compass
        import matplotlib.pyplot as plt

        t = target.from_stars(_stars_df(n_nearby=1), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        fig, ax = plt.subplots()
        art = _compass(ax, t, 0)
        assert art is not None
        v2 = t.pix_coords[0][1] - t.pix_coords[0][0]
        expect = (np.sign(v2[0])
                  * np.degrees(np.arccos(v2[1] / np.hypot(*v2)))
                  - t.stars["PA (E of N)"].values[1])
        assert np.isclose(art.compass_rotation_deg, -expect)
        plt.close(fig)

    def test_compass_absent_single_star(self, trilegal):
        from triceratops_tpu.frontend.plotting import _compass
        import matplotlib.pyplot as plt

        t = target.from_stars(_stars_df(n_nearby=0), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        fig, ax = plt.subplots()
        assert _compass(ax, t, 0) is None
        plt.close(fig)


class TestMoluscCalcProbs:
    def test_molusc_file_end_to_end(self, trilegal, tmp_path):
        """calc_probs with a MOLUSC companion posterior: the P*/S*
        scenarios run on the ingested mass ratios with lnprior = 0 and
        the kept/N zero-padding weight (reference ml.py:455-464), so a
        posterior that keeps very few companions must suppress
        P(PTP + PEB* + STP + SEB*) relative to the analytic prior."""
        rng = np.random.default_rng(3)
        n_keep = 40
        pd.DataFrame({
            "mass ratio": rng.uniform(0.2, 0.9, n_keep),
            "semi-major axis(AU)": rng.uniform(50, 300, n_keep),
            "eccentricity": rng.uniform(0.0, 0.5, n_keep),
        }).to_csv(tmp_path / "molusc.csv", index=False)
        time, flux, sigma, _ = make_transit_lightcurve(n_t=60, sigma=5e-4)

        def run(molusc_file):
            t = target.from_stars(_stars_df(n_nearby=0), ID=1000,
                                  sectors=[1], trilegal_fname=trilegal)
            t.calc_depths(tdepth=0.005)
            t.calc_probs(time, flux, sigma, P_orb=3.0, N=20000, nsamples=2,
                         verbose=0, molusc_file=molusc_file,
                         key=jax.random.key(7))
            pr = t.probs
            comp = sum(pr[pr.scenario == s]["prob"].values[0]
                       for s in ("PTP", "PEB", "PEBx2P", "STP", "SEB",
                                 "SEBx2P"))
            return t, comp

        t_m, comp_m = run(str(tmp_path / "molusc.csv"))
        t_0, comp_0 = run(None)
        assert np.isclose(t_m.probs["prob"].sum(), 1.0, atol=1e-6)
        assert not t_m.FPP_degenerate
        # 40 kept rows / 20000 draws -> companion scenarios carry ~500x
        # less weight than the analytic companion-frequency prior
        assert comp_m < 0.2 * max(comp_0, 1e-30) or comp_0 < 1e-12


class TestBehavioralFPP:
    def test_deep_eclipse_high_fpp(self, trilegal):
        """A 25%-deep eclipse cannot be a planet (R_p prior caps at 20
        Rearth): the EB scenarios must dominate."""
        import jax.numpy as jnp
        from triceratops_tpu.constants import G, MSUN, RSUN
        from triceratops_tpu.core.kepler import projected_z
        from triceratops_tpu.ops.occult import occult_quad_deficit

        time = np.linspace(-0.15, 0.15, 80)
        P, M_s, R_s = 2.0, 1.0, 1.0
        a = ((G * (M_s + 0.9) * MSUN) / (4 * np.pi**2)
             * (P * 86400) ** 2) ** (1 / 3)
        z, front = projected_z(jnp.asarray(time), 0.0, P,
                               a / (R_s * RSUN), np.deg2rad(89.0), 0.0, 0.0)
        D = np.asarray(occult_quad_deficit(
            jnp.asarray(0.85), z, jnp.asarray(0.4), jnp.asarray(0.2)))
        D = D * np.asarray(front)
        # dilute an EB eclipse to a 25% observed dip
        flux = 1.0 - 0.45 * D
        sigma = 1e-3
        flux = flux + np.random.default_rng(0).normal(0, sigma, 80)

        t = target.from_stars(_stars_df(n_nearby=0), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        t.calc_depths(tdepth=float((0.45 * D).max()))
        t.calc_probs(time, flux, sigma, P_orb=P, N=30000, nsamples=2,
                     verbose=0, key=jax.random.key(5))
        assert t.FPP > 0.9, f"deep eclipse FPP={t.FPP}"

    def test_clean_planet_low_fpp(self, trilegal):
        """A clean deep transit on a bright single star should strongly
        favor the planet scenarios over EBs."""
        t = target.from_stars(_stars_df(n_nearby=0), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        t.calc_depths(tdepth=0.0084)
        time, flux, sigma, depth = make_transit_lightcurve(
            n_t=100, rp_re=10.0, sigma=2e-4, seed=3)
        t.calc_probs(time, flux, sigma, P_orb=3.0, N=50000, nsamples=2,
                     verbose=0, key=jax.random.key(2))
        assert t.FPP < 0.5


class TestEnsemble:
    def test_calc_probs_ensemble(self, trilegal):
        t = target.from_stars(_stars_df(n_nearby=0), ID=1000, sectors=[1],
                              trilegal_fname=trilegal)
        t.calc_depths(tdepth=0.005)
        time, flux, sigma, _ = make_transit_lightcurve(n_t=40, sigma=5e-4)
        t.calc_probs_ensemble(time, flux, sigma, P_orb=3.0, n_runs=3,
                              N=2000, nsamples=2, verbose=0,
                              key=jax.random.key(9))
        assert t.FPP_runs.shape == (3,)
        assert 0.0 <= t.FPP <= 1.0
        assert t.FPP_std >= 0.0
        # deterministic given the key
        fpp1 = t.FPP
        t.calc_probs_ensemble(time, flux, sigma, P_orb=3.0, n_runs=3,
                              N=2000, nsamples=2, verbose=0,
                              key=jax.random.key(9))
        assert t.FPP == fpp1
