"""Population-layer tests: stellar relations vs scipy, LDC lookups,
TRILEGAL parsing (incl. the v1.5 J/Ks -> Tmag conversion), MOLUSC
ingestion, synthetic population physical consistency."""

import numpy as np
import pandas as pd
import jax.numpy as jnp

from triceratops_tpu.constants import G, MSUN, RSUN
from triceratops_tpu.populations.stellar import (
    stellar_relations, flux_relation,
)
from triceratops_tpu.populations import ldc
from triceratops_tpu.populations.molusc import load_molusc_qs
from triceratops_tpu.funcs import trilegal_results


class TestStellarRelations:
    def test_device_matches_host(self):
        rng = np.random.default_rng(0)
        m = rng.uniform(0.1, 3.0, 2000)
        r_h, t_h = stellar_relations(m, np.full(2000, 2.0),
                                     np.full(2000, 9000.0))
        r_d, t_d = stellar_relations(jnp.asarray(m), jnp.full(2000, 2.0),
                                     jnp.full(2000, 9000.0), xp=jnp)
        np.testing.assert_allclose(np.asarray(r_d), r_h, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(t_d), t_h, rtol=2e-5)

    def test_clamps(self):
        r, t = stellar_relations(np.array([0.05, 5.0]), np.array([0.5, 1.0]),
                                 np.array([3000.0, 5000.0]))
        assert r[0] >= 0.1 and t[0] >= 2800.0
        assert r[1] <= 1.0 and t[1] <= 5000.0  # clamped to target values

    def test_flux_relation_bands(self):
        m = np.array([0.3, 1.0, 2.0])
        for filt in ["TESS", "Vis", "J", "H", "K"]:
            f_h = flux_relation(m, filt)
            f_d = np.asarray(flux_relation(jnp.asarray(m), filt, xp=jnp))
            np.testing.assert_allclose(f_d, f_h, rtol=2e-5)
            assert np.all(np.diff(f_h) > 0)  # brighter with mass


class TestLDC:
    def test_target_lookup_grid_points(self):
        # exactly on a grid node -> the node's coefficients
        u1, u2 = ldc.lookup_target(0.0, 5750, 4.5, "TESS")
        g = ldc._grids("TESS")
        m = (g["Z"] == 0.0) & (g["Teff"] == 5750) & (g["logg"] == 4.5)
        assert u1 == g["u1"][m][0] and u2 == g["u2"][m][0]

    def test_lookup_stars_matches_scalar_two_stage(self):
        rng = np.random.default_rng(1)
        teffs = rng.uniform(3400, 10500, 50)
        loggs = rng.uniform(3.2, 5.3, 50)
        zs = rng.uniform(-0.8, 0.5, 50)
        u1v, u2v = ldc.lookup_stars(teffs, loggs, zs, "TESS")
        g = ldc._grids("TESS")
        for i in range(50):
            tsel = g["Teff"][np.argmin(np.abs(g["Teff"] - teffs[i]))]
            gsel = g["logg"][np.argmin(np.abs(g["logg"] - loggs[i]))]
            m1 = (g["Teff"] == tsel) & (g["logg"] == gsel)
            zslice = g["Z"][m1]
            zsel = zslice[np.argmin(np.abs(zslice - zs[i]))]
            m = m1 & (g["Z"] == zsel)
            assert u1v[i] == g["u1"][m][0], i
            assert u2v[i] == g["u2"][m][0], i

    def test_grid_at_z_round_indexing(self):
        u1t, u2t = ldc.grid_at_Z(0.0, "TESS", teff_max=10000)
        il, it = ldc.round_index_comp(np.array([3.1, 4.74, 5.6]),
                                      np.array([3100.0, 5620.0, 12000.0]),
                                      u1t.shape[1])
        # logg 3.1 -> 3.5 (idx 0); 4.74 -> 4.5 (round-half-even: 9.48->9)
        assert il[0] == 0 and il[2] == 3
        # Teff 3100 -> 3500 (idx 0); 12000 clamped to max
        assert it[0] == 0 and it[2] == u1t.shape[1] - 1


class TestTrilegalParsing:
    def test_v15_fallback_tmag_conversion(self, tmp_path):
        """Without a TESS column, Tmags come from the Stassun (2018)
        J/Ks relations (reference funcs.py:374-393)."""
        n = 6
        df = pd.DataFrame({
            "Gc": 1, "logAge": 9.0, "[M/H]": 0.0, "m_ini": 1.0,
            "Mact": np.ones(n), "logL": 0.0,
            "logTe": np.full(n, 3.76), "logg": np.full(n, 4.4),
            "m-M0": 10.0, "Av": 0.0,
            "J": np.array([12.0, 12.0, 12.0, 12.0, 12.0, 12.0]),
            "H": np.full(n, 11.8),
            "Ks": np.array([11.5, 11.9, 11.1, 12.2, 10.8, 11.95]),
        })
        p = tmp_path / "v15.csv"
        df.to_csv(p)
        Tm, M, lg, Te, Z, J, H, K = trilegal_results(str(p), 0.0)
        jk = df["J"].values[:-2] - df["Ks"].values[:-2]
        for i, (j, x) in enumerate(zip(df["J"].values[:-2], jk)):
            if -0.1 <= x <= 0.7:
                exp = (j + 1.22163 * x**3 - 1.74299 * x**2
                       + 1.89115 * x + 0.0563)
            elif 0.7 < x <= 1.0:
                exp = (j - 269.372 * x**3 + 668.453 * x**2
                       - 545.64 * x + 147.811)
            elif x < -0.1:
                exp = j + 0.5
            else:
                exp = j + 1.75
            assert np.isclose(Tm[i], exp), (i, x)

    def test_faintness_cut_and_banner_rows(self, tmp_path):
        from fixtures import make_trilegal_csv
        p = make_trilegal_csv(tmp_path / "t.csv", n_stars=200,
                              Tmag_target=12.0)
        Tm = trilegal_results(p, 12.0)[0]
        assert np.all(Tm >= 12.0)
        assert len(Tm) <= 200


class TestMolusc:
    def test_ingestion(self, tmp_path):
        df = pd.DataFrame({
            "mass ratio": [0.5, 0.05, 0.8, 0.3],
            "semi-major axis(AU)": [100.0, 50.0, 5.0, 200.0],
            "eccentricity": [0.1, 0.2, 0.0, 0.96],
        })
        p = tmp_path / "molusc.csv"
        df.to_csv(p, index=False)
        qs = load_molusc_qs(str(p), M_s=0.5, N=10)
        # row 2: a(1-e)=5 < 10 excluded; row 3: a(1-e)=8 < 10 excluded
        # row 1: q=0.05 floored at 0.1/0.5=0.2
        kept = qs[qs != 0]
        assert len(qs) == 10
        assert set(np.round(kept, 3)) == {0.5, 0.2}

    def test_molusc_scenario_mask(self, tmp_path):
        """Zero-padded draws are excluded but counted in N
        (reference ml.py:534)."""
        import jax
        from triceratops_tpu.scenarios import api
        from fixtures import make_transit_lightcurve
        df = pd.DataFrame({
            "mass ratio": np.full(50, 0.5),
            "semi-major axis(AU)": np.full(50, 100.0),
            "eccentricity": np.full(50, 0.1),
        })
        p = tmp_path / "m2.csv"
        df.to_csv(p, index=False)
        time, flux, sigma, _ = make_transit_lightcurve(n_t=40)
        res = api.lnZ_PTP(time, flux, sigma, 3.0, 1.0, 1.0, 5800.0, 0.0,
                          plx=20.0, N=2000, nsamples=2,
                          molusc_file=str(p), key=jax.random.key(0))
        # only 50/2000 draws are live; evidence penalized by ln(50/2000)
        # relative to an equivalent TTP -> simply assert finiteness and
        # that the padding didn't produce NaN
        assert np.isfinite(res["lnZ"])


class TestSyntheticPopulation:
    def test_physical_consistency(self, tmp_path):
        from triceratops_tpu.populations.synthetic import (
            make_synthetic_trilegal)
        p = make_synthetic_trilegal(tmp_path / "syn.csv", Tmag_target=10.0,
                                    n_stars=500, seed=3)
        Tm, M, lg, Te, Z, J, H, K = trilegal_results(p, 10.0)
        # loggs consistent with the mass-radius relation
        r_exp, t_exp = stellar_relations(M, np.full(len(M), np.inf),
                                         np.full(len(M), np.inf))
        lg_exp = np.log10(G * M * MSUN / (r_exp * RSUN) ** 2)
        np.testing.assert_allclose(lg, lg_exp, atol=1e-6)
        np.testing.assert_allclose(Te, t_exp, rtol=1e-6)
        assert np.all((Tm >= 10.0) & (Tm <= 21.0))
