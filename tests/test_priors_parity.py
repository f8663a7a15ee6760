"""Occurrence-prior parity tests (reference tests/test_background_prior_
log_base.py themes + the deliberately zeroed Moe-Di Stefano segments)."""

import numpy as np
import jax.numpy as jnp

from triceratops_tpu.constants import G, MSUN, AU, PI
from triceratops_tpu.priors.companion import (
    lnprior_background, lnprior_bound_TP, lnprior_bound_EB,
    clamp_companion_prior, separation_at_contrast,
    lnprior_Mstar_planet, lnprior_Mstar_binary,
    lnprior_Porb_planet, lnprior_Porb_binary,
)


def _j(x):
    return jnp.asarray(np.asarray(x, np.float64))


class TestBackgroundPrior:
    def test_natural_log_not_log10(self):
        """reference tests/test_background_prior_log_base.py:50-143."""
        N_comp = 1000
        seps = np.array([2.2])
        cons = np.array([1.0])
        dm = np.array([1.0])
        got = float(lnprior_background(N_comp, _j(dm), _j(seps), _j(cons))[0])
        expected_ln = np.log((N_comp / 0.1) * (1 / 3600) ** 2 * 2.2**2)
        expected_log10 = np.log10((N_comp / 0.1) * (1 / 3600) ** 2 * 2.2**2)
        assert np.isclose(got, expected_ln, rtol=1e-6)
        assert not np.isclose(got, expected_log10, rtol=1e-2)
        # exact ln(10) relationship between the two bases
        assert np.isclose(got / expected_log10, np.log(10.0), rtol=1e-6)

    def test_separation_dependence(self):
        # prior scales as sep^2
        seps = np.array([0.5, 1.0, 2.0])
        cons = np.array([2.0, 4.0, 6.0])
        a = float(lnprior_background(100, _j([4.0]), _j(seps), _j(cons))[0])
        b = float(lnprior_background(100, _j([6.0]), _j(seps), _j(cons))[0])
        assert np.isclose(b - a, 2 * np.log(2.0), rtol=1e-6)


class TestBoundPriors:
    def _lp(self, fn, M_s, dm, sep_limit):
        """Evaluate at a single delta-mag with a flat contrast curve."""
        return float(fn(M_s, 10.0, _j([dm]), _j([sep_limit]), _j([0.5]))[0])

    def test_tp_zeroes_short_period_segments(self):
        """TP variant assumes companion P > 2500 d: any max-separation
        with log10(Pmax) < 3.4 gives zero rate -> lnprior = -inf
        (reference priors.py:659-675)."""
        # choose a separation limit so Pmax is small: sep such that
        # log10(Pmax) ~ 2 < 3.4
        d_pc = 1000 / 10.0
        # Pmax(days) = sqrt(4pi^2/(G Msun) (sep_arcsec*d*AU)^3)/86400
        for sep in [0.001, 0.005]:
            lp = self._lp(lnprior_bound_TP, 1.0, 0.5, sep)
            Pmax = np.sqrt((4 * PI**2) / (G * MSUN)
                           * (sep * d_pc * AU) ** 3) / 86400
            if np.log10(Pmax) < 3.4:
                assert lp == -np.inf, (sep, Pmax)

    def test_eb_keeps_intermediate_segments(self):
        """EB variant only drops the t1 term: log10(Pmax) in (1, 3.4)
        still yields a finite rate (reference priors.py:861-876)."""
        d_pc = 1000 / 10.0
        # find a sep with log10 Pmax ~ 2.5
        target = 10 ** 2.5 * 86400
        sep = ((target**2 * G * MSUN) / (4 * PI**2)) ** (1 / 3) / (d_pc * AU)
        lp_eb = self._lp(lnprior_bound_EB, 1.0, 0.5, sep)
        lp_tp = self._lp(lnprior_bound_TP, 1.0, 0.5, sep)
        assert np.isfinite(lp_eb)
        assert lp_tp == -np.inf

    def test_low_mass_scaling(self):
        """M_s < 1 evaluates rates at 1 Msun then rescales by
        0.65 + 0.35 M_s (reference priors.py:778, :980)."""
        big_sep = 10.0  # log10 Pmax >> 8
        lp1 = self._lp(lnprior_bound_EB, 1.0, 0.5, big_sep)
        lp05 = self._lp(lnprior_bound_EB, 0.5, 0.5, big_sep)
        assert np.isclose(lp05 - lp1, np.log(0.65 + 0.35 * 0.5), atol=1e-5)

    def test_clamps(self):
        lp = clamp_companion_prior(_j([0.5, -1.0, -2.0]),
                                   _j([-1.0, 0.5, -3.0]))
        out = np.asarray(lp)
        assert out[0] == 0.0          # positive prior clamped to 0
        assert out[1] == -np.inf      # brighter companion excluded
        assert np.isclose(out[2], -2.0)

    def test_nan_parallax_fallback(self):
        lp = float(lnprior_bound_EB(1.0, jnp.nan, _j([0.5]), _j([10.0]),
                                    _j([0.5]))[0])
        lp01 = float(lnprior_bound_EB(1.0, 0.1, _j([0.5]), _j([10.0]),
                                      _j([0.5]))[0])
        assert np.isclose(lp, lp01)   # NaN plx -> 0.1 (priors.py:601-602)


class TestDeadPathPriors:
    def test_mstar_priors_return_zero(self):
        assert lnprior_Mstar_planet(np.array([1.0])) == 0.0
        assert lnprior_Mstar_binary(np.array([0.5])) == 0.0

    def test_porb_priors_normalized(self):
        # probabilities of a +/-0.1 d window; finite and negative log
        for P in [0.5, 5.0, 9.95, 10.05, 30.0, 49.95]:
            assert lnprior_Porb_planet(P) < 0.0
            assert lnprior_Porb_binary(P) < 0.0
        assert lnprior_Porb_planet(5.0, flatpriors=True) < 0.0


class TestSeparationAtContrast:
    def test_interp(self):
        seps = np.array([0.1, 1.0, 2.0])
        cons = np.array([2.0, 5.0, 8.0])
        got = np.asarray(separation_at_contrast(_j([3.5, 10.0, 0.0]),
                                                _j(seps), _j(cons)))
        assert np.isclose(got[0], 0.55)   # midway 2->5
        assert got[1] == 2.0              # clamped right
        assert got[2] == 0.1              # clamped left
