"""Prior-sampler distribution checks against the reference's analytic
forms (reference: triceratops/priors.py)."""

import numpy as np
import jax.numpy as jnp
from scipy.stats import beta as beta_dist, kstest

from triceratops_tpu.priors.samplers import (
    sample_rp, sample_inc, sample_ecc, sample_w, sample_q,
    sample_q_companion,
)


def _u(n, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, n)


class TestSampleInc:
    def test_cos_uniform(self):
        x = _u(100000)
        inc = np.asarray(sample_inc(jnp.asarray(x)))
        assert inc.min() >= 0 and inc.max() <= 90
        # cos(inc) should be uniform
        stat = kstest(np.cos(np.deg2rad(inc)), "uniform").statistic
        assert stat < 0.01


class TestSampleW:
    def test_range(self):
        x = _u(1000)
        w = np.asarray(sample_w(jnp.asarray(x)))
        np.testing.assert_allclose(w, x * 360.0)


class TestSampleEcc:
    def test_planet_beta(self):
        x = _u(100000)
        e = np.asarray(sample_ecc(jnp.asarray(x), True, 5.0))
        stat = kstest(e, lambda v: beta_dist.cdf(v, 0.867, 3.030)).statistic
        assert stat < 0.01

    def test_binary_powerlaw_short(self):
        x = _u(100000)
        e = np.asarray(sample_ecc(jnp.asarray(x), False, 5.0))
        # CDF of powerlaw(0.2) is e^0.2
        stat = kstest(e, lambda v: v**0.2).statistic
        assert stat < 0.01

    def test_binary_powerlaw_long(self):
        x = _u(100000)
        e = np.asarray(sample_ecc(jnp.asarray(x), False, 30.0))
        stat = kstest(e, lambda v: v**0.6).statistic
        assert stat < 0.01


class TestSampleRp:
    def test_range_and_breaks(self):
        x = _u(200000)
        r = np.asarray(sample_rp(jnp.asarray(x), jnp.full(len(x), 1.0), False))
        assert r.min() >= 0.5 and r.max() <= 20.0
        # analytic segment probabilities from the reference's normalization
        # constants (priors.py:39-52): I1=2.5, I2=0.875, I3=0.611
        A1 = 3.0**0 / 3.0**-4
        A2 = 6.0**-4 / 6.0**-0.5
        I1 = 3.0 - 0.5
        I2 = A1 * (6.0**-3 - 3.0**-3) / (-3.0)
        I3 = A2 * A1 * (20.0**0.5 - 6.0**0.5) / 0.5
        tot = I1 + I2 + I3
        assert abs(((r < 3)).mean() - I1 / tot) < 0.01
        assert abs(((r >= 3) & (r < 6)).mean() - I2 / tot) < 0.01
        assert abs((r >= 6).mean() - I3 / tot) < 0.01

    def test_monotone_in_x(self):
        x = np.linspace(1e-4, 1 - 1e-4, 1000)
        r = np.asarray(sample_rp(jnp.asarray(x), jnp.full(1000, 1.0), False))
        assert np.all(np.diff(r) > 0)

    def test_flat(self):
        x = _u(1000)
        r = np.asarray(sample_rp(jnp.asarray(x), jnp.full(1000, 1.0), True))
        np.testing.assert_allclose(r, x * 19.5 + 0.5)

    def test_cool_host_steeper(self):
        x = _u(100000, 1)
        r_hot = np.asarray(sample_rp(jnp.asarray(x), jnp.full(len(x), 1.0), False))
        r_cool = np.asarray(sample_rp(jnp.asarray(x), jnp.full(len(x), 0.3), False))
        # cool hosts (p2=-7) have even fewer 3-6 Re planets
        assert ((r_cool > 3) & (r_cool < 6)).mean() < ((r_hot > 3) & (r_hot < 6)).mean()


class TestSampleQ:
    def test_range_solar(self):
        q = np.asarray(sample_q(jnp.asarray(_u(100000)), 1.0))
        assert q.min() >= 0.1 - 1e-9 and q.max() <= 1.0 + 1e-9

    def test_twin_excess(self):
        q = np.asarray(sample_q(jnp.asarray(_u(200000)), 1.0))
        # F_twin = 0.30 of systems have q >= 0.95 by construction? No —
        # F_twin is defined as excess fraction; just check a visible bump:
        # the density in [0.95, 1] exceeds the p2=-0.5 extrapolation
        d_twin = (q >= 0.95).mean() / 0.05
        d_mid = ((q >= 0.85) & (q < 0.95)).mean() / 0.10
        assert d_twin > 1.2 * d_mid

    def test_q_min_scales_with_mass(self):
        q = np.asarray(sample_q(jnp.asarray(_u(100000)), 0.5))
        assert q.min() >= 0.1 / 0.5 - 1e-9

    def test_tiny_host_all_twins(self):
        q = np.asarray(sample_q(jnp.asarray(_u(100)), 0.05))
        np.testing.assert_array_equal(q, np.ones(100))

    def test_low_mass_regime(self):
        q = np.asarray(sample_q(jnp.asarray(_u(100000)), 0.2))
        assert q.min() >= 0.1 / 0.2 - 1e-9 and q.max() <= 1.0 + 1e-9

    def test_monotone(self):
        for M in [1.5, 1.0, 0.7, 0.3, 0.2, 0.12]:
            x = np.linspace(1e-5, 1 - 1e-5, 500)
            q = np.asarray(sample_q(jnp.asarray(x), M))
            assert np.all(np.diff(q) >= -1e-12), f"M={M}"


class TestSampleQCompanion:
    def test_weaker_twin_excess(self):
        x = _u(200000)
        q_short = np.asarray(sample_q(jnp.asarray(x), 1.0))
        q_long = np.asarray(sample_q_companion(jnp.asarray(x), 1.0))
        assert (q_long >= 0.95).mean() < (q_short >= 0.95).mean()
        # steeper slope -0.95 -> more low-q companions
        assert (q_long < 0.3).mean() > (q_short < 0.3).mean()
