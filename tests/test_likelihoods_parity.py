"""Public likelihoods-surface parity: scalar vs batch agreement, dilution
algebra, secondary veto, twin behavior, collision-mask semantics
(behavioral replacements for the reference's source-regex tests,
tests/test_beb_collision_mask.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from triceratops_tpu.constants import G, MSUN, RSUN
from triceratops_tpu import likelihoods as lk
from triceratops_tpu.scenarios import engine as eng


def _orbit(P=3.0, M=1.0):
    return ((G * M * MSUN) / (4 * np.pi**2) * (P * 86400) ** 2) ** (1 / 3)


class TestScalarVsBatch:
    def test_tp(self):
        time = np.linspace(-0.1, 0.1, 50)
        a = _orbit()
        rng = np.random.default_rng(0)
        flux = 1 + rng.normal(0, 5e-4, 50)
        args = dict(P_orb=3.0, a=a, R_s=1.0, u1=0.4, u2=0.2)
        Rps = np.array([2.0, 8.0, 14.0])
        incs = np.array([89.5, 89.0, 88.8])
        eccs = np.array([0.0, 0.2, 0.4])
        argps = np.array([90.0, 10.0, 250.0])
        frs = np.array([0.0, 0.3, 0.6])
        batch = lk.lnL_TP_p(time, flux, 5e-4, Rps, 3.0, incs,
                            np.full(3, a), np.full(3, 1.0),
                            np.full(3, 0.4), np.full(3, 0.2), eccs, argps,
                            frs)
        for i in range(3):
            scalar = lk.lnL_TP(time, flux, 5e-4, Rps[i], 3.0, incs[i], a,
                               1.0, 0.4, 0.2, eccs[i], argps[i],
                               companion_fluxratio=frs[i])
            assert np.isclose(batch[i], scalar, rtol=1e-5), i

    def test_eb_veto_and_twin(self):
        time = np.linspace(-0.1, 0.1, 50)
        a = _orbit(M=1.6)
        flux = np.ones(50)
        # a deep undiluted EB: secondary depth >> 1.5 sigma -> veto
        lnl = lk.lnL_EB(time, flux, 5e-4, 0.6, 0.3, 3.0, 89.5, a, 1.0,
                        0.4, 0.2, 0.0, 90.0)
        assert lnl == np.inf
        # twin variant never vetoes
        lnl_twin = lk.lnL_EB_twin(time, flux, 5e-4, 0.6, 0.3, 6.0, 89.5,
                                  a, 1.0, 0.4, 0.2, 0.0, 90.0)
        assert np.isfinite(lnl_twin)
        # batch versions agree
        b = lk.lnL_EB_p(time, flux, 5e-4, np.array([0.6]), np.array([0.3]),
                        3.0, np.array([89.5]), np.array([a]),
                        np.array([1.0]), np.array([0.4]), np.array([0.2]),
                        np.array([0.0]), np.array([90.0]), np.array([0.0]))
        assert b[0] == np.inf
        bt = lk.lnL_EB_twin_p(time, flux, 5e-4, np.array([0.6]),
                              np.array([0.3]), 6.0, np.array([89.5]),
                              np.array([a]), np.array([1.0]),
                              np.array([0.4]), np.array([0.2]),
                              np.array([0.0]), np.array([90.0]),
                              np.array([0.0]))
        assert np.isclose(bt[0], lnl_twin, rtol=1e-5)

    def test_dilution_directions(self):
        """companion_is_host flips which flux dilutes the eclipse
        (reference likelihoods.py:74-79)."""
        time = np.linspace(-0.05, 0.05, 30)
        a = _orbit()
        f_host = lk.simulate_TP_transit(time, 10.0, 3.0, 90.0, a, 1.0,
                                        0.4, 0.2, 0.0, 90.0,
                                        companion_fluxratio=0.3,
                                        companion_is_host=True)
        f_nohost = lk.simulate_TP_transit(time, 10.0, 3.0, 90.0, a, 1.0,
                                          0.4, 0.2, 0.0, 90.0,
                                          companion_fluxratio=0.3,
                                          companion_is_host=False)
        d_host = 1 - f_host.min()
        d_nohost = 1 - f_nohost.min()
        # host dilution factor 0.3 vs 0.7 of the undiluted depth
        assert np.isclose(d_host / d_nohost, 0.3 / 0.7, rtol=1e-3)

    def test_eb_secdepth_algebra(self):
        """secdepth = max sec deficit x g_sec (reference
        likelihoods.py:150-159)."""
        time = np.linspace(-0.05, 0.05, 30)
        a = _orbit(M=1.5)
        _, sd_plain = lk.simulate_EB_transit(time, 0.5, 0.25, 3.0, 90.0, a,
                                             1.0, 0.4, 0.2, 0.0, 90.0)
        _, sd_diluted = lk.simulate_EB_transit(time, 0.5, 0.25, 3.0, 90.0,
                                               a, 1.0, 0.4, 0.2, 0.0, 90.0,
                                               companion_fluxratio=0.5)
        assert sd_diluted < sd_plain


class TestCollisionMaskSemantics:
    """Behavioral equivalent of the reference's collision-mask tests
    (tests/test_beb_collision_mask.py): the normal branch must use the
    (radii + R_host) collision radius and the twin branch the 2*R_host
    radius, each with its own semimajor axis."""

    def test_twin_uses_own_collision_radius(self):
        key = jax.random.key(0)
        N = 20000
        d = eng.sample_teb(key, jnp.float32(0.8), jnp.float32(0.8),
                           jnp.float32(1.0), jnp.float32(1.0),
                           jnp.float32(5800.0), N=N)
        a = np.asarray(d["a"])
        a_twin = np.asarray(d["a_twin"])
        radii = np.asarray(d["radii"])
        eccs = np.asarray(d["eccs"])
        mask = np.asarray(d["mask"])
        mask_twin = np.asarray(d["mask_twin"])
        coll = (radii + 1.0) * RSUN > a * (1 - eccs)
        coll_twin = 2.0 * RSUN > a_twin * (1 - eccs)
        # no masked-in draw may violate its own branch's collision rule
        assert not np.any(mask & coll)
        assert not np.any(mask_twin & coll_twin)
        # q branches are exclusive
        qs = np.asarray(d["qs"])
        assert not np.any(mask & (qs >= 0.95))
        assert not np.any(mask_twin & (qs < 0.95))
        # the twin rule must actually bite for this short-period config
        assert np.any(coll_twin != coll)

    @pytest.mark.parametrize("sampler,extra", [
        ("sample_teb", {}),
        ("sample_neb_evolved", {}),
    ])
    def test_twin_semimajor_is_2P(self, sampler, extra):
        key = jax.random.key(1)
        fn = getattr(eng, sampler)
        d = fn(key, jnp.float32(3.0), jnp.float32(3.0), jnp.float32(1.0),
               jnp.float32(1.0), jnp.float32(5800.0), N=2000, **extra)
        ratio = np.asarray(d["a_twin"]) / np.asarray(d["a"])
        np.testing.assert_allclose(ratio, 2 ** (2 / 3), rtol=1e-5)
