"""Kepler solver and projected-separation checks."""

import numpy as np
import jax.numpy as jnp

from triceratops_tpu.core.kepler import (
    solve_kepler, projected_z, mean_anomaly_at_transit, E_MAX,
)


class TestSolveKepler:
    def test_residual_over_range(self):
        rng = np.random.default_rng(0)
        M = rng.uniform(-20, 20, 5000)
        e = rng.uniform(0, 0.99, 5000)
        E = np.asarray(solve_kepler(jnp.asarray(M), jnp.asarray(e)))
        ec = np.clip(e, 0, E_MAX)
        resid = E - ec * np.sin(E) - M
        assert np.abs(resid).max() < 1e-10

    def test_circular(self):
        M = np.linspace(-3, 3, 100)
        E = np.asarray(solve_kepler(jnp.asarray(M), jnp.zeros(100)))
        np.testing.assert_allclose(E, M, atol=1e-12)


class TestProjectedZ:
    def test_transit_center_is_impact_parameter(self):
        # at t = t0 the separation equals b = a_R * cos(i) * r/a
        a_R, inc = 10.0, np.deg2rad(88.0)
        for e, w in [(0.0, 0.3), (0.3, 1.0), (0.6, -2.0)]:
            z, front = projected_z(jnp.asarray([0.0]), 0.0, 3.0, a_R, inc, e, w)
            # nu_tc = pi/2 - w -> r/a = (1-e^2)/(1 + e sin w)
            r_a = (1 - e**2) / (1 + e * np.sin(w))
            expected = a_R * r_a * abs(np.cos(inc))
            assert front[0]
            np.testing.assert_allclose(float(z[0]), expected, rtol=1e-6)

    def test_behind_star_flagged(self):
        # half a period later the planet is on the far side
        z, front = projected_z(jnp.asarray([1.5]), 0.0, 3.0, 10.0,
                               np.deg2rad(90.0), 0.0, 0.5)
        assert not bool(front[0])

    def test_symmetry_circular(self):
        t = jnp.asarray([-0.02, 0.02])
        z, _ = projected_z(t, 0.0, 3.0, 10.0, np.deg2rad(89.0), 0.0, 0.7)
        np.testing.assert_allclose(float(z[0]), float(z[1]), rtol=1e-6)
