"""Transit-kernel correctness: the closed-form+quadrature occultation
deficit against an independent adaptive-quadrature reference (f64), plus
f32 accuracy bounds and known analytic limits."""

import numpy as np
import jax.numpy as jnp
import pytest

from triceratops_tpu.ops.occult import (
    occult_quad_deficit,
    occult_quad_deficit_reference,
)


def _dev(p, z, u1, u2, dtype):
    return np.asarray(
        occult_quad_deficit(
            jnp.asarray(p, dtype=dtype), jnp.asarray(z, dtype=dtype),
            jnp.asarray(u1, dtype=dtype), jnp.asarray(u2, dtype=dtype),
        )
    )


class TestAnalyticLimits:
    def test_out_of_transit(self):
        assert _dev(0.1, 1.2, 0.3, 0.2, jnp.float64) == 0.0
        assert _dev(0.1, 50.0, 0.3, 0.2, jnp.float64) == 0.0

    def test_total_occultation(self):
        # star fully inside occulter: deficit = 1
        assert np.isclose(_dev(2.0, 0.5, 0.4, 0.2, jnp.float64), 1.0, atol=1e-12)

    def test_uniform_central(self):
        # u1=u2=0, z=0: deficit = p^2
        assert np.isclose(_dev(0.1, 0.0, 0.0, 0.0, jnp.float64), 0.01, atol=1e-12)

    def test_central_quadratic_closed_form(self):
        # z=0: D = [c_u p^2 pi + c_mu (2pi/3)(1-(1-p^2)^1.5) + u2 pi p^4/2]/(pi Omega)
        p, u1, u2 = 0.1, 0.5, 0.2
        omega = 1 - u1 / 3 - u2 / 6
        expected = (
            (1 - u1 - 2 * u2) * p**2
            + (u1 + 2 * u2) * (2 / 3) * (1 - (1 - p**2) ** 1.5)
            + u2 * p**4 / 2
        ) / omega
        assert np.isclose(_dev(p, 0.0, u1, u2, jnp.float64), expected, rtol=1e-12)


class TestAgainstQuadrature:
    @pytest.mark.parametrize("u1,u2", [(0.0, 0.0), (0.3, 0.2), (0.5, 0.0),
                                       (0.7, -0.1), (0.1, 0.35)])
    def test_sweep_small_planet(self, u1, u2):
        p = 0.1
        zs = np.concatenate([
            np.linspace(0.0, 1.0 + p, 41),
            [abs(1 - p), 1 - p + 1e-6, p, p - 1e-7, p + 1e-7, 1.0, 1 + p - 1e-6],
        ])
        got = _dev(p, zs, u1, u2, jnp.float64)
        want = np.array([occult_quad_deficit_reference(p, z, u1, u2) for z in zs])
        np.testing.assert_allclose(got, want, atol=2e-9)

    @pytest.mark.parametrize("p", [0.01, 0.05, 0.3, 0.7, 0.999, 1.0, 1.001, 1.5, 3.0])
    def test_sweep_radius_ratios(self, p):
        u1, u2 = 0.4, 0.25
        zs = np.concatenate([
            np.linspace(max(p - 1, 0.0) + 1e-9, 1.0 + p - 1e-9, 25),
            [abs(1 - p) + 1e-9, p, abs(p - 1e-9)],
        ])
        zs = zs[zs >= 0]
        got = _dev(p, zs, u1, u2, jnp.float64)
        want = np.array([occult_quad_deficit_reference(p, z, u1, u2) for z in zs])
        np.testing.assert_allclose(got, want, atol=5e-8)

    def test_random_broad(self):
        rng = np.random.default_rng(0)
        p = 10 ** rng.uniform(-2, 0.5, 300)
        z = rng.uniform(0, 1, 300) * (1 + p)
        u1 = rng.uniform(0, 1, 300)
        u2 = rng.uniform(-0.2, 0.5, 300)
        got = _dev(p, z, u1, u2, jnp.float64)
        want = np.array([
            occult_quad_deficit_reference(pi, zi, a, b)
            for pi, zi, a, b in zip(p, z, u1, u2)
        ])
        np.testing.assert_allclose(got, want, atol=5e-8)


class TestFloat32:
    def test_f32_absolute_error(self):
        """f32 kernel must stay well below typical photometric noise
        (sigma ~ 3e-4) everywhere, including contact points."""
        rng = np.random.default_rng(1)
        p = 10 ** rng.uniform(-2, 0, 500)
        z = rng.uniform(0, 1, 500) * (1 + p)
        u1 = rng.uniform(0, 0.8, 500)
        u2 = rng.uniform(0, 0.4, 500)
        f64 = _dev(p, z, u1, u2, jnp.float64)
        f32 = _dev(p, z, u1, u2, jnp.float32)
        err = np.abs(f64 - f32)
        assert err.max() < 5e-6, f"max f32 error {err.max():.2e}"

    def test_f32_near_contacts(self):
        p = 0.1
        eps = np.array([1e-7, 1e-6, 1e-5, 1e-4, 1e-3])
        zs = np.concatenate([1 + p - eps, 1 - p + eps, 1 - p - eps, p + eps, p - eps])
        f64 = _dev(p, zs, 0.4, 0.2, jnp.float64)
        f32 = _dev(p, zs, 0.4, 0.2, jnp.float32)
        assert np.abs(f64 - f32).max() < 1e-5
