"""Stable-numerics tests, mirroring the reference's semantics
(reference: tests/test_log_mean_exp.py) plus device-path parity."""

import numpy as np
import pytest

from triceratops_tpu.core.numerics import (
    log_mean_exp,
    log_mean_exp_jax,
    normalize_probabilities,
)


class TestLogMeanExp:
    def test_simple_exact(self):
        logw = np.log(np.array([1.0, 2.0, 3.0, 4.0]))
        assert np.isclose(log_mean_exp(logw, N_total=4), np.log(2.5))

    def test_underflow_regression(self):
        # values so negative exp() underflows; historical scheme
        # exp(lnL + 600) would produce 0/0
        logw = np.array([-1e4, -1e4 + 1.0])
        expected = -1e4 + np.log((1 + np.e) / 2)
        assert np.isclose(log_mean_exp(logw, N_total=2), expected)

    def test_neginf_counts_in_denominator(self):
        logw = np.array([0.0, -np.inf, -np.inf, -np.inf])
        assert np.isclose(log_mean_exp(logw, N_total=4), np.log(0.25))

    def test_nan_treated_as_neginf(self):
        logw = np.array([0.0, np.nan, np.nan, np.nan])
        assert np.isclose(log_mean_exp(logw, N_total=4), np.log(0.25))

    def test_all_neginf(self):
        logw = np.full(10, -np.inf)
        assert log_mean_exp(logw, N_total=10) == -np.inf

    def test_posinf_propagates(self):
        logw = np.array([0.0, np.inf, -np.inf])
        assert log_mean_exp(logw, N_total=3) == np.inf

    def test_N_total_mismatch_raises(self):
        with pytest.raises(ValueError):
            log_mean_exp(np.zeros(5), N_total=4)

    @pytest.mark.parametrize("case", [
        np.log(np.array([1.0, 2.0, 3.0, 4.0])),
        np.array([-1e4, -1e4 + 1.0]),
        np.array([0.0, -np.inf, -np.inf, -np.inf]),
        np.array([0.0, np.nan, np.nan]),
        np.full(7, -np.inf),
        np.array([0.0, np.inf, -np.inf]),
    ])
    def test_jax_matches_host(self, case):
        host = log_mean_exp(case, N_total=case.size)
        dev = float(log_mean_exp_jax(case, case.size))
        if np.isnan(host):
            assert np.isnan(dev)
        elif np.isinf(host):
            assert dev == host
        else:
            assert np.isclose(dev, host, rtol=1e-12)


class TestNormalizeProbabilities:
    def test_ok(self):
        lnZ = np.array([0.0, np.log(3.0)])
        probs, status = normalize_probabilities(lnZ)
        assert status == "ok"
        np.testing.assert_allclose(probs, [0.25, 0.75])

    def test_ok_with_some_neginf(self):
        lnZ = np.array([0.0, -np.inf])
        probs, status = normalize_probabilities(lnZ)
        assert status == "ok"
        np.testing.assert_allclose(probs, [1.0, 0.0])

    def test_all_neginf(self):
        probs, status = normalize_probabilities(np.full(3, -np.inf))
        assert status == "all_neginf"
        np.testing.assert_array_equal(probs, np.zeros(3))

    def test_anomaly_nan(self):
        probs, status = normalize_probabilities(np.array([0.0, np.nan]))
        assert status == "anomaly"
        np.testing.assert_array_equal(probs, np.zeros(2))

    def test_anomaly_posinf(self):
        probs, status = normalize_probabilities(np.array([0.0, np.inf]))
        assert status == "anomaly"

    def test_extreme_spread_no_overflow(self):
        lnZ = np.array([-1e5, -1e5 + 2.0, -1e5 - 3.0])
        probs, status = normalize_probabilities(lnZ)
        assert status == "ok"
        assert np.isclose(probs.sum(), 1.0)
