"""Stress sweep: extreme-but-legal inputs must never produce NaN
evidences or crashes (degenerate -inf is acceptable)."""

import numpy as np
import jax
import pytest

from triceratops_tpu.scenarios import api
from fixtures import make_transit_lightcurve

N, NS = 1500, 2


@pytest.fixture(scope="module")
def lc():
    return make_transit_lightcurve(n_t=40, sigma=5e-4)


CASES = [
    # (P_orb, M_s, R_s, Teff)
    (0.3, 1.0, 1.0, 5800.0),       # ultra-short period
    (45.0, 1.0, 1.0, 5800.0),      # long period, tiny Ptra
    (3.0, 0.11, 0.13, 2900.0),     # late M dwarf host
    (3.0, 2.5, 1.9, 9500.0),       # hot A-star host (LDC grid edge)
    (3.0, 0.6, 5.0, 4800.0),       # inflated giant-ish radius
    (1.0, 1.0, 0.15, 5800.0),      # implausible tiny radius vs mass
]


@pytest.mark.parametrize("P,M,R,T", CASES)
def test_ttp_teb_extremes(lc, P, M, R, T):
    time, flux, sigma, _ = lc
    r = api.lnZ_TTP(time, flux, sigma, P, M, R, T, 0.0, N=N, nsamples=NS,
                    key=jax.random.key(1))
    assert not np.isnan(r["lnZ"])
    assert not np.isposinf(r["lnZ"])
    r1, r2 = api.lnZ_TEB(time, flux, sigma, P, M, R, T, 0.0, N=N,
                         nsamples=NS, key=jax.random.key(2))
    for rr in (r1, r2):
        assert not np.isnan(rr["lnZ"])
        assert not np.isposinf(rr["lnZ"])
        for k in ("P_orb", "inc", "b", "ecc", "argp"):
            assert not np.any(np.isnan(rr[k])), k


def test_extreme_sigma_regimes(lc):
    time, flux, sigma, _ = lc
    for s in (1e-6, 5e-2):
        r = api.lnZ_TTP(time, flux, s, 3.0, 1.0, 1.0, 5800.0, 0.0,
                        N=N, nsamples=NS, key=jax.random.key(3))
        assert not np.isnan(r["lnZ"]) and not np.isposinf(r["lnZ"])


def test_flat_priors_and_small_N(lc):
    time, flux, sigma, _ = lc
    r = api.lnZ_TTP(time, flux, sigma, 3.0, 1.0, 1.0, 5800.0, 0.0,
                    N=128, nsamples=1, flatpriors=True,
                    key=jax.random.key(4))
    assert not np.isnan(r["lnZ"])
    assert np.asarray(r["R_p"]).shape == (100,)


def test_plx_nan_and_metal_extremes(lc):
    time, flux, sigma, _ = lc
    r = api.lnZ_PTP(time, flux, sigma, 3.0, 1.0, 1.0, 5800.0, -4.5,
                    plx=np.nan, N=N, nsamples=NS, key=jax.random.key(5))
    assert not np.isnan(r["lnZ"]) and not np.isposinf(r["lnZ"])
