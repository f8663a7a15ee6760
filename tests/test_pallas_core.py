"""Pallas fused chi^2 kernel vs the XLA fast path (interpret mode on the
CPU test mesh).

Tolerances: per-draw lnL carries O(0.01-0.1) reordering noise whenever
sigma is small — a ~1e-7 f32 rounding difference in the deficit enters
lnL as ~ D_err * resid / sigma^2 (the same noise scale the fast-vs-exact
gates in test_fastcore.py budget for) — so gates are p99/max absolute
bounds on lnL plus exact finite-mask agreement, not tight elementwise
rtol."""

import numpy as np
import jax.numpy as jnp

from triceratops_tpu.ops.lightcurve import lnL_planet, lnL_eb


def _f32(a):
    return jnp.asarray(np.asarray(a, np.float32))


def _inputs(N=1024, n_t=40, seed=0):
    rng = np.random.default_rng(seed)
    time = np.linspace(-0.15, 0.15, n_t).astype(np.float32)
    obs = rng.normal(0, 5e-4, n_t).astype(np.float32)
    k = 10 ** rng.uniform(-2, -0.7, N)
    P = np.full(N, 3.0)
    aR = np.full(N, 9.6)
    inc = np.arccos(rng.uniform(0, 1, N) * (1 + k) / aR)
    e = rng.uniform(0, 0.5, N)
    w = rng.uniform(-np.pi, np.pi, N)
    u1 = np.full(N, 0.4)
    u2 = np.full(N, 0.2)
    g = rng.uniform(0.2, 1.0, N)
    m = np.ones(N, bool)
    return (jnp.asarray(time), jnp.asarray(obs), np.float32(5e-4),
            *map(_f32, (k, P, aR, inc, e, w, u1, u2, g)), jnp.asarray(m))


class TestPallasPlanet:
    def test_matches_xla_fast(self):
        args = _inputs()
        kw = dict(exptime=0.00139, n_t=40, ns=4, chunk=512)
        xla = np.asarray(lnL_planet(*args, **kw))
        pls = np.asarray(lnL_planet(*args, **kw, backend="pallas",
                                    interpret=True))
        finite = np.isfinite(xla)
        d = np.abs(pls[finite] - xla[finite])
        assert np.quantile(d, 0.99) < 0.05, np.quantile(d, 0.99)
        assert d.max() < 1.0, d.max()
        np.testing.assert_array_equal(np.isfinite(pls), finite)

    def test_matches_ns1(self):
        args = _inputs(N=512)
        kw = dict(exptime=0.00139, n_t=40, ns=1, chunk=256)
        xla = np.asarray(lnL_planet(*args, **kw))
        pls = np.asarray(lnL_planet(*args, **kw, backend="pallas",
                                    interpret=True))
        finite = np.isfinite(xla)
        d = np.abs(pls[finite] - xla[finite])
        assert np.quantile(d, 0.99) < 0.05, np.quantile(d, 0.99)
        assert d.max() < 1.0, d.max()


class TestPallasEB:
    def test_matches_xla_fast(self):
        (t, obs, sig, k, P, aR, inc, e, w, u1, u2, g, m) = _inputs(N=512)
        k_eb = _f32(np.clip(np.asarray(k) * 8.0, 0.05, 0.9))
        ksec = 1.0 / k_eb
        kw = dict(exptime=0.00139, n_t=40, ns=4, chunk=256,
                  apply_veto=False)
        xla = np.asarray(lnL_eb(t, obs, sig, k_eb, ksec, P, aR, inc, e, w,
                                u1, u2, g, g, m, **kw))
        pls = np.asarray(lnL_eb(t, obs, sig, k_eb, ksec, P, aR, inc, e, w,
                                u1, u2, g, g, m, **kw, backend="pallas",
                                interpret=True))
        finite = np.isfinite(xla)
        rel = np.abs(pls[finite] - xla[finite]) / (np.abs(xla[finite]) + 1.0)
        assert np.quantile(rel, 0.99) < 1e-3, np.quantile(rel, 0.99)
        assert rel.max() < 2e-2, rel.max()


class TestPallasEvidenceLevel:
    def test_lnZ_agreement(self):
        """Per-draw reordering noise must wash out at the evidence level:
        log-mean-exp of the two paths' lnL agrees to ~1e-3 nats."""
        from triceratops_tpu.core.numerics import log_mean_exp_jax

        args = _inputs(N=4096, seed=5)
        kw = dict(exptime=0.00139, n_t=40, ns=4, chunk=512)
        xla = lnL_planet(*args, **kw)
        pls = lnL_planet(*args, **kw, backend="pallas", interpret=True)
        a = float(log_mean_exp_jax(xla, 4096))
        b = float(log_mean_exp_jax(pls, 4096))
        assert abs(a - b) < 1e-2, (a, b)
