"""Per-component TPU timing: samplers vs likelihood cores.

Times each scenario sampler and each likelihood core at the benchmark
shape (N = 1e6 draws, 100-pt light curve, GL-4 exposure nodes) by
forcing a scalar reduction per run (np.asarray of a large output would
measure the ~25 MB/s tunnel, not the chip; a jnp.sum keeps the
transfer at 4 bytes). Keys differ per repeat so the runtime cannot
dedupe bitwise-identical dispatches (CLAUDE.md gotchas).

Usage:  python bench_scripts/profile_components.py
"""

import os
import sys
import time as _time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from triceratops_tpu.scenarios import engine as eng
from triceratops_tpu.ops.lightcurve import lnL_planet, lnL_eb
from triceratops_tpu.populations.synthetic import make_synthetic_trilegal
from triceratops_tpu.scenarios.api import _prep_background, _lc

N = 1_000_000
REPS = 5
F32 = np.float32


def timeit(name, fn):
    # warm (compile)
    float(np.asarray(fn(0)))
    ts = []
    for r in range(1, REPS + 1):
        t0 = _time.time()
        out = float(np.asarray(fn(r)))
        ts.append(_time.time() - t0)
    print(f"{name:28s} {min(ts)*1e3:8.1f} ms  (min of {REPS}; "
          f"median {np.median(ts)*1e3:.1f})")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    n_t, ns = 100, 20
    time_arr = np.linspace(-0.15, 0.15, n_t)
    flux = 1.0 + rng.normal(0, 5e-4, n_t)
    t_dev, obs_dev, n_t, chunk = _lc(time_arr, flux, 0.00139, ns)
    sigma = F32(5e-4)
    P_lo = P_hi = F32(3.0)
    M_s = R_s = F32(1.0)
    Teff = F32(5800.0)
    plx = F32(10.0)
    seps = jnp.asarray(np.array([2.2], F32))
    cons = jnp.asarray(np.array([1.0], F32))
    qs0 = jnp.zeros((N,), jnp.float32)
    tri = make_synthetic_trilegal("/tmp/profile_trilegal.csv",
                                  Tmag_target=10.0, seed=1)
    bg, n_comp = _prep_background(tri, 10.0, 9.3, 9.1, 9.0, "TESS", "TESS",
                                  need_ldc=True, need_cc_ratio=True)
    from triceratops_tpu.populations.ldc import grid_at_Z
    u1t10, u2t10 = (jnp.asarray(a.astype(F32))
                    for a in grid_at_Z(0.0, "TESS", 10000))
    u1t13, u2t13 = (jnp.asarray(a.astype(F32))
                    for a in grid_at_Z(0.0, "TESS", 13000))

    def key(r, salt):
        return jax.random.fold_in(jax.random.key(salt), r)

    def red(d):
        tot = 0.0
        for v in d.values():
            if isinstance(v, dict):  # nested twin-branch draw sets
                tot = tot + red(v)
                continue
            if v.dtype == jnp.bool_:
                v = v.astype(jnp.float32)
            tot = tot + jnp.sum(v.astype(jnp.float32))
        return tot

    samplers = {
        "sample_planet_target": lambda r: red(eng.sample_planet_target(
            key(r, 0), P_lo, P_hi, M_s, R_s, N=N, flatpriors=False)),
        "sample_teb": lambda r: red(eng.sample_teb(
            key(r, 1), P_lo, P_hi, M_s, R_s, Teff, N=N)),
        "sample_ptp": lambda r: red(eng.sample_ptp(
            key(r, 2), P_lo, P_hi, M_s, R_s, Teff, plx, qs0, seps, cons,
            N=N, flatpriors=False, use_molusc=False, cc_filt=None)),
        "sample_peb": lambda r: red(eng.sample_peb(
            key(r, 3), P_lo, P_hi, M_s, R_s, Teff, plx, qs0, seps, cons,
            N=N, use_molusc=False, cc_filt=None)),
        "sample_stp": lambda r: red(eng.sample_stp(
            key(r, 4), P_lo, P_hi, M_s, R_s, Teff, plx, qs0, u1t10, u2t10,
            seps, cons, N=N, flatpriors=False, use_molusc=False,
            cc_filt=None)),
        "sample_seb": lambda r: red(eng.sample_seb(
            key(r, 5), P_lo, P_hi, M_s, R_s, Teff, plx, qs0, u1t13, u2t13,
            seps, cons, N=N, use_molusc=False, cc_filt=None)),
        "sample_bg_planet (DTP)": lambda r: red(eng.sample_background_planet(
            key(r, 6), P_lo, P_hi, M_s, R_s, bg, seps, cons, N=N,
            flatpriors=False, has_cc=False, host_is_bg=False)),
        "sample_bg_planet (BTP)": lambda r: red(eng.sample_background_planet(
            key(r, 7), P_lo, P_hi, M_s, R_s, bg, seps, cons, N=N,
            flatpriors=False, has_cc=False, host_is_bg=True)),
        "sample_bg_eb (DEB)": lambda r: red(eng.sample_background_eb(
            key(r, 8), P_lo, P_hi, M_s, R_s, Teff, bg, seps, cons, N=N,
            has_cc=False, host_is_bg=False)),
        "sample_bg_eb (BEB)": lambda r: red(eng.sample_background_eb(
            key(r, 9), P_lo, P_hi, M_s, R_s, Teff, bg, seps, cons, N=N,
            has_cc=False, host_is_bg=True)),
    }
    total_samplers = 0.0
    for name, fn in samplers.items():
        total_samplers += timeit(name, fn)
    print(f"{'-- samplers total':28s} {total_samplers*1e3:8.1f} ms")

    d0 = eng.sample_planet_target(jax.random.key(100), P_lo, P_hi, M_s,
                                  R_s, N=N, flatpriors=False)
    e0 = eng.sample_teb(jax.random.key(101), P_lo, P_hi, M_s, R_s, Teff,
                        N=N)
    u1a = jnp.full((N,), F32(0.4))
    u2a = jnp.full((N,), F32(0.2))
    ones = jnp.ones((N,), jnp.float32)
    kw = dict(exptime=0.00139, n_t=n_t, ns=ns, chunk=chunk)

    def planet_core(r):
        k2 = d0["k"] + F32(r) * F32(1e-9)
        return jnp.sum(lnL_planet(
            t_dev, obs_dev, sigma, k2, d0["P"], d0["a_R"], d0["inc_rad"],
            d0["eccs"], d0["w_rad"], u1a, u2a, ones, d0["mask"],
            **kw).astype(jnp.float32).clip(-1e30, 1e30))

    def eb_core(r):
        k2 = e0["k"] + F32(r) * F32(1e-9)
        return jnp.sum(lnL_eb(
            t_dev, obs_dev, sigma, k2, e0["ksec"], e0["P"], e0["a_R"],
            e0["inc_rad"], e0["eccs"], e0["w_rad"], u1a, u2a, e0["g_pri"],
            e0["g_sec"], e0["mask"], **kw,
            apply_veto=True).astype(jnp.float32).clip(-1e30, 1e30))

    t_planet = timeit("lnL_planet core (1e6)", planet_core)
    t_eb = timeit("lnL_eb core (1e6)", eb_core)
    print(f"{'-- 10 planet + 5 eb cores':28s} "
          f"{(10*t_planet + 5*t_eb)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
