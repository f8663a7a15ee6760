"""Bound-companion and background occurrence priors (device-side JAX).

Moe & Di Stefano (2017) companion-rate integrals over log-period,
truncated by the contrast-curve-limited maximum separation, exactly as the
reference computes them — including the deliberately zeroed low-period
segments (TP variant assumes companion P > 2500 d so log10P < 3.4 terms
are dropped; EB variant assumes tertiary P > 10 d so only the t1 term is
dropped). (reference: triceratops/priors.py:580-782 lnprior_bound_TP,
:784-984 lnprior_bound_EB, :986-1005 lnprior_background.)

All functions are pure jnp and run per-draw inside the jitted scenario
program. The dead-in-evidence-path API functions (lnprior_Mstar_*,
lnprior_Porb_*) are provided host-side in ``dead_priors`` for API parity
(reference: priors.py:386-577; the Mstar pair hard-returns 0.0, the Porb
pair has no call sites).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import G, MSUN, AU, PI


def separation_at_contrast(delta_mags, separations, contrasts):
    """Limiting separation [arcsec] at given contrast via linear interp
    (reference: funcs.py:222-238; np.interp semantics)."""
    return jnp.interp(delta_mags, jnp.asarray(contrasts), jnp.asarray(separations))


def _f123(logM):
    f1 = 0.020 + 0.04 * logM + 0.07 * logM**2
    f2 = 0.039 + 0.07 * logM + 0.01 * logM**2
    f3 = 0.078 - 0.05 * logM + 0.04 * logM**2
    return f1, f2, f3


def _fcomp_terms(max_Porbs, f1, f2, f3):
    """Per-draw Moe-Di Stefano piecewise terms; returns (lp, t-terms)."""
    alpha, dlogP = 0.018, 0.7
    lp = jnp.log10(max_Porbs)
    t2_partial = 0.5 * (lp - 1.0) * (2.0 * f1 + (f2 - f1 - alpha * dlogP) * (lp - 1.0))
    t2 = 0.5 * (2.0 - 1.0) * (2.0 * f1 + (f2 - f1 - alpha * dlogP) * (2.0 - 1.0))
    t3_partial = 0.5 * alpha * (lp**2 - 5.4 * lp + 6.8) + f2 * (lp - 2.0)
    t3 = 0.5 * alpha * (3.4**2 - 5.4 * 3.4 + 6.8) + f2 * (3.4 - 2.0)
    t4_partial = (alpha * dlogP * (lp - 3.4) + f2 * (lp - 3.4)
                  + (f3 - f2 - alpha * dlogP)
                  * (0.238095 * lp**2 - 0.952381 * lp + 0.485714))
    t4 = (alpha * dlogP * (5.5 - 3.4) + f2 * (5.5 - 3.4)
          + (f3 - f2 - alpha * dlogP)
          * (0.238095 * 5.5**2 - 0.952381 * 5.5 + 0.485714))
    t5_partial = f3 * (3.33333 - 17.3566 * jnp.exp(-0.3 * lp))
    t5 = f3 * (3.33333 - 17.3566 * np.exp(-0.3 * 8.0))
    return lp, t2_partial, t2, t3_partial, t3, t4_partial, t4, t5_partial, t5


def _max_porbs(M_eval, plx, delta_mags, separations, contrasts):
    plx = jnp.where(jnp.isnan(plx), 0.1, plx)
    d = 1000.0 / plx
    seps = d * separation_at_contrast(delta_mags, separations, contrasts)
    return ((4 * PI**2) / (G * M_eval * MSUN) * (seps * AU) ** 3) ** 0.5 / 86400.0


def lnprior_bound_TP(M_s, plx, delta_mags, separations, contrasts):
    """Bound-companion log-prior, planet variant (companion P > 2500 d):
    segments with log10(Pmax) < 3.4 are zeroed and the 3.4-5.5 segment
    enters without the t2+t3 offset (reference priors.py:659-689)."""
    M_eval = jnp.where(M_s >= 1.0, M_s, 1.0)
    logM = jnp.log10(M_eval)
    f1, f2, f3 = _f123(logM)
    max_Porbs = _max_porbs(M_eval, plx, delta_mags, separations, contrasts)
    (lp, _t2p, _t2, _t3p, _t3, t4_partial, t4, t5_partial, t5) = _fcomp_terms(
        max_Porbs, f1, f2, f3)
    f_comp = jnp.where(lp < 3.4, 0.0,
                       jnp.where(lp < 5.5, t4_partial,
                                 jnp.where(lp < 8.0, t4 + t5_partial, t4 + t5)))
    f_small = 0.65 * f_comp + 0.35 * f_comp * M_s
    f_small = jnp.maximum(f_small, 0.0)
    out = jnp.where(M_s >= 1.0, f_comp, f_small)
    return jnp.log(out)


def lnprior_bound_EB(M_s, plx, delta_mags, separations, contrasts):
    """Bound-companion log-prior, EB variant (tertiary P > 10 d): only the
    t1 term is dropped (reference priors.py:861-891)."""
    M_eval = jnp.where(M_s >= 1.0, M_s, 1.0)
    logM = jnp.log10(M_eval)
    f1, f2, f3 = _f123(logM)
    max_Porbs = _max_porbs(M_eval, plx, delta_mags, separations, contrasts)
    (lp, t2_partial, t2, t3_partial, t3, t4_partial, t4, t5_partial, t5) = (
        _fcomp_terms(max_Porbs, f1, f2, f3))
    f_comp = jnp.where(
        lp < 1.0, 0.0,
        jnp.where(lp < 2.0, t2_partial,
                  jnp.where(lp < 3.4, t2 + t3_partial,
                            jnp.where(lp < 5.5, t2 + t3 + t4_partial,
                                      jnp.where(lp < 8.0, t2 + t3 + t4 + t5_partial,
                                                t2 + t3 + t4 + t5)))))
    f_small = 0.65 * f_comp + 0.35 * f_comp * M_s
    f_small = jnp.maximum(f_small, 0.0)
    out = jnp.where(M_s >= 1.0, f_comp, f_small)
    return jnp.log(out)


def lnprior_background(N_comp, delta_mags, separations, contrasts):
    """Background-star log-prior: density of the 0.1 deg^2 TRILEGAL field
    inside the contrast-limited circle (reference priors.py:986-1005)."""
    seps = separation_at_contrast(delta_mags, separations, contrasts)
    return jnp.log((N_comp / 0.1) * (1.0 / 3600.0) ** 2 * seps**2)


def clamp_companion_prior(lnprior, delta_mags):
    """Apply the shared clamps: positive log-priors -> 0; companions
    brighter than the host (delta_mag > 0) -> -inf
    (reference: marginal_likelihoods.py:488-489 and analogues)."""
    lnprior = jnp.minimum(lnprior, 0.0)
    return jnp.where(delta_mags > 0.0, -jnp.inf, lnprior)


# ---------------------------------------------------------------------------
# Dead-in-evidence-path priors, exported for API parity (host, NumPy).
# ---------------------------------------------------------------------------

def lnprior_Mstar_planet(M_s):
    """Returns 0.0 — deliberately omitted from the evidence path due to
    bias (reference priors.py:386-405)."""
    return 0.0


def lnprior_Mstar_binary(M_s):
    """Returns 0.0 — deliberately omitted (reference priors.py:408-479)."""
    return 0.0


def _piecewise_P_prior(P_orb, P_break, P_min, P_max, p1, p2):
    A = P_break**p1 / P_break**p2
    I1 = (P_break ** (p1 + 1) - P_min ** (p1 + 1)) / (p1 + 1)
    I2 = A * (P_max ** (p2 + 1) - P_break ** (p2 + 1)) / (p2 + 1)
    Norm = 1.0 / (I1 + I2)
    P_orb = min(max(P_orb, P_min + 0.1), P_max - 0.1)
    if P_orb <= P_break - 0.1:
        prob = Norm * ((P_orb + 0.1) ** (p1 + 1) - (P_orb - 0.1) ** (p1 + 1)) / (p1 + 1)
    elif P_orb >= P_break + 0.1:
        prob = Norm * A * ((P_orb + 0.1) ** (p2 + 1) - (P_orb - 0.1) ** (p2 + 1)) / (p2 + 1)
    else:
        i1 = (P_break ** (p1 + 1) - (P_orb - 0.1) ** (p1 + 1)) / (p1 + 1)
        i2 = A * ((P_orb + 0.1) ** (p2 + 1) - P_break ** (p2 + 1)) / (p2 + 1)
        prob = Norm * (i1 + i2)
    return np.log(prob)


def lnprior_Porb_planet(P_orb, flatpriors=False):
    """Planet period prior (no call sites in the evidence path; exported
    for API parity — reference priors.py:482-536)."""
    if flatpriors:
        P_min, P_max = 0.1, 50.0
        Norm = 1.0 / (P_max - P_min)
        P_orb = min(max(P_orb, P_min + 0.1), P_max - 0.1)
        return np.log(Norm * ((P_orb + 0.1) - (P_orb - 0.1)))
    return _piecewise_P_prior(P_orb, 10.0, 0.1, 50.0, 1.5, 0.0)


def lnprior_Porb_binary(P_orb):
    """Binary period prior (API parity — reference priors.py:539-577)."""
    return _piecewise_P_prior(P_orb, 0.3, 0.1, 50.0, 5.0, 0.5)
