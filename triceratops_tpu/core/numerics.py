"""Numerically stable reductions used by the scenario-evidence engine.

Semantics match the reference implementation exactly
(reference: triceratops/_numerics.py:12-76):

* ``log_mean_exp(logw, N_total)``: log(mean(exp(logw))) where -inf/NaN
  entries contribute zero weight but still count in the denominator and
  +inf propagates; raises if ``N_total != len(logw)``.
* ``normalize_probabilities(lnZ)``: softmax over finite evidences with
  degenerate-status reporting ('ok' | 'all_neginf' | 'anomaly').

Both a NumPy (host) and a JAX (device) implementation are provided. The
device version is the reduction kernel of the framework: it runs inside
the jitted per-scenario program so the 1e6-draw weight vector never
leaves the chip.
"""

from __future__ import annotations

import numpy as np
from scipy.special import logsumexp as _logsumexp

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host (NumPy) implementations — exact reference semantics.
# ---------------------------------------------------------------------------

def log_mean_exp(logw: np.ndarray, *, N_total: int) -> float:
    """Numerically stable log(mean(exp(logw))) (host path).

    -inf and NaN entries contribute zero weight but count in the
    denominator; +inf propagates. Raises ValueError when N_total does
    not equal len(logw) (reference: triceratops/_numerics.py:40-45).
    """
    logw = np.asarray(logw)
    if N_total != logw.size:
        raise ValueError(
            f"N_total ({N_total}) must equal len(logw) ({logw.size}). "
            "Passing len(lnL[finite]) instead of len(lnL) would silently "
            "overestimate evidence for scenarios with geometric exclusions."
        )
    if np.any(np.isposinf(logw)):
        return np.inf
    finite = np.isfinite(logw)
    if not np.any(finite):
        return -np.inf
    return float(_logsumexp(logw[finite]) - np.log(N_total))


def normalize_probabilities(lnZ: np.ndarray):
    """Normalize scenario log-evidences to a probability vector (host).

    Returns (probs, status); see module docstring.
    (reference: triceratops/_numerics.py:54-76)
    """
    lnZ = np.asarray(lnZ)
    if np.any(np.isnan(lnZ)) or np.any(np.isposinf(lnZ)):
        return np.zeros(len(lnZ)), "anomaly"
    if np.all(np.isneginf(lnZ)):
        return np.zeros(len(lnZ)), "all_neginf"
    return np.exp(lnZ - _logsumexp(lnZ)), "ok"


# ---------------------------------------------------------------------------
# Device (JAX) implementations — jit/vmap-safe, static shapes.
# ---------------------------------------------------------------------------

def log_mean_exp_jax(logw: jnp.ndarray, N_total: int | jnp.ndarray) -> jnp.ndarray:
    """On-device log(mean(exp(logw))) with the reference -inf/NaN/+inf rules.

    Unlike the host version this cannot raise, so the N_total==len check
    lives in the calling code. Works under jit/vmap; returns a scalar.

    The reduction is a masked max-shifted logsumexp: NaNs and -inf get
    zero weight, N_total stays in the denominator, and a +inf anywhere
    forces +inf out.
    """
    logw = jnp.asarray(logw)
    finite = jnp.isfinite(logw)
    any_posinf = jnp.any(jnp.isposinf(logw))
    any_finite = jnp.any(finite)

    safe = jnp.where(finite, logw, -jnp.inf)
    m = jnp.max(safe)
    # guard m == -inf (no finite entries) to avoid nan from (-inf) - (-inf)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    sumexp = jnp.sum(jnp.where(finite, jnp.exp(safe - m_safe), 0.0))
    lse = m_safe + jnp.log(sumexp)
    out = lse - jnp.log(jnp.asarray(N_total, dtype=logw.dtype))
    out = jnp.where(any_finite, out, -jnp.inf)
    out = jnp.where(any_posinf, jnp.inf, out)
    return out


def logsumexp_jax(logw: jnp.ndarray) -> jnp.ndarray:
    """Masked logsumexp over finite entries (device). -inf if none finite."""
    logw = jnp.asarray(logw)
    finite = jnp.isfinite(logw)
    safe = jnp.where(finite, logw, -jnp.inf)
    m = jnp.max(safe)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    sumexp = jnp.sum(jnp.where(finite, jnp.exp(safe - m_safe), 0.0))
    out = m_safe + jnp.log(sumexp)
    return jnp.where(jnp.any(finite), out, -jnp.inf)
