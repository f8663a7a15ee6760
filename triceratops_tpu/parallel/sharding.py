"""Multi-chip execution: target-batch data parallelism x draw sharding.

The workload's parallel axes (SURVEY.md section 2.4) map onto a 2-D
``jax.sharding.Mesh``:

* ``targets`` axis — catalog replay is embarrassingly parallel across
  TOIs (pure data parallel; per-target reductions are chip-local).
* ``draws`` axis — a single target's Monte-Carlo draw axis is sharded so
  one FPP can use many chips; the only cross-chip communication is the
  evidence reduction, a pmax/psum logsumexp tree over ICI.

``batch_fpp_tp_eb`` runs the core scenario set (TP, EB, EBx2P — the
minimum end-to-end slice of SURVEY.md section 7) for a batch of targets
under ``shard_map``; draws are i.i.d. per (target, draw-shard) via folded
keys, so sharding changes the random stream but not the estimator.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.numerics import logsumexp_jax
from ..ops.lightcurve import lnL_planet, lnL_eb
from ..scenarios import engine as eng


def make_mesh(n_devices: int | None = None, n_target_shards: int = 1):
    """A ('targets', 'draws') mesh over the available devices."""
    devs = np.array(jax.devices()[: n_devices or len(jax.devices())])
    nt = n_target_shards
    nd = len(devs) // nt
    return Mesh(devs[: nt * nd].reshape(nt, nd), ("targets", "draws"))


def _local_lnZ_parts(lnL):
    """(local max, local scaled sumexp) for a distributed logsumexp."""
    finite = jnp.isfinite(lnL)
    safe = jnp.where(finite, lnL, -jnp.inf)
    m = jnp.max(safe)
    m_safe = jnp.where(jnp.isfinite(m), m, -1e30)
    s = jnp.sum(jnp.where(finite, jnp.exp(safe - m_safe), 0.0))
    return m_safe, s


def _combine_lnZ(m, s, N_total, axis_name):
    """Cross-chip logsumexp - log(N_total) over the draws axis."""
    M = jax.lax.pmax(m, axis_name)
    S = jax.lax.psum(s * jnp.exp(m - M), axis_name)
    lnZ = M + jnp.log(S) - jnp.log(float(N_total))
    return jnp.where(S > 0.0, lnZ, -jnp.inf)


def batch_fpp_tp_eb(mesh: Mesh, keys, times, obs_dev, sigmas, P_orbs,
                    M_ss, R_ss, Teffs, u1s, u2s, *, N: int, n_t: int,
                    ns: int, chunk: int = 1024, exptime: float = 0.00139):
    """FPP over the (TP, EB, EBx2P) scenario set for a batch of targets.

    Batch axis is sharded over 'targets'; each target's N draws are split
    over 'draws' (each shard draws N / n_d i.i.d. samples from a folded
    key). Returns (FPP, lnZ[3]) per target.

    Args are per-target arrays: keys (B,), times (B, n_t) exposure
    centers, obs_dev (B, n_t) flux - 1, scalars (B,).
    """
    n_d = mesh.shape["draws"]
    if N % n_d:
        raise ValueError(f"N={N} must divide the draws axis ({n_d})")
    N_local = N // n_d

    def per_target(key, time_i, obs_i, sigma, P_orb, M_s, R_s, Teff, u1, u2):
        d_idx = jax.lax.axis_index("draws")
        key = jax.random.fold_in(key, d_idx)
        k_tp, k_eb = jax.random.split(key)
        u1a = jnp.full((N_local,), u1, jnp.float32)
        u2a = jnp.full((N_local,), u2, jnp.float32)

        d = eng.sample_planet_target(k_tp, P_orb, P_orb, M_s, R_s,
                                     N=N_local, flatpriors=False)
        lnL_tp = lnL_planet(time_i, obs_i, sigma, d["k"], d["P"], d["a_R"],
                            d["inc_rad"], d["eccs"], d["w_rad"], u1a, u2a,
                            jnp.ones((N_local,), jnp.float32), d["mask"],
                            exptime=exptime, n_t=n_t, ns=ns, chunk=chunk)
        e = eng.sample_teb(k_eb, P_orb, P_orb, M_s, R_s, Teff, N=N_local)
        lnL_eb_ = lnL_eb(time_i, obs_i, sigma, e["k"], e["ksec"], e["P"],
                         e["a_R"], e["inc_rad"], e["eccs"], e["w_rad"],
                         u1a, u2a, e["g_pri"], e["g_sec"], e["mask"],
                         exptime=exptime, n_t=n_t, ns=ns, chunk=chunk,
                         apply_veto=True)
        lnL_twin = lnL_eb(time_i, obs_i, sigma, e["k"], e["ksec"],
                          2.0 * e["P"], e["a_R_twin"], e["inc_rad_twin"],
                          e["eccs"], e["w_rad"], u1a, u2a, e["g_pri"],
                          e["g_sec"], e["mask_twin"],
                          exptime=exptime, n_t=n_t, ns=ns, chunk=chunk,
                          apply_veto=False)
        lnZs = []
        for lnL, lnw in ((lnL_tp, d["lnw"]), (lnL_eb_, e["lnw"]),
                         (lnL_twin, e["lnw_twin"])):
            m, s = _local_lnZ_parts(lnL + lnw)
            lnZs.append(_combine_lnZ(m, s, N, "draws"))
        lnZ = jnp.stack(lnZs)
        probs = jnp.exp(lnZ - logsumexp_jax(lnZ))
        fpp = 1.0 - probs[0]
        return fpp, lnZ

    @partial(shard_map, mesh=mesh,
             in_specs=(P("targets"),) * 10,
             out_specs=(P("targets"), P("targets")),
             check_rep=False)
    def step(keys, times, obs_dev, sigmas, P_orbs, M_ss, R_ss, Teffs,
             u1s, u2s):
        return jax.vmap(per_target)(keys, times, obs_dev, sigmas, P_orbs,
                                    M_ss, R_ss, Teffs, u1s, u2s)

    return jax.jit(step)(keys, times, obs_dev, sigmas, P_orbs, M_ss, R_ss,
                         Teffs, u1s, u2s)
