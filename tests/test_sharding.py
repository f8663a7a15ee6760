"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from triceratops_tpu.parallel.sharding import make_mesh, batch_fpp_tp_eb


def _batch_inputs(B, n_t=24, ns=2, seed=0):
    rng = np.random.default_rng(seed)
    time = np.linspace(-0.15, 0.15, n_t)
    t_ss = jnp.asarray(np.tile(time.astype(np.float32), (B, 1)))
    obs_dev = jnp.asarray(rng.normal(0, 5e-4, (B, n_t)).astype(np.float32))
    keys = jax.random.split(jax.random.key(0), B)
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))  # noqa: E731
    scal = dict(
        sigmas=f32(np.full(B, 5e-4)), P_orbs=f32(np.full(B, 3.0)),
        M_ss=f32(np.full(B, 1.0)), R_ss=f32(np.full(B, 1.0)),
        Teffs=f32(np.full(B, 5800.0)), u1s=f32(np.full(B, 0.4)),
        u2s=f32(np.full(B, 0.2)))
    return keys, t_ss, obs_dev, scal, n_t, ns


class TestDryrun:
    def test_graft_entry(self):
        from __graft_entry__ import entry, dryrun_multichip
        fn, args = entry()
        out = np.asarray(fn(*args))
        assert out.shape == (8192,)
        assert np.all(np.isfinite(out) | (out == -np.inf))
        dryrun_multichip(8)


class TestShardingInvariance:
    def test_mesh_shapes(self):
        mesh = make_mesh(8, n_target_shards=2)
        assert dict(mesh.shape) == {"targets": 2, "draws": 4}

    def test_draw_sharding_consistent_estimate(self):
        """The same workload on 1x8 and 2x4 meshes must give FPPs that
        agree to MC noise (the draws differ by key folding, not the
        estimator)."""
        B = 4
        keys, t_ss, obs_dev, scal, n_t, ns = _batch_inputs(B)
        N = 8 * 4096
        out = {}
        for nts in (1, 2):
            mesh = make_mesh(8, n_target_shards=nts)
            fpp, lnZ = batch_fpp_tp_eb(mesh, keys, t_ss, obs_dev,
                                       scal["sigmas"], scal["P_orbs"],
                                       scal["M_ss"], scal["R_ss"],
                                       scal["Teffs"], scal["u1s"],
                                       scal["u2s"], N=N, n_t=n_t, ns=ns,
                                       chunk=512)
            out[nts] = (np.asarray(fpp), np.asarray(lnZ))
            assert np.all(np.isfinite(out[nts][1]))
        # different draw partitions -> statistically compatible evidences
        d = np.abs(out[1][1] - out[2][1])
        assert np.all(d < 1.5), f"lnZ mismatch across meshes: {d}"
