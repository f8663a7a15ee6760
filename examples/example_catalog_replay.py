"""Catalog replay: batch FPP sweep sharded across a device mesh.

Demonstrates the multi-target data-parallel path (SURVEY.md section 2.4
per-target axis): a batch of targets vetted in one sharded program, with
the published vetting catalog (Giacalone et al. 2021 tab7) as the frame
of reference.

Run (CPU mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/example_catalog_replay.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import jax
import jax.numpy as jnp

from triceratops_tpu.parallel.sharding import make_mesh, batch_fpp_tp_eb
from triceratops_tpu.populations.catalogs import vetting_catalog
from example_offline import make_lightcurve


def main():
    cat = vetting_catalog()
    print(f"published vetting catalog: {len(cat)} TOIs; classifications:")
    print(cat["Classification"].value_counts().to_string())

    # build a batch of synthetic candidates spanning the catalog's
    # radius/period space and run the TP/EB core scenario set sharded
    B = 8
    rows = cat.sample(B, random_state=0)
    n_t = 80
    times, obs, sig, Ps = [], [], [], []
    for _, r in rows.iterrows():
        P = float(np.clip(r["Porb"], 0.8, 20.0))
        rp = float(np.clip(r["Rp"], 1.0, 16.0))
        tt, ff, ss, _ = make_lightcurve(P=P, rp_re=rp, n_t=n_t,
                                        seed=int(r["TOI"] * 100) % 2**31)
        times.append(tt)
        obs.append(ff - 1.0)
        sig.append(ss)
        Ps.append(P)

    mesh = make_mesh(n_target_shards=min(2, len(jax.devices())))
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))  # noqa: E731
    keys = jax.random.split(jax.random.key(0), B)
    fpp, lnZ = batch_fpp_tp_eb(
        mesh, keys, f32(times), f32(obs), f32(sig), f32(Ps),
        f32(np.full(B, 1.0)), f32(np.full(B, 1.0)), f32(np.full(B, 5800.0)),
        f32(np.full(B, 0.4)), f32(np.full(B, 0.2)),
        N=65536, n_t=n_t, ns=4)
    print(f"\nmesh {dict(mesh.shape)}; TP/EB-core FPP per target:")
    for (_, r), f in zip(rows.iterrows(), np.asarray(fpp)):
        print(f"  TOI {r['TOI']:8.2f}  Rp={r['Rp']:5.2f} Re  P={r['Porb']:6.2f} d"
              f"  FPP(TP/EB core)={f:.3g}  paper FPP={r['FPP']}")


if __name__ == "__main__":
    main()
