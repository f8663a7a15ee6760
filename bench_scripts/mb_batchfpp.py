"""Micro-benchmark: batched full-FPP megaprogram compile/warm timing (TPU)."""
import time as T
import numpy as np, jax
import sys
sys.argv = ['x']
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.catalog_replay import _synth_lc
from triceratops_tpu.parallel.sharding import make_mesh, batch_fpp_full, prepare_target_batch
from triceratops_tpu.populations.catalogs import vetting_catalog
from triceratops_tpu.populations.synthetic import make_synthetic_trilegal

cat = vetting_catalog().sample(8, random_state=0)
trilegal = make_synthetic_trilegal("/tmp/replay_trilegal.csv", Tmag_target=10.0, seed=1)
targets = []
for i, (_, row) in enumerate(cat.iterrows()):
    time, flux, sigma, P, _depth = _synth_lc(row, n_t=100)
    targets.append(dict(time=time, flux=flux, sigma=sigma, P_orb=P,
                        M_s=1.0, R_s=1.0, Teff=5800.0, Z=0.0, plx=10.0,
                        Tmag=10.0, Jmag=9.3, Hmag=9.1, Kmag=9.0,
                        trilegal_fname=trilegal, key=jax.random.key(i)))
batch, _, has_cc = prepare_target_batch(targets)
mesh = make_mesh(1, n_target_shards=1)
t0 = T.time()
fpp, nfpp, lnZ = batch_fpp_full(mesh, batch, N=1000000, n_t=100, ns=20, chunk=4096, has_cc=has_cc)
fpp = np.asarray(fpp)
print(f"first call (compile+run): {T.time()-t0:.1f}s")
for r in range(2):
    batch["key"] = jax.random.split(jax.random.key(100 + r), 8)
    t0 = T.time()
    fpp, nfpp, lnZ = batch_fpp_full(mesh, batch, N=1000000, n_t=100, ns=20, chunk=4096, has_cc=has_cc)
    fpp = np.asarray(fpp)
    print(f"warm call: {T.time()-t0:.2f}s ({(T.time()-t0)/8:.2f}s/target)")
