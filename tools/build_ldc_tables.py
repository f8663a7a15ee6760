"""One-time converter: package the Claret limb-darkening grids as .npz.

The quadratic limb-darkening coefficient grids (Claret 2017 for TESS,
Claret & Bloemen 2011 for Kepler — published tables) are repackaged from
the upstream CSV layout into a compact .npz bundled with this framework
(reference data: triceratops/data/ldc_tess.csv, ldc_kepler.csv; loaded at
marginal_likelihoods.py:24-37).

Run from the repo root:
    python tools/build_ldc_tables.py <path-to-reference-data-dir>
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

OUT = Path(__file__).resolve().parent.parent / "triceratops_tpu" / "data" / "ldc_grids.npz"


def main(data_dir: str) -> None:
    data_dir = Path(data_dir)
    out = {}
    for mission, fname, u1col, u2col in [
        ("tess", "ldc_tess.csv", "aLSM", "bLSM"),
        ("kepler", "ldc_kepler.csv", "a", "b"),
    ]:
        df = pd.read_csv(data_dir / fname)
        out[f"{mission}_Z"] = np.asarray(df["Z"], dtype=np.float64)
        out[f"{mission}_Teff"] = np.asarray(df["Teff"], dtype=np.int64)
        out[f"{mission}_logg"] = np.asarray(df["logg"], dtype=np.float64)
        out[f"{mission}_u1"] = np.asarray(df[u1col], dtype=np.float64)
        out[f"{mission}_u2"] = np.asarray(df[u2col], dtype=np.float64)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/triceratops/data")
