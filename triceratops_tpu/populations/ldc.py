"""Limb-darkening coefficient lookups.

The quadratic LDC grids (Claret 2017 TESS / Claret & Bloemen 2011 Kepler)
are bundled as ``data/ldc_grids.npz`` (see tools/build_ldc_tables.py).
Three lookup flavors reproduce the reference's per-scenario semantics:

* ``lookup_target``: two-stage nearest-neighbor over the full row list —
  nearest Z, nearest Teff, nearest logg independently, then the unique row
  matching all three (reference: marginal_likelihoods.py:90-98).
* ``grid_at_Z``: dense (logg in {3.5..5.0 step .5}) x (Teff in {3500..
  teff_max step 250}) table at the nearest-Z slice, used for the per-draw
  clamped-rounding companion lookup in STP/SEB
  (reference: marginal_likelihoods.py:938-972, 1176-1187). Returned as
  arrays for a device gather.
* ``lookup_stars``: vectorized per-star two-stage lookup (nearest Teff,
  nearest logg over full columns, then nearest Z within that slice) used
  for TRILEGAL populations in BTP/BEB/NTP_unknown/NEB_unknown
  (reference: marginal_likelihoods.py:1912-1924 — there a Python loop;
  here one vectorized host pass, SURVEY.md 3.3 hot-loop (3)).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

_DATA = Path(__file__).resolve().parent.parent / "data" / "ldc_grids.npz"

LOGG_GRID = np.array([3.5, 4.0, 4.5, 5.0])
TEFF_MIN, TEFF_STEP = 3500, 250


@lru_cache(maxsize=None)
def _grids(mission: str):
    mission = "tess" if mission.upper() == "TESS" else "kepler"
    z = np.load(_DATA)
    return {
        "Z": z[f"{mission}_Z"],
        "Teff": z[f"{mission}_Teff"],
        "logg": z[f"{mission}_logg"],
        "u1": z[f"{mission}_u1"],
        "u2": z[f"{mission}_u2"],
    }


def lookup_target(Z: float, Teff: float, logg: float, mission: str = "TESS"):
    """Target-star (u1, u2): independent nearest Z/Teff/logg, unique row."""
    g = _grids(mission)
    this_Z = g["Z"][np.argmin(np.abs(g["Z"] - Z))]
    this_Teff = g["Teff"][np.argmin(np.abs(g["Teff"] - Teff))]
    this_logg = g["logg"][np.argmin(np.abs(g["logg"] - logg))]
    mask = (g["Z"] == this_Z) & (g["Teff"] == this_Teff) & (g["logg"] == this_logg)
    idx = np.flatnonzero(mask)
    if idx.size != 1:
        raise ValueError(
            f"LDC lookup for Z={Z}, Teff={Teff}, logg={logg} matched "
            f"{idx.size} rows (expected 1)."
        )
    return float(g["u1"][idx[0]]), float(g["u2"][idx[0]])


def grid_at_Z(Z: float, mission: str = "TESS", teff_max: int = 10000):
    """Dense (u1, u2) tables over (logg, Teff) at the nearest-Z slice.

    Returns (u1_tab, u2_tab) with shape (4, n_teff) where n_teff spans
    TEFF_MIN..teff_max step 250. teff_max is clamped to the table's
    maximum Teff (the reference SEB clamp of 13000 can only ever be
    exercised up to the table max because stellar_relations caps Teff at
    the target's; see marginal_likelihoods.py:1181).
    """
    g = _grids(mission)
    this_Z = g["Z"][np.argmin(np.abs(g["Z"] - Z))]
    sl = g["Z"] == this_Z
    teffs, loggs = g["Teff"][sl], g["logg"][sl]
    u1s, u2s = g["u1"][sl], g["u2"][sl]
    teff_max = int(min(teff_max, teffs.max()))
    teff_vals = np.arange(TEFF_MIN, teff_max + 1, TEFF_STEP)
    u1_tab = np.zeros((len(LOGG_GRID), len(teff_vals)))
    u2_tab = np.zeros_like(u1_tab)
    for i, gg in enumerate(LOGG_GRID):
        for j, tt in enumerate(teff_vals):
            m = (teffs == tt) & (loggs == gg)
            k = np.flatnonzero(m)
            if k.size != 1:
                raise ValueError(
                    f"LDC slice Z={this_Z} missing unique (logg={gg}, "
                    f"Teff={tt}) row ({k.size} matches)."
                )
            u1_tab[i, j] = u1s[k[0]]
            u2_tab[i, j] = u2s[k[0]]
    return u1_tab, u2_tab


def round_index_comp(loggs, teffs, n_teff, xp=np):
    """Index math for grid_at_Z tables (works with numpy or jax.numpy).

    Reproduces the reference rounding + clamping
    (marginal_likelihoods.py:961-966): logg -> round(logg/0.5)*0.5 clamped
    to [3.5, 5.0]; Teff -> round(Teff/250)*250 clamped to
    [3500, 3500+250*(n_teff-1)].
    """
    i_logg = xp.clip(xp.round(loggs / 0.5).astype("int32") - 7, 0, 3)
    i_teff = xp.clip(xp.round(teffs / 250.0).astype("int32") - 14, 0, n_teff - 1)
    return i_logg, i_teff


def lookup_stars(Teffs: np.ndarray, loggs: np.ndarray, Zs: np.ndarray,
                 mission: str = "TESS"):
    """Vectorized per-star lookup: nearest Teff, nearest logg (full columns),
    then nearest Z within that (Teff, logg) slice. Host-side, one pass."""
    g = _grids(mission)
    teff_col, logg_col, z_col = g["Teff"], g["logg"], g["Z"]
    u1_col, u2_col = g["u1"], g["u2"]
    uT = np.unique(teff_col)
    uG = np.unique(logg_col)
    # nearest unique Teff / logg per star (argmin over full column is the
    # same as over unique values for ties broken toward first occurrence:
    # columns are sorted so first occurrence is the smallest value; np.argmin
    # over the full column returns the first minimal row -> same value)
    tsel = uT[np.argmin(np.abs(uT[None, :] - np.asarray(Teffs)[:, None]), axis=1)]
    gsel = uG[np.argmin(np.abs(uG[None, :] - np.asarray(loggs)[:, None]), axis=1)]
    n = len(tsel)
    u1 = np.zeros(n)
    u2 = np.zeros(n)
    # group by (Teff, logg) cell to avoid per-star scans
    cell = tsel * 100 + (gsel * 10).astype(np.int64)
    order = np.argsort(cell, kind="stable")
    cell_sorted = cell[order]
    starts = np.flatnonzero(np.r_[True, cell_sorted[1:] != cell_sorted[:-1]])
    for s, e in zip(starts, np.r_[starts[1:], n]):
        rows = order[s:e]
        tt, gg = tsel[rows[0]], gsel[rows[0]]
        m = (teff_col == tt) & (logg_col == gg)
        zs_slice = z_col[m]
        u1_slice, u2_slice = u1_col[m], u2_col[m]
        zi = np.argmin(np.abs(zs_slice[None, :] - np.asarray(Zs)[rows][:, None]), axis=1)
        # reference then re-masks on (Z==z, Teff, logg) and .item()s — the
        # slice is unique per Z so direct indexing is identical
        u1[rows] = u1_slice[zi]
        u2[rows] = u2_slice[zi]
    return u1, u2
