"""MOLUSC companion-posterior ingestion.

External binary-population posterior replacing the analytic
``sample_q_companion`` draw in P*/S* scenarios (reference:
marginal_likelihoods.py:455-464): keep rows with periastron
a(1-e) > 10 AU, floor mass ratios at 0.1/M_s, zero-pad to N (padded
entries are excluded by the qs_comp != 0 masks but still count in the MC
denominator).
"""

from __future__ import annotations

import numpy as np
from pandas import read_csv


def load_molusc_qs(molusc_file: str, M_s: float, N: int) -> np.ndarray:
    df = read_csv(molusc_file)
    a = df["semi-major axis(AU)"].values
    e = df["eccentricity"].values
    q = df[a * (1 - e) > 10]["mass ratio"].values.copy()
    q[q < 0.1 / M_s] = 0.1 / M_s
    return np.pad(q, (0, N - len(q)))
