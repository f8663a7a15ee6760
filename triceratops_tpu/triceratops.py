"""Compatibility module: ``import triceratops_tpu.triceratops as tr``.

Mirrors the reference's user entry point (users import
``triceratops.triceratops`` and use ``tr.target``; reference
examples/example.ipynb first cell). Re-exports the ``target`` class and
the full scenario/likelihood API surface like the reference module's
``from .marginal_likelihoods import *`` (reference triceratops.py:30).
"""

from .frontend.target import target  # noqa: F401
from .scenarios.api import *  # noqa: F401,F403
from .likelihoods import (  # noqa: F401
    simulate_TP_transit, simulate_EB_transit,
    simulate_TP_transit_p, simulate_EB_transit_p,
    lnL_TP, lnL_EB, lnL_EB_twin, lnL_TP_p, lnL_EB_p, lnL_EB_twin_p,
)
from .core.numerics import (  # noqa: F401
    log_mean_exp as _log_mean_exp,
    normalize_probabilities as _normalize_probabilities,
)
