"""Physical constants in CGS units.

Values follow the IAU 2015 nominal values / CODATA 2018, matching the
constants the reference framework obtains from ``astropy.constants``
(reference: triceratops/likelihoods.py:17-22). Hardcoded here so the
framework has no astropy dependency on the compute path.
"""

import numpy as np

# astropy.constants.M_sun.cgs.value  (IAU 2015 nominal solar mass parameter / G)
MSUN = 1.988409870698051e33  # g
# astropy.constants.R_sun.cgs.value  (IAU 2015 nominal solar radius)
RSUN = 6.957e10  # cm
# astropy.constants.R_earth.cgs.value (IAU 2015 nominal terrestrial equatorial radius)
REARTH = 6.3781e8  # cm
# astropy.constants.G.cgs.value (CODATA 2018)
G = 6.6743e-8  # cm^3 g^-1 s^-2
# astropy.constants.au.cgs.value (IAU 2012)
AU = 1.49597870700e13  # cm

PI = np.pi
LN2PI = np.log(2 * np.pi)

DAY_S = 86400.0  # seconds per day
