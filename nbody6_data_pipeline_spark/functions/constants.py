"""Physical constants, constant-folded from public CODATA/IAU values.

The reference derives these at call time via astropy
(reference calc/binary.py:57-66, 99-107); we fold them once into
literals so Catalyst constant-folds the enclosing expressions and no
Python-side dependency is needed at execution time. Values match
astropy.constants (CODATA 2018 / IAU 2015 nominal values).
"""

# Newtonian constant of gravitation [m^3 kg^-1 s^-2] (CODATA 2018)
G_SI = 6.6743e-11

# Nominal solar mass [kg] (IAU 2015 resolution B3, astropy M_sun)
M_SUN_KG = 1.988409870698051e30

# Astronomical unit [m] (IAU 2012 exact definition)
AU_M = 1.495978707e11

# Parsec expressed in AU: 648000/pi (exact from the definition)
PC_AU = 206264.80624709636

# Seconds per day
DAY_S = 86400.0

# Nominal solar effective temperature [K] (IAU 2015 resolution B3)
T_SUN_K = 5772.0

# Solar bolometric magnitude: -2.5*log10(L_sun / L_bol0) with
# L_sun = 3.828e26 W and the IAU 2015 B2 zero point L_bol0 = 3.0128e28 W
# (the reference derives it the same way, calc/star.py:30-35)
M_BOL_SUN = 4.7399959339194595

# Kepler's third law coefficient: a^3 = KEPLER_K * (M/M_sun) * (P/s)^2
# gives a in meters; KEPLER_K = G * M_sun / (4 pi^2)
KEPLER_K = G_SI * M_SUN_KG / (4.0 * 3.141592653589793**2)

# Angular resolution limit used for the unresolved-binary predicate
# (reference observer.py:22): theta[arcsec] = a[AU] / d[pc] <= 0.6
UNRESOLVED_SEP_FACTOR = 0.6

# Wide-binary semi-major-axis threshold [AU] (reference calc/binary.py:95-96)
WIDE_BINARY_AU = 1000.0
