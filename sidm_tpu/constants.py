"""Physical constants in cgs, matching the reference's internal-unit conventions.

Reference: nbody/allvars.h:51-85 defines the cgs constants GADGET-1.1 uses to
derive internal units. We reproduce the same numerical values so that internal
unit systems (and therefore trajectories) are bit-comparable.
"""

GRAVITY_CGS = 6.672e-8           # cm^3 g^-1 s^-2   (allvars.h:59)
BOLTZMANN_CGS = 1.3806e-16       # erg/K            (allvars.h:64)
PROTONMASS_CGS = 1.6726e-24      # g                (allvars.h:69)
HUBBLE_CGS = 3.2407789e-18       # h/sec            (allvars.h:71)
SEC_PER_MEGAYEAR = 3.155e13      # s                (allvars.h:73)
SOLAR_MASS_CGS = 1.989e33        # g

GAMMA = 5.0 / 3.0                # adiabatic index  (allvars.h:76)
GAMMA_MINUS1 = GAMMA - 1.0
HYDROGEN_MASSFRAC = 0.76

MAX_REAL_NUMBER = 1e37           # sentinel "infinity" (allvars.h:51)

# Individual-timestep growth limiter (allvars.h:85).
TIMESTEP_INCREASE_FACTOR = 1.3

# SIDM constants (allvars.h:42-95): the DSMC upper-bound probability uses the
# inverse unit-ball volume times the neighbour-count ceiling.
BALL_INVERSE = 3.0 / 4.0 / 3.141592653589793   # 3/(4 pi)  (allvars.h:95)
SAFE_FACTOR = 1.0                              # (allvars.h:43)
SCAT_KERNEL_FACTOR = 1.0                       # (allvars.h:42)

# Gravitational spline softening: the cubic-spline kernel support is h=2.8*eps
# so the force matches Newtonian exactly at r>=h (forcetree.c:834).
SOFTENING_SPLINE_FACTOR = 2.8

# Particle type indices (Gadget convention).
TYPE_GAS = 0
TYPE_HALO = 1
TYPE_DISK = 2
TYPE_BULGE = 3
TYPE_STARS = 4
N_TYPES = 6
