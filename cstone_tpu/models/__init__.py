"""Demo client applications built on the Domain (the reference's client is
SPH-EXA; these mirror its usage pattern, README.md:60-100)."""

from .sph import SphState, sph_density_step
