"""Client-side dataset helpers: named particle fields with
conserved/dependent lifetime states."""

from .fields import FieldStates, ParticleFields, get_fields
