from . import microfacet, tonemap, sampling, intersect, envmap, disney, traverse, integrator

__all__ = [
    "microfacet",
    "tonemap",
    "sampling",
    "intersect",
    "envmap",
    "disney",
    "traverse",
    "integrator",
]
