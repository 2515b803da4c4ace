"""exaadmm_tpu — TPU-native two-level ADMM solver for component-decomposed ACOPF.

A from-scratch JAX/XLA re-design with the capabilities of exanauts/ExaAdmm.jl
(reference mounted at /root/reference): batched per-component proximal updates,
a batched trust-region-Newton (TRON-style) augmented-Lagrangian branch solver,
fully jitted inner ADMM loops, and jax.sharding-based multi-chip scaling.
"""

from .interface.solve_acopf import solve_acopf
from .utils.environment import Parameters, Solution, Blocks
from .utils.opfdata import opf_loaddata

__version__ = "0.1.0"

__all__ = [
    "solve_acopf",
    "opf_loaddata",
    "Parameters",
    "Solution",
    "Blocks",
]
