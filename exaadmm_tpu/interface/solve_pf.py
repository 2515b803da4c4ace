"""Standalone Newton-Raphson power-flow interface (reference solve_pf.jl)."""

from ..models.pf.newton import solve_pf  # noqa: F401  (public re-export)
