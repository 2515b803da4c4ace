"""End-of-solve summary (reference src/utils/print_statistics.jl:1-21)."""

from __future__ import annotations

from .environment import IterationInformation


def print_statistics(info: IterationInformation, extra: dict | None = None):
    print(" ** Summary")
    print(f"Status  . . . . . . . . . . . . . {info.status}")
    print(f"Objective . . . . . . . . . . . . {info.objval:.6e}")
    print(f"Residual (||Ax+By||)  . . . . . . {info.mismatch:.6e}")
    print(f"Outer iterations  . . . . . . . . {info.outer}")
    print(f"Cumulative iterations . . . . . . {info.cumul}")
    if info.cumul > 0:
        print(f"Time per iteration (secs) . . . . {info.time_overall / info.cumul:.4f}")
    print(f"Total time (secs) . . . . . . . . {info.time_overall:.2f}")
    if info.max_cviol > 0.0:
        print(f"Max line-limit violation  . . . . {info.max_cviol:.3e}")
    if info.tail_overflow > 0:
        print(f"Two-pass tail overflow (lines)  . {info.tail_overflow} "
              f"(raise Parameters.branch_tail_tiles)")
    for k, v in (extra or {}).items():
        print(f"{k:<34}{v}")
