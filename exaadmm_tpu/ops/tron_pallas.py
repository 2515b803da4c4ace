"""Fused Pallas TPU execution of the batched TRON/ALM solver.

The pure-JAX path (`tron.py`) runs the lockstep state machine as one XLA
while-loop over the FULL batch: every step streams ~40 (n,B) vectors through
HBM for hundreds of small fused ops, and the trip count is the max over all
B lanes. This kernel instead tiles the batch over a Pallas grid and runs the
*same* state machine per tile with everything VMEM-resident:

- HBM traffic collapses to one load + one store of the tile's inputs/outputs
  (the iterates, gradients, and 6x6 Hessians never leave VMEM),
- each tile runs its OWN while-loop trip count, so a pathological line only
  stalls its 1024-lane tile, not the whole grid — the TPU analogue of the
  reference's independent per-line CUDA blocks
  (acopf_admm_update_x_gpu.jl:26-32).

The kernel body literally calls :func:`exaadmm_tpu.ops.tron.tron_alm_batched`
on the tile values — one algorithm, two execution strategies. Autodiff
(grad + Hessian-vector products) traces inside the kernel to plain VPU ops.

fp32 only (Mosaic has no f64); the fp64 path stays on pure-JAX XLA.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tron import TronALMResult, tron_alm_batched


def _pad_last(a, pad, fill):
    if pad == 0:
        return a
    widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, widths, constant_values=fill)


def tron_alm_batched_pallas(
    obj_fn: Callable,
    cons_fn: Callable,
    x0: jnp.ndarray,     # (n, B) rows layout
    xl: jnp.ndarray,
    xu: jnp.ndarray,
    params,              # pytree with (..., B) leaves
    lam0: jnp.ndarray,   # (ncon, B)
    mu0: jnp.ndarray,    # (B,)
    *,
    tile: int = 1024,
    active0: jnp.ndarray | None = None,
    interpret: bool = False,
    fgh_fn=None,
    **opts,
) -> TronALMResult:
    n, B = x0.shape
    ncon = lam0.shape[0]
    dtype = x0.dtype
    assert dtype == jnp.float32, "pallas TRON path is fp32-only"

    ntiles = -(-B // tile)
    pad = ntiles * tile - B

    if active0 is None:
        active0 = jnp.ones((B,), bool)
    act_f = _pad_last(active0.astype(dtype), pad, 0.0)

    # Mosaic requires operand layouts to agree with XLA's; XLA tiles rank-1
    # f32[B] arrays with a B-dependent 1-D tile that need not match the grid
    # block, so every rank-1 lane array is lifted to (1, B) — blocks become
    # (1, tile), the standard (sublane, lane) layout.
    def lift(a):
        return a[None] if a.ndim == 1 else a

    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaf_lifted = [leaf.ndim == 1 for leaf in leaves]
    tensor_inputs = [
        _pad_last(x0, pad, 0.5),
        _pad_last(xl, pad, 0.0),
        _pad_last(xu, pad, 1.0),
        _pad_last(lam0, pad, 0.0),
        lift(_pad_last(mu0, pad, 1.0)),
        lift(_pad_last(act_f, 0, 0.0)),
    ] + [lift(_pad_last(leaf, pad, 1.0)) for leaf in leaves]

    def spec_for(a):
        block = a.shape[:-1] + (tile,)
        nlead = a.ndim - 1

        def index_map(i, _n=nlead):
            # i32-typed zeros: index maps are traced under the AMBIENT dtype
            # config, and with jax_enable_x64 on (mixed-precision solves) a
            # literal 0 becomes an i64 constant that Mosaic cannot legalize
            # ("failed to legalize operation 'func.return'")
            return (jnp.zeros((), jnp.int32),) * _n + (i,)

        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    in_specs = [spec_for(a) for a in tensor_inputs]

    out_shapes = (
        jax.ShapeDtypeStruct((n, ntiles * tile), dtype),      # x
        jax.ShapeDtypeStruct((max(ncon, 1), ntiles * tile), dtype),  # lam
        jax.ShapeDtypeStruct((1, ntiles * tile), dtype),      # mu
        jax.ShapeDtypeStruct((1, ntiles * tile), jnp.int32),  # minor
        jax.ShapeDtypeStruct((1, ntiles * tile), jnp.int32),  # alm
        jax.ShapeDtypeStruct((1, ntiles * tile), dtype),      # cviol
    )
    out_specs = tuple(spec_for(jnp.zeros(s.shape, s.dtype)) for s in out_shapes)

    def kernel(*refs):
        # trace the body with x64 disabled: every tensor input is f32/i32,
        # but under jax_enable_x64 (mixed-precision fp64 solves) Python float
        # literals in the state machine trace as weak f64[] scalars, which
        # Mosaic cannot lower ("only 32-bit element types can be converted
        # to scalars"). With x64 off they trace as f32 — bit-identical to
        # the fp32-solve path. The context must live INSIDE the kernel:
        # pallas defers kernel tracing to jit-lowering time.
        with jax.enable_x64(False):
            (x0r, xlr, xur, lamr, mur, actr, *rest) = refs[: 6 + len(leaves)]
            (xo, lamo, muo, mino, almo, cvo) = refs[6 + len(leaves):]
            params_tile = jax.tree_util.tree_unflatten(
                treedef,
                [r[...][0] if was1d else r[...]
                 for r, was1d in zip(rest, leaf_lifted)])
            res = tron_alm_batched(
                obj_fn, cons_fn,
                x0r[...], xlr[...], xur[...], params_tile,
                lamr[...], mur[...][0],
                active0=actr[...][0] > 0.5,
                fgh_fn=fgh_fn,
                **opts,
            )
            xo[...] = res.x
            lamo[...] = res.lam if ncon > 0 else jnp.zeros_like(lamo[...])
            muo[...] = res.mu[None]
            mino[...] = res.minor_iters[None]
            almo[...] = res.alm_iters[None]
            cvo[...] = res.cviol[None]

    outs = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(*tensor_inputs)

    x, lam, mu, minor, alm, cviol = outs
    return TronALMResult(
        x=x[:, :B],
        lam=lam[:ncon, :B],
        mu=mu[0, :B],
        minor_iters=minor[0, :B],
        alm_iters=alm[0, :B],
        cviol=cviol[0, :B],
    )
