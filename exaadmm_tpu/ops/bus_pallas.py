"""Pallas TPU kernel for the bus-consensus line->bus scatter.

The XLA ``kernels.kr_scatter`` path (Khatri-Rao one-hot matmuls) already
beats ``segment_sum`` ~2x, but it materializes the (N, H*8) Khatri-Rao
product D in HBM between the VPU build and the MXU contraction. This kernel
fuses the whole reduction per line tile in VMEM:

  per tile t (1024 lines):
    hi = ids // 128, lo = ids % 128
    D_k[(n), (c, h)] = onehot(hi)[n, h] * v_k[n, c]   for the THREE bf16
                       split terms v_1/v_2/v_3 of vals            (VPU)
    acc[(c, h), l] += sum_k D_k^T @ onehot(lo)                    (MXU)

with acc a (8*H, 128) f32 VMEM scratch that lives across the sequential
grid; the (c-major, h, lane) -> (bus, c) unscramble is one small XLA
reshape/transpose on the (8*H, 128) output. The 3-term bf16 split of the
DATA operand carries ~24 mantissa bits (full fp32) — the same split as
``kernels.kr_scatter``; the earlier 2-term version (~3e-6 rel) was the
precision level that measurably stalls full-solve convergence
(kernels.py's hard-won lesson), so it is gone. The one-hot factor is
exact 0/1 in bf16, making each term's product exact.

Only worthwhile while H*8 stays small (nbus <= ~16k): the dense KR
contraction is O(N * nbus * 8) MACs, so huge grids fall back to segment_sum
(see kernels.resolve semantics in models/acopf/model.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


@functools.partial(jax.jit, static_argnames=("nbus", "tile", "interpret"))
def kr_scatter_pallas(vals_fr, vals_to, fr, to, *, nbus: int,
                      tile: int = 1024, interpret: bool = False):
    """segment_sum(vals_fr, fr) + segment_sum(vals_to, to) over nbus segments.

    vals_* are (N, C) fp32 (C = 8 here), fr/to (N,) int32 with padded lanes
    pointing at masked-out (zero) rows. Returns (nbus, C) fp32.

    NOTE: with the 3-term split the per-tile intermediates (3 terms x 2
    sides x (tile, C*Hn) bf16 KR products) can exceed Mosaic's VMEM stack
    at tile=1024 for Hn >= ~17; use tile<=512 there.
    """
    N, C = vals_fr.shape
    assert vals_fr.dtype == jnp.float32
    Hn = -(-nbus // LANES)
    ntiles = -(-N // tile)
    pad = ntiles * tile - N

    def pad_rows(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill)

    vf = pad_rows(vals_fr)
    vt = pad_rows(vals_to)
    idf = jnp.pad(fr, (0, pad))[None].astype(jnp.int32)
    idt = jnp.pad(to, (0, pad))[None].astype(jnp.int32)

    def kernel(vf_ref, vt_ref, if_ref, it_ref, out_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def side(vals_ref, ids_ref):
            ids = ids_ref[0, :]                       # (tile,) i32
            hi = ids // LANES
            lo = ids % LANES
            Ahi = (hi[:, None] == lax.broadcasted_iota(
                jnp.int32, (tile, Hn), 1)).astype(jnp.bfloat16)
            Alo = (lo[:, None] == lax.broadcasted_iota(
                jnp.int32, (tile, LANES), 1)).astype(jnp.bfloat16)
            v = vals_ref[...]                         # (tile, C) f32
            # 3-term bf16 split (~24 mantissa bits; see module docstring).
            # NO optimization barriers: Mosaic does not lower the primitive
            # ("Unimplemented primitive ... optimization_barrier") and,
            # unlike XLA's excess-precision pass, does not currently cancel
            # f32->bf16->f32 round-trips. Because that protection is
            # compiler-behavior, an ON-DEVICE compiled-mode precision guard
            # (tests/test_tpu_device.py::test_kr_scatter_pallas_precision_
            # on_device) must stay alongside the interpret-mode test — it
            # is the only mode that would catch a future Mosaic
            # canonicalization collapsing the split.
            v1 = v.astype(jnp.bfloat16)
            r1 = v - v1.astype(jnp.float32)
            v2 = r1.astype(jnp.bfloat16)
            v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)

            def dot(vk):
                # D in c-major column order: D[:, c*Hn + h]
                D = jnp.concatenate(
                    [Ahi * vk[:, r:r + 1] for r in range(C)], axis=1)
                return lax.dot_general(
                    D, Alo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            return dot(v1) + dot(v2) + dot(v3)        # (C*Hn, LANES)

        acc_ref[...] += side(vf_ref, if_ref) + side(vt_ref, it_ref)

        @pl.when(t == ntiles - 1)
        def _():
            out_ref[...] = acc_ref[...]

    # i32-typed zeros in index maps: under jax_enable_x64 a literal 0 traces
    # as an i64 constant Mosaic cannot legalize (see tron_pallas.spec_for)
    z32 = lambda: jnp.zeros((), jnp.int32)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, z32()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, z32()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (z32(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (z32(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C * Hn, LANES), lambda i: (z32(), z32()),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * Hn, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C * Hn, LANES), jnp.float32)],
        interpret=interpret,
    )(vf, vt, idf, idt)

    # (c-major (c, h), lane) -> (bus = h*128 + lane, c)
    agg = out.reshape(C, Hn, LANES).transpose(1, 2, 0).reshape(Hn * LANES, C)
    return agg[:nbus]
