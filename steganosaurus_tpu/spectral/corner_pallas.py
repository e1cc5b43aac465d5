"""Pallas TPU kernel for the corner DFT's stage-1 contraction.

Computes ar/ai = planes @ [exr|exi]^T (contract W) in ONE kernel: the
planes tile is loaded from HBM once and fed to both the cos and sin MXU
dots, where the XLA einsum pair reads the (B, 3, H, W) operand twice.
Accumulation is f32; operands are cast to bf16 in-VMEM (the "mix"
precision stage-1 mode, spectral/corner.py:precision — stage-1 operands
are exact/well-scaled in bf16).

NOT wired into the production path — kept as the measured comparison and
as the insertion point should the shape regime change: on the 4K corner
shapes it benches 39.5 ms vs XLA's 37.5 ms for the 16-image stage (the
einsum pair is already MXU-bound; the fusion saves only the second
operand read). See doc/PAPER.md §5a. Exactness vs the production einsum
is locked by tests/test_spectral.py::test_corner_pallas_matches_einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n: int, target: int, mult: int) -> int:
    """Largest divisor of n that is <= target and a multiple of `mult`
    (falls back to n when none divides cleanly)."""
    best = None
    for t in range(mult, min(n, target) + 1, mult):
        if n % t == 0:
            best = t
    return best if best is not None else n


def _s1_kernel(p_ref, exr_ref, exi_ref, ar_ref, ai_ref):
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _():
        ar_ref[...] = jnp.zeros_like(ar_ref)
        ai_ref[...] = jnp.zeros_like(ai_ref)

    x = p_ref[0].astype(jnp.bfloat16)            # (TH, TW)
    dn = (((1,), (1,)), ((), ()))                # contract the W tile
    ar_ref[0] += jax.lax.dot_general(
        x, exr_ref[...], dn, preferred_element_type=jnp.float32)
    ai_ref[0] += jax.lax.dot_general(
        x, exi_ref[...], dn, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fwd_stage1(planes, exr, exi, interpret: bool = False):
    """(P, H, W) f32 planes, (Kx, W) f32 tables -> ((P, H, Kx) ar, ai) f32.

    Leading batch/plane dims must be flattened into P by the caller.
    """
    P, H, W = planes.shape
    Kx = exr.shape[0]
    TH = _pick_tile(H, 256, 8)
    TW = _pick_tile(W, 512, 128)
    grid = (P, H // TH, W // TW)
    return pl.pallas_call(
        _s1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TH, TW), lambda p, h, w: (p, h, w)),
            pl.BlockSpec((Kx, TW), lambda p, h, w: (0, w)),
            pl.BlockSpec((Kx, TW), lambda p, h, w: (0, w)),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, Kx), lambda p, h, w: (p, h, 0)),
            pl.BlockSpec((1, TH, Kx), lambda p, h, w: (p, h, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, H, Kx), jnp.float32),
            jax.ShapeDtypeStruct((P, H, Kx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(planes, exr.astype(jnp.bfloat16), exi.astype(jnp.bfloat16))
