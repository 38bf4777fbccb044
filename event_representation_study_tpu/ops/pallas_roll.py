"""Per-row dynamic-slice ("roll") as a Pallas DMA kernel.

The separable warp (ops/warp.py compose_warp_separable) needs, per pass, a
per-row integer shift: out[b, r] = x[b, r, s[b, r] : s[b, r] + w_out].
Expressed as an XLA gather this moves only ~8-9 GB/s of output bytes on
v5e (measured, scripts/warp_sep_bench.py — the gather engine's throughput
is shape-independent: the same ~8 GB/s shows up for 192 B patch rows and
for 30 KB contiguous row slices). The operation is pure data movement, so
a Pallas kernel that streams row blocks through VMEM and applies the shift
as an in-VMEM dynamic slice runs at DMA bandwidth instead.

Layout: (B, R, W, C) with the shifted axis second-minor — Mosaic lowers
dynamic slices on the sublane axis cheaply, and C stays on lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_kernel(starts_ref, x_ref, o_ref, *, rb, w_out, w_in):
    i = pl.program_id(1)
    for r in range(rb):
        s = starts_ref[0, i, r, 0]
        # A dynamic-START slice on the sublane axis is not lowerable (Mosaic
        # requires provably 8-aligned starts for the vector load); a dynamic
        # ROTATE is (tpu.dynamic_rotate), and with 0 <= s <= w_in - w_out the
        # first w_out sublanes of roll(row, -s) are exactly row[s : s+w_out].
        row = x_ref[0, r]  # (W_in, C)
        rolled = pltpu.roll(row, w_in - s, 0)  # rolled[j] = row[(j+s) % W_in]
        o_ref[0, r] = rolled[:w_out, :]


@functools.partial(
    jax.jit, static_argnames=("w_out", "rb", "interpret")
)
def roll_rows(
    x: jnp.ndarray,       # (B, R, W_in, C)
    starts: jnp.ndarray,  # (B, R) int32, 0 <= start <= W_in - w_out
    w_out: int,
    rb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b, r, :, :] = x[b, r, starts[b, r] : starts[b, r] + w_out, :].

    Starts are clamped into range (matching lax.gather's CLIP mode, which
    the XLA fallback in compose_warp_separable relies on)."""
    B, R, W_in, C = x.shape
    assert w_out <= W_in
    if x.dtype.itemsize == 2:
        # Mosaic's dynamic rotate is 32-bit only. Channels are the minor
        # (contiguous) axis, so packing lane PAIRS into int32 is a pure
        # bitcast — the rolled (sublane) axis is untouched and the same
        # starts apply. Odd channel counts pad one lane.
        xp = x if C % 2 == 0 else jnp.pad(
            x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        c2 = xp.shape[-1] // 2
        xi = jax.lax.bitcast_convert_type(
            xp.reshape(B, R, W_in, c2, 2), jnp.int32)
        oi = roll_rows(xi, starts, w_out, rb=rb, interpret=interpret)
        out = jax.lax.bitcast_convert_type(oi, x.dtype).reshape(
            B, R, w_out, 2 * c2)
        return out[..., :C]
    if R % rb or W_in % 8:
        # Mosaic's dynamic rotate requires an 8-aligned sublane (W) axis;
        # padding W is safe because starts are clamped to W_in - w_out, so
        # the first w_out outputs never wrap into the pad. The row axis
        # pads up to the block size.
        pad_r = (rb - R % rb) % rb
        pad_w = (8 - W_in % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_r), (0, pad_w), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, pad_r)))
        out = roll_rows(x, starts, w_out, rb=rb, interpret=interpret)
        return out[:, :R]
    starts = jnp.clip(starts.astype(jnp.int32), 0, W_in - w_out)
    # starts ride as a blocked SMEM input (rb scalars per grid step) — an
    # all-at-once scalar prefetch of B*R starts overflows SMEM at real
    # shapes (10240 rows = 40 KB) and crashes the compiler. The (rb, 1)
    # trailing shape satisfies the (8, 128)-divisible-or-full block rule.
    starts = starts.reshape(B, R // rb, rb, 1)
    return pl.pallas_call(
        functools.partial(_roll_kernel, rb=rb, w_out=w_out, w_in=W_in),
        grid=(B, R // rb),
        in_specs=[
            pl.BlockSpec((1, R // rb, rb, 1), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rb, W_in, C), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, w_out, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R, w_out, C), x.dtype),
        interpret=interpret,
    )(starts, x)


def roll_rows_xla(x, starts, w_out):
    """The XLA-gather twin (correctness oracle + non-TPU fallback)."""
    from jax import lax

    B, R, W_in, C = x.shape
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1)
    )

    def one(x1, s1):
        st = jnp.stack(
            [jnp.arange(R, dtype=jnp.int32), s1.astype(jnp.int32)], axis=-1
        )
        return lax.gather(x1, st, dn, slice_sizes=(1, w_out, C),
                          mode=lax.GatherScatterMode.CLIP)

    return jax.vmap(one)(x, starts)
