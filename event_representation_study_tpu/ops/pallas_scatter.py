"""Fused multi-column segment reduction as a Pallas TPU kernel.

Motivation (measured on TPU v5e, see bench.py history): XLA lowers
scatter/segment ops to a serialized per-update loop — ~150M updates/s —
making ERGO-12's ~30 segment reductions the bottleneck (~325 ms for a
32x50k-event batch). Sorting the same batch costs only ~2 ms. This kernel
exploits that: events are pre-sorted by pixel id, every TILE_S-pixel tile's
events are then contiguous, and a (tile x events-chunk) one-hot matmul on
the MXU accumulates ALL value columns of a tile in one shot.

Pipeline per batch:
1. XLA: sort (pixel_id, event order) once; gather all value columns into
   sorted order; ``tile_offsets`` = searchsorted of tile bases.
2. Pallas grid (B, num_tiles): each instance walks its event range in
   aligned chunks of ``E_CHUNK``; builds a (E, TILE_S) one-hot via
   iota-compare (VPU); accumulates sum-columns with ``V @ one_hot`` (MXU)
   and max-columns with masked max (VPU). Stray events from neighboring
   tiles inside an aligned chunk self-exclude via the id compare.
3. XLA: elementwise channel combination (mean = sum/count, var = E[x^2] -
   E[x]^2, ...), reshape to (H, W, C).

Memory layout: value matrices are (K, N) — columns in sublanes, events in
lanes — so VMEM blocks stay unpadded (a (N, K) layout pads K up to 128
lanes, an 8x blowup that OOMs VMEM).

Padding events carry segment id >= num_segments; they either fall past the
last tile boundary or land in slots >= num_segments that are sliced off.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 512  # pixels per tile
# events per inner chunk: swept on v5e (ERGO-12 ms per 32x50k batch, honest
# distinct-blocks timing) — E512: 21.6, E256: 18.9, E128: 18.5; larger
# tiles are strictly worse (T1024+: 26-40 ms, the (E, TILE) one-hot
# compare/mask work on the VPU dominates). 128 keeps the one-hot small
# while the while-loop amortizes chunk overhead.
# Round-3 downward sweep (scripts/pallas_tile_sweep.py, same timing):
# T256/E128 23.4 ms, T256/E256 25.5, T128/E128 27.9, T128/E256 32.9 vs
# T512/E128 21.0 — smaller tiles LOSE: the grid-instance fixed cost
# (accumulator init + output write + loop setup, B*num_tiles instances)
# outgrows the one-hot savings. T512/E128 is the measured optimum in both
# directions.
E_CHUNK = 128

NEG_INF = -3.4e38

# per-instance VMEM budget for the double-buffered (seg + sum + max) event
# streams; streams longer than budget/(8*(ks+km+1)) are split into aligned
# chunks ridden as extra batch rows (see fused_segment_reduce). 12 MB leaves
# headroom under the ~16 MB scoped-vmem limit for the (K, TILE_S) output
# accumulators. Module-level so tests can shrink it to exercise chunking.
EV_VMEM_BYTES = 12 * 2**20


def _kernel_sum_only(offs_ref, seg_ref, vsum_ref, out_sum_ref):
    """Sum-columns-only variant: histogram/voxel-style reps have no max
    columns, and the dummy NEG_INF stream + per-chunk masked-max pass cost
    ~10-15% of their build time."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    num_t = pl.num_programs(1)
    start = offs_ref[b * (num_t + 1) + t]
    end = offs_ref[b * (num_t + 1) + t + 1]

    ks = vsum_ref.shape[1]
    tile_base = t * TILE_S
    acc_sum = jnp.zeros((ks, TILE_S), jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, TILE_S), 1)
    start_aligned = pl.multiple_of((start // E_CHUNK) * E_CHUNK, E_CHUNK)

    def body(carry):
        c, acc_sum = carry
        c = pl.multiple_of(c, E_CHUNK)
        seg = seg_ref[0, 0, pl.ds(c, E_CHUNK)]
        vs = vsum_ref[0, :, pl.ds(c, E_CHUNK)]
        rel = seg.reshape(E_CHUNK, 1) - tile_base
        oh_f = (rel == col_ids).astype(jnp.float32)
        acc_sum = acc_sum + jax.lax.dot_general(
            vs, oh_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return c + E_CHUNK, acc_sum

    _, acc_sum = jax.lax.while_loop(
        lambda carry: carry[0] < end, body, (start_aligned, acc_sum)
    )
    out_sum_ref[0, :, :] = acc_sum


def _kernel(offs_ref, seg_ref, vsum_ref, vmax_ref, out_sum_ref, out_max_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    num_t = pl.num_programs(1)
    start = offs_ref[b * (num_t + 1) + t]
    end = offs_ref[b * (num_t + 1) + t + 1]

    ks = vsum_ref.shape[1]
    km = vmax_ref.shape[1]
    tile_base = t * TILE_S

    acc_sum = jnp.zeros((ks, TILE_S), jnp.float32)
    acc_max = jnp.full((km, TILE_S), NEG_INF, jnp.float32)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, TILE_S), 1)
    start_aligned = pl.multiple_of((start // E_CHUNK) * E_CHUNK, E_CHUNK)

    def body(carry):
        c, acc_sum, acc_max = carry
        c = pl.multiple_of(c, E_CHUNK)  # re-assert alignment through the carry
        seg = seg_ref[0, 0, pl.ds(c, E_CHUNK)]  # (E,)
        vs = vsum_ref[0, :, pl.ds(c, E_CHUNK)]  # (Ks, E)
        vm = vmax_ref[0, :, pl.ds(c, E_CHUNK)]  # (Km, E)
        rel = seg.reshape(E_CHUNK, 1) - tile_base
        onehot = rel == col_ids  # (E, TILE_S)
        oh_f = onehot.astype(jnp.float32)
        acc_sum = acc_sum + jax.lax.dot_general(
            vs, oh_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        rows = []
        for j in range(km):
            vj = vm[j, :].reshape(E_CHUNK, 1)
            masked = jnp.where(onehot, vj, NEG_INF)  # (E, TILE_S)
            rows.append(jnp.max(masked, axis=0, keepdims=True))  # (1, TILE_S)
        acc_max = jnp.maximum(acc_max, jnp.concatenate(rows, axis=0))
        return c + E_CHUNK, acc_sum, acc_max

    def cond(carry):
        return carry[0] < end

    _, acc_sum, acc_max = jax.lax.while_loop(
        cond, body, (start_aligned, acc_sum, acc_max)
    )
    out_sum_ref[0, :, :] = acc_sum
    out_max_ref[0, :, :] = acc_max


@functools.partial(jax.jit, static_argnames=("num_segments", "columns_fn", "interpret"))
def fused_segment_reduce(
    seg: jnp.ndarray,  # (B, N) int32, invalid >= num_segments
    carry: Tuple[jnp.ndarray, ...],  # per-event (B, N) streams to sort along
    columns_fn,  # (sorted_pos, *sorted_carry) -> (vs (B,Ks,N), vm (B,Km,N))
    num_segments: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (sums (B, S, Ks), maxes (B, S, Km) or None). When
    ``columns_fn`` yields no max columns (Km == 0) the sum-only fast path
    skips the dummy NEG_INF stream entirely and returns ``maxes=None``;
    otherwise maxes are NEG_INF for empty segments (callers decide the
    empty-bin fill).

    Value columns are computed *after* the sort by ``columns_fn`` from the
    sorted carry streams + positions: multi-operand ``lax.sort`` scales badly
    past a handful of operands and permutation row-gathers are ~10x slower
    than the sort, so only the raw per-event fields ride the sort.
    """
    B, N = seg.shape
    num_tiles = (num_segments + TILE_S - 1) // TILE_S
    s_pad = num_tiles * TILE_S

    # 1. sort by (segment, position) -> stable within a pixel
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    sorted_ops = jax.lax.sort((seg, pos) + tuple(carry), num_keys=2, is_stable=False)
    seg_s, pos_s = sorted_ops[0], sorted_ops[1]
    vs_t, vm_t = columns_fn(pos_s, *sorted_ops[2:])  # (B, Ks, N), (B, Km, N)|None
    ks = vs_t.shape[1]
    km = 0 if vm_t is None else vm_t.shape[1]

    # pad the event axis so aligned in-kernel chunk reads never run off the end
    n_pad = ((N + E_CHUNK - 1) // E_CHUNK) * E_CHUNK + E_CHUNK
    pad = n_pad - N
    seg_s = jnp.pad(seg_s, ((0, 0), (0, pad)), constant_values=num_segments)
    vs_t = jnp.pad(vs_t, ((0, 0), (0, 0), (0, pad)))
    if km:
        vm_t = jnp.pad(vm_t, ((0, 0), (0, 0), (0, pad)), constant_values=NEG_INF)

    # VMEM ceiling: every grid instance maps the full (K, n_pad) value
    # streams (double-buffered), so footprint grows linearly with N — fine
    # at the Gen1 50k window (~3.6 MB), a scoped-VMEM OOM at the event-
    # mosaic path's 4x-event streams (measured on v5e: 36.75M vs the 16M
    # limit at N=200k, ks=18). Above the cap, split the SORTED stream into
    # E_CHUNK-aligned contiguous chunks ridden as extra batch rows; sums
    # add and maxes max across chunks (a pixel spanning a boundary combines
    # exactly), so the kernel itself never sees more than L_max events.
    n_chunks = 1
    l_max = (EV_VMEM_BYTES // (8 * (ks + km + 1))) // E_CHUNK * E_CHUNK
    # With extreme column counts (ks+km+1 > EV_VMEM_BYTES/(8*E_CHUNK)) the
    # budget rounds l_max down to 0 and the ceil-div below would divide by
    # zero at trace time. Clamp to one E_CHUNK: a single chunk then
    # overshoots the soft budget, which is still compilable (the hard
    # scoped-VMEM limit has headroom over the 12 MB soft cap) and correct.
    l_max = max(l_max, E_CHUNK)
    if n_pad > l_max:
        n_chunks = -(-n_pad // l_max)
        chunk_len = -(-n_pad // (n_chunks * E_CHUNK)) * E_CHUNK
        tot = n_chunks * chunk_len
        extra = tot - n_pad
        seg_s = jnp.pad(seg_s, ((0, 0), (0, extra)),
                        constant_values=num_segments)
        vs_t = jnp.pad(vs_t, ((0, 0), (0, 0), (0, extra)))
        seg_s = seg_s.reshape(B * n_chunks, chunk_len)
        vs_t = jnp.swapaxes(
            vs_t.reshape(B, ks, n_chunks, chunk_len), 1, 2
        ).reshape(B * n_chunks, ks, chunk_len)
        if km:
            vm_t = jnp.pad(vm_t, ((0, 0), (0, 0), (0, extra)),
                           constant_values=NEG_INF)
            vm_t = jnp.swapaxes(
                vm_t.reshape(B, km, n_chunks, chunk_len), 1, 2
            ).reshape(B * n_chunks, km, chunk_len)
        B, n_pad = B * n_chunks, chunk_len

    # 2. per-tile event ranges
    bases = jnp.arange(num_tiles + 1, dtype=jnp.int32) * TILE_S
    bases = bases.at[-1].set(num_segments)
    offs = jax.vmap(lambda s: jnp.searchsorted(s, bases, side="left"))(seg_s)
    offs = offs.astype(jnp.int32).reshape(-1)  # (B*(T+1),)

    if km == 0:
        # sum-only fast path (columns_fn returned vm=None)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, num_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, n_pad), lambda b, t, offs: (b, 0, 0)),
                pl.BlockSpec((1, ks, n_pad), lambda b, t, offs: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, ks, TILE_S), lambda b, t, offs: (b, 0, t)),
        )
        sums = pl.pallas_call(
            _kernel_sum_only,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, ks, s_pad), jnp.float32),
            interpret=interpret,
        )(offs, seg_s[:, None, :], vs_t)
        if n_chunks > 1:
            sums = sums.reshape(-1, n_chunks, ks, s_pad).sum(axis=1)
        return jnp.swapaxes(sums, 1, 2)[:, :num_segments], None

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_pad), lambda b, t, offs: (b, 0, 0)),
            pl.BlockSpec((1, ks, n_pad), lambda b, t, offs: (b, 0, 0)),
            pl.BlockSpec((1, km, n_pad), lambda b, t, offs: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, ks, TILE_S), lambda b, t, offs: (b, 0, t)),
            pl.BlockSpec((1, km, TILE_S), lambda b, t, offs: (b, 0, t)),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, ks, s_pad), jnp.float32),
        jax.ShapeDtypeStruct((B, km, s_pad), jnp.float32),
    )
    sums, maxes = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(offs, seg_s[:, None, :], vs_t, vm_t)
    if n_chunks > 1:
        sums = sums.reshape(-1, n_chunks, ks, s_pad).sum(axis=1)
        maxes = maxes.reshape(-1, n_chunks, km, s_pad).max(axis=1)
    sums = jnp.swapaxes(sums, 1, 2)[:, :num_segments]
    maxes = jnp.swapaxes(maxes, 1, 2)[:, :num_segments]
    return sums, maxes
