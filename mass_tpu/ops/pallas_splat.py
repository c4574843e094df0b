"""Pallas TPU kernel for the one-hot trilinear splat update.

XLA's scatter (and random gather) lowers to a serialized loop on TPU
(~30 ns per element — 400k corner contributions cost ~40 ms/frame; see
docs/performance.md).  This kernel reformulates the whole update as
dense MXU work over sorted voxel-id spans:

  * records (corner contributions) are sorted by voxel id on the XLA
    side, payloads riding the sort network
    (ops/scatter.span_sorted_records);
  * the map is channel-major ``[F, V]``; the grid walks spans of
    ``SPAN`` consecutive voxel ids (a ``[F, SPAN]`` block streamed
    through VMEM by the Pallas pipeline);
  * each span's records (a contiguous sorted range, located via a
    prefetched ``starts`` table) are DMA'd in aligned chunks and
    reduced with ONE augmented one-hot matmul per sub-block:

        acc[F+2, span] += Baug^T @ onehot(slot_r)
        Baug[r, f]   = w_r^2 * [class_r == f]   (additive numerators T)
        Baug[r, F]   = w_r                       (voxel weight sums W)
        Baug[r, F+1] = w_r^2                     (squared sums S2)

  * finally the EMA blend is a fused VPU pass over the span:
        out = in * (1 - iw*S2/W) + iw*T/W        (identity where W == 0)

This computes exactly the reference semantics (reference:
mass/utils/projection.py:233-351) — per-voxel reductions are dense
per-slot quantities, so no per-record gathers, segment scans, or
scatters exist anywhere in the pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# span of voxel ids per grid step; records move in CHUNK-sized DMAs
# (1-D VMEM tiling requires 1024-aligned slices) and are applied in SUB-
# sized sub-blocks (the [SUB, SPAN] one-hot must fit VMEM alongside the
# map block).  SUB is overridable for on-chip A/Bs (MASS_SPLAT_SUB):
# larger sub-blocks amortize the per-sub-block mask/accumulate overhead
# at the cost of coarser skip granularity on sparse spans
# (docs/performance.md "Remaining headroom").
import os as _os

SPAN = int(_os.environ.get("MASS_SPLAT_SPAN", "2048"))
CHUNK = 1024
SUB = int(_os.environ.get("MASS_SPLAT_SUB", "256"))
assert CHUNK % SUB == 0, f"MASS_SPLAT_SUB must divide {CHUNK}: {SUB}"
# SPAN sets the one-hot matmul's column width ([SUB, SPAN/n_blocks]):
# because records arrive SORTED by voxel id, shrinking SPAN is exactly
# "tile-ordered processing" — each record's ideal MXU bill drops
# linearly while the record stream and sort stay untouched (the map
# must keep num_voxels % SPAN == 0; MapGeometry grids are
# 256-multiples).  Measured on chip (round 4): the MAC savings do NOT
# materialize — 2048 → 202.7 fps, 1024 → 160 fps, 512 → 108 fps
# end-to-end; narrow spans are grid-iteration/overhead-bound.  2048
# stays the default (docs/performance.md "Remaining headroom").
assert SPAN % 256 == 0 and SPAN >= 256, f"MASS_SPLAT_SPAN: {SPAN}"
# MASS_SPLAT_DIAG=stub_onehot replaces the [SUB, SPAN] one-hot compare
# with a broadcast (WRONG numerics, identical shapes/matmuls) purely to
# bound the VPU one-hot-construction share of kernel time on chip.
# Never set outside perf diagnostics.  MEASURED (round 5, idle-box
# interleaved A/B): 201.5 vs 227.1 fps end-to-end — the one-hot build
# is ~13% of kernel time, so the per-class-accumulation rewrite is not
# worth it and the kernel is closed (docs/performance.md).
DIAG = _os.environ.get("MASS_SPLAT_DIAG", "")


def _dot_precision(precision: str):
    """Map the kernels' ``precision`` knob to a lax dot precision.

    "default" lets Mosaic pick: MEASURED on v5e, that is single-pass
    bf16 matmul inputs with f32 accumulation — numerically identical to
    an explicit bf16 input cast (max rel delta 0.0 on chip) and ~6.6e-3
    max-rel from the XLA f32 scatter path.  "highest" forces the true
    multi-pass f32 matmul for reference-budget (1e-3) parity at ~3x the
    MAC bill (docs/performance.md "MXU precision on chip")."""
    if precision == "highest":
        return jax.lax.Precision.HIGHEST
    assert precision == "default", precision
    return None


def _kernel(starts_ref,  # [n_spans + 1] scalar prefetch
            ids_ref, w_ref, cls_ref,                 # records in HBM
            map_hbm_in, map_hbm_out,                 # [F, V] in HBM
            rec_ids, rec_w, rec_cls,                 # [2*CHUNK] VMEM
            span_buf,                                # [F, SPAN] VMEM
            sems, span_sem,                          # DMA semaphores
            *, num_features: int, interpolation_weight: float,
            fast_bf16: bool = False, precision: str = "default"):
    """Grid step = one voxel-id span.  Untouched spans are skipped
    entirely (the map output aliases the input, so skipped spans keep
    their contents with zero HBM traffic).

    MXU packing: the accumulator matmul's output rows are F+2, but the
    MXU processes 128-row output tiles — at F=54 a ``[F+2, SPAN]``
    accumulator wastes >2x of the systolic array.  When 2*(F+2) <= 128
    the span splits into two half-width column blocks STACKED as row
    blocks (``[2*(F+2), SPAN/2]``): each record's row index becomes
    ``(slot // (SPAN/2)) * (F+2) + class``, filling the 128 output rows
    with useful work.  Exact same per-voxel sums, ~2x fewer effective
    MACs."""
    i = pl.program_id(0)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    count = end - start
    # record DMAs must start 1024-aligned: cover [align_down(start), end)
    # and mask to the true range (stray records belong to other spans)
    aligned = (start // CHUNK) * CHUNK
    base = i * SPAN

    @pl.when(count > 0)
    def _process():
        load = pltpu.make_async_copy(
            map_hbm_in.at[:, pl.ds(base, SPAN)], span_buf, span_sem)
        load.start()
        _accumulate_and_blend(
            starts_ref, ids_ref, w_ref, cls_ref, map_hbm_out, rec_ids,
            rec_w, rec_cls, span_buf, sems, span_sem, i, start, end,
            count, aligned, base, load, num_features,
            interpolation_weight, fast_bf16, precision)


def _accumulate_and_blend(starts_ref, ids_ref, w_ref, cls_ref,
                          map_hbm_out, rec_ids, rec_w, rec_cls,
                          span_buf, sems, span_sem, i, start, end,
                          count, aligned, base, load, num_features,
                          interpolation_weight, fast_bf16=False,
                          precision="default"):
    n_chunks = jnp.where(count > 0,
                         (end - aligned + CHUNK - 1) // CHUNK, 0)
    stride = num_features + 2
    n_blocks = 2 if 2 * stride <= 128 else 1
    half = SPAN // n_blocks

    def _copies(k, slot):
        off = pl.multiple_of(aligned + k * CHUNK, CHUNK)
        dst = pl.ds(pl.multiple_of(slot * CHUNK, CHUNK), CHUNK)
        return [
            pltpu.make_async_copy(
                ids_ref.at[pl.ds(off, CHUNK)], rec_ids.at[dst],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                w_ref.at[pl.ds(off, CHUNK)], rec_w.at[dst],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                cls_ref.at[pl.ds(off, CHUNK)], rec_cls.at[dst],
                sems.at[slot, 2]),
        ]

    def body(acc):
        acc[:] = jnp.zeros_like(acc)

        @pl.when(n_chunks > 0)
        def _prologue():
            for c in _copies(0, 0):
                c.start()

        def chunk_body(k, _):
            slot = k % 2

            # double-buffer: next chunk's records stream in while this
            # one computes
            @pl.when(k + 1 < n_chunks)
            def _prefetch():
                for c in _copies(k + 1, (k + 1) % 2):
                    c.start()

            for c in _copies(k, slot):
                c.wait()

            sl = pl.ds(pl.multiple_of(slot * CHUNK, CHUNK), CHUNK)
            all_ids = rec_ids[sl]
            all_w = rec_w[sl]
            all_cls = rec_cls[sl]
            span_iota = jax.lax.broadcasted_iota(
                jnp.int32, (SUB, half), 1)
            f_iota = jax.lax.broadcasted_iota(
                jnp.int32, (SUB, n_blocks * stride), 1)
            sub_iota = jax.lax.broadcasted_iota(
                jnp.int32, (SUB, 1), 0)[:, 0]

            for s in range(CHUNK // SUB):
                lo = s * SUB
                block_lo = aligned + k * CHUNK + lo

                # most spans hold far fewer records than a chunk: skip
                # sub-blocks entirely outside [start, end)
                @pl.when((block_lo < end) & (block_lo + SUB > start))
                def _sub():
                    slots = jax.lax.slice(all_ids, (lo,),
                                          (lo + SUB,)) - base
                    g_idx = block_lo + sub_iota
                    valid = (g_idx >= start) & (g_idx < end)
                    col = slots % half
                    row0 = (slots // half) * stride
                    # validity folds into the [SUB] weight instead of
                    # the [SUB, half] one-hot AND: an invalid record's
                    # baug row is all-zero (every entry scales by w or
                    # w^2), so its spurious one-hot column contributes
                    # exactly 0 through the contraction
                    if DIAG == "stub_onehot":
                        onehot = jnp.broadcast_to(
                            slots.astype(jnp.float32)[:, None],
                            (SUB, half))
                    else:
                        onehot = jnp.where(
                            col[:, None] == span_iota, 1.0, 0.0)

                    w = jnp.where(
                        valid,
                        jax.lax.slice(all_w, (lo,), (lo + SUB,)), 0.0)
                    cls = jax.lax.slice(all_cls, (lo,), (lo + SUB,))
                    w2 = w * w
                    baug = jnp.where(
                        f_iota == (row0 + cls)[:, None],
                        w2[:, None], 0.0)
                    baug = jnp.where(
                        f_iota == (row0 + num_features)[:, None],
                        w[:, None], baug)
                    baug = jnp.where(
                        f_iota == (row0 + num_features + 1)[:, None],
                        w2[:, None], baug)
                    if fast_bf16:
                        # explicit bf16 matmul inputs — measured
                        # IDENTICAL to "default" precision on chip
                        # (Mosaic already truncates f32 dot inputs to
                        # single-pass bf16); kept for interpret-mode
                        # emulation of on-chip numerics
                        baug = baug.astype(jnp.bfloat16)
                        onehot = onehot.astype(jnp.bfloat16)
                    acc[:] += jax.lax.dot_general(
                        baug, onehot, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_dot_precision(precision))
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        iw = interpolation_weight
        load.wait()
        for blk in range(n_blocks):
            r0 = blk * stride
            w_sum = acc[r0 + num_features, :]
            s2_sum = acc[r0 + num_features + 1, :]
            safe_w = jnp.maximum(w_sum, 1e-30)
            mult = jnp.where(w_sum > 0, 1.0 - iw * s2_sum / safe_w,
                             1.0)
            add = (iw / safe_w)[None, :] * acc[r0:r0 + num_features, :]
            cols = pl.ds(blk * half, half)
            span_buf[:, cols] = span_buf[:, cols] * mult[None, :] + add
        store = pltpu.make_async_copy(
            span_buf, map_hbm_out.at[:, pl.ds(base, SPAN)], span_sem)
        store.start()
        store.wait()

    pl.run_scoped(
        body, acc=pltpu.VMEM((n_blocks * (num_features + 2),
                              SPAN // n_blocks), jnp.float32))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _frames_kernel(starts_ref,                       # [T*(S+1)] prefetch
                   ids_ref, w_ref, cls_ref,          # records [T*R] HBM
                   map_hbm_in, map_hbm_out,          # [F, V] HBM
                   rec_ids, rec_w, rec_cls,          # [2*CHUNK] VMEM
                   span_buf,                         # [F, SPAN] VMEM
                   sems, span_sem,
                   *, num_frames: int, num_features: int,
                   row_stride: int, starts_stride: int,
                   interpolation_weight: float,
                   precision: str = "default"):
    """Grid step = one voxel-id span, processed for a SEQUENCE of
    frames: the span streams through VMEM once while every frame's EMA
    blend applies in order (the kernel is span-DMA-bound, so amortizing
    the load/store over T frames is the dominant win; per-voxel blend
    order across frames is exactly the sequential per-frame kernel's).
    """
    i = pl.program_id(0)
    base = i * SPAN
    stride = num_features + 2
    n_blocks = 2 if 2 * stride <= 128 else 1   # MXU row packing (see
    half = SPAN // n_blocks                    # _kernel docstring)
    total = starts_ref[i + 1] - starts_ref[i]
    for f in range(1, num_frames):
        total += (starts_ref[f * starts_stride + i + 1]
                  - starts_ref[f * starts_stride + i])

    @pl.when(total > 0)
    def _process():
        load = pltpu.make_async_copy(
            map_hbm_in.at[:, pl.ds(base, SPAN)], span_buf, span_sem)
        load.start()

        def body(acc):
            load.wait()

            def frame_body(f, _):
                start = starts_ref[f * starts_stride + i]
                end = starts_ref[f * starts_stride + i + 1]
                aligned = (start // CHUNK) * CHUNK
                n_chunks = jnp.where(end > start,
                                     (end - aligned + CHUNK - 1)
                                     // CHUNK, 0)

                def _copies(k, slot):
                    # records are flat [T*R] with R a CHUNK multiple,
                    # so frame-relative chunk offsets stay aligned
                    off = pl.multiple_of(
                        f * row_stride + aligned + k * CHUNK, CHUNK)
                    dst = pl.ds(pl.multiple_of(slot * CHUNK, CHUNK),
                                CHUNK)
                    return [
                        pltpu.make_async_copy(
                            ids_ref.at[pl.ds(off, CHUNK)],
                            rec_ids.at[dst], sems.at[slot, 0]),
                        pltpu.make_async_copy(
                            w_ref.at[pl.ds(off, CHUNK)],
                            rec_w.at[dst], sems.at[slot, 1]),
                        pltpu.make_async_copy(
                            cls_ref.at[pl.ds(off, CHUNK)],
                            rec_cls.at[dst], sems.at[slot, 2]),
                    ]

                @pl.when(end > start)
                def _frame():
                    acc[:] = jnp.zeros_like(acc)
                    for c in _copies(0, 0):
                        c.start()

                    def chunk_body(k, _):
                        slot = k % 2

                        @pl.when(k + 1 < n_chunks)
                        def _prefetch():
                            for c in _copies(k + 1, (k + 1) % 2):
                                c.start()

                        for c in _copies(k, slot):
                            c.wait()

                        sl = pl.ds(pl.multiple_of(slot * CHUNK, CHUNK),
                                   CHUNK)
                        all_ids = rec_ids[sl]
                        all_w = rec_w[sl]
                        all_cls = rec_cls[sl]
                        span_iota = jax.lax.broadcasted_iota(
                            jnp.int32, (SUB, half), 1)
                        f_iota = jax.lax.broadcasted_iota(
                            jnp.int32, (SUB, n_blocks * stride), 1)
                        sub_iota = jax.lax.broadcasted_iota(
                            jnp.int32, (SUB, 1), 0)[:, 0]

                        for s in range(CHUNK // SUB):
                            lo = s * SUB
                            block_lo = aligned + k * CHUNK + lo

                            @pl.when((block_lo < end)
                                     & (block_lo + SUB > start))
                            def _sub():
                                slots = jax.lax.slice(
                                    all_ids, (lo,), (lo + SUB,)) - base
                                g_idx = block_lo + sub_iota
                                valid = (g_idx >= start) & (g_idx < end)
                                col = slots % half
                                row0 = (slots // half) * stride
                                # validity rides the [SUB] weight, not
                                # a [SUB, half] one-hot AND (see the
                                # single-frame kernel)
                                if DIAG == "stub_onehot":
                                    onehot = jnp.broadcast_to(
                                        slots.astype(
                                            jnp.float32)[:, None],
                                        (SUB, half))
                                else:
                                    onehot = jnp.where(
                                        col[:, None] == span_iota,
                                        1.0, 0.0)

                                w = jnp.where(
                                    valid,
                                    jax.lax.slice(all_w, (lo,),
                                                  (lo + SUB,)), 0.0)
                                cls = jax.lax.slice(all_cls, (lo,),
                                                    (lo + SUB,))
                                w2 = w * w
                                baug = jnp.where(
                                    f_iota == (row0 + cls)[:, None],
                                    w2[:, None], 0.0)
                                baug = jnp.where(
                                    f_iota ==
                                    (row0 + num_features)[:, None],
                                    w[:, None], baug)
                                baug = jnp.where(
                                    f_iota ==
                                    (row0 + num_features + 1)[:, None],
                                    w2[:, None], baug)
                                acc[:] += jax.lax.dot_general(
                                    baug, onehot,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=_dot_precision(precision))
                        return 0

                    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

                    iw = interpolation_weight
                    for blk in range(n_blocks):
                        r0 = blk * stride
                        w_sum = acc[r0 + num_features, :]
                        s2_sum = acc[r0 + num_features + 1, :]
                        safe_w = jnp.maximum(w_sum, 1e-30)
                        mult = jnp.where(
                            w_sum > 0, 1.0 - iw * s2_sum / safe_w, 1.0)
                        add = ((iw / safe_w)[None, :]
                               * acc[r0:r0 + num_features, :])
                        cols = pl.ds(blk * half, half)
                        span_buf[:, cols] = (span_buf[:, cols]
                                             * mult[None, :] + add)
                return 0

            jax.lax.fori_loop(0, num_frames, frame_body, 0)
            store = pltpu.make_async_copy(
                span_buf, map_hbm_out.at[:, pl.ds(base, SPAN)],
                span_sem)
            store.start()
            store.wait()

        pl.run_scoped(
            body, acc=pltpu.VMEM((n_blocks * stride, half),
                                 jnp.float32))


@functools.partial(jax.jit, static_argnums=(4,),
                   static_argnames=("interpret", "precision"))
def splat_onehot_frames_cmajor(data: jax.Array, ids: jax.Array,
                               weights: jax.Array, classes: jax.Array,
                               interpolation_weight: float = 0.5,
                               interpret: bool = False,
                               precision: str = "default") -> jax.Array:
    """Sequentially splat T frames of one-hot contributions in ONE
    kernel launch.

    Exact per-frame EMA semantics (frame t's blend sees frame t-1's
    result), but each touched span's HBM load/store happens once for
    the whole batch instead of once per frame — the batched-mapping
    path for episode replay, the mapping service, and the bench's
    frame chunks (the kernel is footprint-DMA-bound,
    docs/performance.md).

    Args:
      data: ``[F, V]`` channel-major map, V a SPAN multiple.
      ids / weights: ``[T, 8N]`` per-frame corner contributions.
      classes: ``[T, N]`` per-frame integer class images.
    """
    num_features, num_voxels = data.shape
    assert num_voxels % SPAN == 0
    num_frames = ids.shape[0]
    from mass_tpu.ops.scatter import span_sorted_records

    ids_s, w_s, cls_s, starts = jax.vmap(
        functools.partial(span_sorted_records,
                          num_classes=num_features),
        in_axes=(0, 0, 0, None, None)
    )(ids, weights, classes.reshape(num_frames, -1), num_voxels, SPAN)

    pad = _round_up(ids_s.shape[1], CHUNK) + CHUNK - ids_s.shape[1]
    ids_s = jnp.pad(ids_s, ((0, 0), (0, pad)),
                    constant_values=num_voxels)
    w_s = jnp.pad(w_s, ((0, 0), (0, pad)))
    cls_s = jnp.pad(cls_s, ((0, 0), (0, pad)))

    # flat [T*R] record streams: Mosaic DMA slices must not cut the
    # tiled leading dim of a 2-D array, and R % CHUNK == 0 keeps every
    # frame-relative chunk offset aligned
    row_stride = ids_s.shape[1]
    ids_s = ids_s.reshape(-1)
    w_s = w_s.reshape(-1)
    cls_s = cls_s.reshape(-1)
    starts_stride = starts.shape[1]
    starts = starts.reshape(-1)

    n_spans = num_voxels // SPAN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_spans,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids
            pl.BlockSpec(memory_space=pl.ANY),  # w
            pl.BlockSpec(memory_space=pl.ANY),  # cls
            pl.BlockSpec(memory_space=pl.ANY),  # map
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK,), jnp.int32),
            pltpu.VMEM((2 * CHUNK,), jnp.float32),
            pltpu.VMEM((2 * CHUNK,), jnp.int32),
            pltpu.VMEM((num_features, SPAN), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        functools.partial(_frames_kernel, num_frames=num_frames,
                          num_features=num_features,
                          row_stride=row_stride,
                          starts_stride=starts_stride,
                          interpolation_weight=interpolation_weight,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, ids_s, w_s, cls_s, data)


def _multi_kernel(starts_ref,                        # scalar prefetch
                  ids_ref, w_ref, cls_ref, *refs,
                  blocks: tuple, interpolation_weights: tuple,
                  precision: str = "default"):
    """Multi-map grid step: one span of voxel ids across ALL maps.

    ``cls_ref`` carries every map's class id packed 8 bits apiece; the
    accumulator stacks each map's numerator block (``blocks[m]`` rows)
    followed by the shared W and S2 rows, so ONE augmented matmul per
    sub-block feeds every map's EMA blend.
    """
    num_maps = len(blocks)
    maps_in = refs[:num_maps]
    maps_out = refs[num_maps:2 * num_maps]
    rec_ids, rec_w, rec_cls = refs[2 * num_maps:2 * num_maps + 3]
    span_bufs = refs[2 * num_maps + 3:3 * num_maps + 3]
    sems = refs[3 * num_maps + 3]
    span_sems = refs[3 * num_maps + 4]
    acc_rows = sum(blocks) + 2

    i = pl.program_id(0)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    count = end - start
    aligned = (start // CHUNK) * CHUNK
    base = i * SPAN

    @pl.when(count > 0)
    def _process():
        loads = [pltpu.make_async_copy(
            maps_in[m].at[:, pl.ds(base, SPAN)], span_bufs[m],
            span_sems.at[m]) for m in range(num_maps)]
        for ld in loads:
            ld.start()

        n_chunks = (end - aligned + CHUNK - 1) // CHUNK

        def _copies(k, slot):
            off = pl.multiple_of(aligned + k * CHUNK, CHUNK)
            dst = pl.ds(pl.multiple_of(slot * CHUNK, CHUNK), CHUNK)
            return [
                pltpu.make_async_copy(
                    ids_ref.at[pl.ds(off, CHUNK)], rec_ids.at[dst],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    w_ref.at[pl.ds(off, CHUNK)], rec_w.at[dst],
                    sems.at[slot, 1]),
                pltpu.make_async_copy(
                    cls_ref.at[pl.ds(off, CHUNK)], rec_cls.at[dst],
                    sems.at[slot, 2]),
            ]

        def body(acc):
            acc[:] = jnp.zeros_like(acc)
            for c in _copies(0, 0):
                c.start()

            def chunk_body(k, _):
                slot = k % 2

                @pl.when(k + 1 < n_chunks)
                def _prefetch():
                    for c in _copies(k + 1, (k + 1) % 2):
                        c.start()

                for c in _copies(k, slot):
                    c.wait()

                sl = pl.ds(pl.multiple_of(slot * CHUNK, CHUNK), CHUNK)
                all_ids = rec_ids[sl]
                all_w = rec_w[sl]
                all_cls = rec_cls[sl]
                span_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (SUB, SPAN), 1)
                f_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (SUB, acc_rows), 1)
                sub_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (SUB, 1), 0)[:, 0]

                for s in range(CHUNK // SUB):
                    lo = s * SUB
                    block_lo = aligned + k * CHUNK + lo

                    @pl.when((block_lo < end) & (block_lo + SUB > start))
                    def _sub():
                        slots = jax.lax.slice(all_ids, (lo,),
                                              (lo + SUB,)) - base
                        g_idx = block_lo + sub_iota
                        valid = (g_idx >= start) & (g_idx < end)
                        onehot = jnp.where(
                            (slots[:, None] == span_iota)
                            & valid[:, None], 1.0, 0.0)

                        w = jax.lax.slice(all_w, (lo,), (lo + SUB,))
                        packed = jax.lax.slice(all_cls, (lo,),
                                               (lo + SUB,))
                        w2 = w * w
                        baug = jnp.where(f_iota == acc_rows - 2,
                                         w[:, None], 0.0)
                        baug = jnp.where(f_iota == acc_rows - 1,
                                         w2[:, None], baug)
                        off = 0
                        for m, fm in enumerate(blocks):
                            cls_m = (packed >> (8 * m)) & 0xFF
                            baug = jnp.where(
                                f_iota == off + cls_m[:, None],
                                w2[:, None], baug)
                            off += fm
                        acc[:] += jax.lax.dot_general(
                            baug, onehot, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_precision(precision))
                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

            w_sum = acc[acc_rows - 2, :]
            s2_sum = acc[acc_rows - 1, :]
            safe_w = jnp.maximum(w_sum, 1e-30)
            stores = []
            off = 0
            for m, fm in enumerate(blocks):
                iw = interpolation_weights[m]
                mult = jnp.where(w_sum > 0,
                                 1.0 - iw * s2_sum / safe_w, 1.0)
                add = (iw / safe_w)[None, :] * acc[off:off + fm, :]
                loads[m].wait()
                span_bufs[m][:] = span_bufs[m][:] * mult[None, :] + add
                store = pltpu.make_async_copy(
                    span_bufs[m], maps_out[m].at[:, pl.ds(base, SPAN)],
                    span_sems.at[m])
                store.start()
                stores.append(store)
                off += fm
            for store in stores:
                store.wait()

        pl.run_scoped(
            body, acc=pltpu.VMEM((acc_rows, SPAN), jnp.float32))


@functools.partial(jax.jit, static_argnums=(4,),
                   static_argnames=("interpret", "precision"))
def splat_onehot_multi_cmajor(datas, ids: jax.Array,
                              weights: jax.Array, classes,
                              interpolation_weights,
                              interpret: bool = False,
                              precision: str = "default"):
    """One-hot trilinear splat into SEVERAL channel-major ``[F_m, V]``
    maps in one kernel launch.

    All maps share the frame's binning (``ids``/``weights`` — one sorted
    record stream), differing only in the per-pixel class id; the
    per-record class ids are packed 8 bits per map into one int32 sort
    payload.  Per-map semantics are identical to ``splat_onehot_cmajor``
    map-by-map (the reference updates each projection layer separately
    per step — mass/nn/base_projection_layer.py:282-343; here the
    agent's whole per-step map group is one launch).

    Args:
      datas: tuple of ``[F_m, V]`` maps (same V, a SPAN multiple).
      ids / weights: ``[8N]`` shared corner contributions.
      classes: tuple of ``[N]`` int class images, one per map (F_m < 256,
        at most 4 maps).
      interpolation_weights: static tuple of per-map EMA weights.
    """
    datas = tuple(datas)
    classes = tuple(classes)
    num_maps = len(datas)
    assert 1 <= num_maps <= 4, "packed classes support at most 4 maps"
    num_voxels = datas[0].shape[1]
    assert num_voxels % SPAN == 0
    blocks = tuple(d.shape[0] for d in datas)
    for d, c in zip(datas, classes):
        assert d.shape[1] == num_voxels
        assert d.shape[0] < 256, "class ids must pack into 8 bits"
    from mass_tpu.ops.scatter import span_sorted_records

    packed = jnp.zeros(classes[0].reshape(-1).shape, jnp.int32)
    for m, c in enumerate(classes):
        packed = packed | (c.reshape(-1).astype(jnp.int32) << (8 * m))

    # with one map the "packed" ids are plain class ids bounded by its
    # feature count; multi-map packing spans 8*num_maps bits, which
    # only fits the int32 key for small grids (the helper falls back)
    ids_s, w_s, cls_s, starts = span_sorted_records(
        ids, weights, packed, num_voxels, SPAN,
        num_classes=(blocks[0] if num_maps == 1
                     else 1 << (8 * num_maps)))

    pad = _round_up(ids_s.shape[0], CHUNK) + CHUNK - ids_s.shape[0]
    ids_s = jnp.pad(ids_s, (0, pad), constant_values=num_voxels)
    w_s = jnp.pad(w_s, (0, pad))
    cls_s = jnp.pad(cls_s, (0, pad))

    n_spans = num_voxels // SPAN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_spans,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 + num_maps),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_maps,
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK,), jnp.int32),
            pltpu.VMEM((2 * CHUNK,), jnp.float32),
            pltpu.VMEM((2 * CHUNK,), jnp.int32),
        ] + [pltpu.VMEM((fm, SPAN), jnp.float32) for fm in blocks] + [
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((num_maps,)),
        ],
    )

    return pl.pallas_call(
        functools.partial(
            _multi_kernel, blocks=blocks,
            interpolation_weights=tuple(interpolation_weights),
            precision=precision),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(d.shape, d.dtype)
                   for d in datas],
        input_output_aliases={4 + m: m for m in range(num_maps)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, ids_s, w_s, cls_s, *datas)


@functools.partial(jax.jit, static_argnums=(4,),
                   static_argnames=("interpret", "fast_bf16",
                                    "precision"))
def splat_onehot_cmajor(data: jax.Array, ids: jax.Array,
                        weights: jax.Array, classes: jax.Array,
                        interpolation_weight: float = 0.5,
                        interpret: bool = False,
                        fast_bf16: bool = False,
                        precision: str = "default") -> jax.Array:
    """One-hot trilinear splat into a channel-major ``[F, V]`` map.

    Same semantics as ops.scatter.apply_onehot_cmajor; the map's V must
    be a multiple of SPAN (MapGeometry default sizes are).

    ``precision``: "default" = Mosaic's native lowering (single-pass
    bf16 matmul inputs, f32 accumulation — measured ~6.6e-3 max-rel
    map movement vs the XLA f32 scatter on chip); "highest" = true
    multi-pass f32 for reference-budget (1e-3) parity.  ``fast_bf16``
    casts inputs to bf16 explicitly — on-chip identical to "default"
    (kept to emulate on-chip numerics under interpret=True).
    """
    num_features, num_voxels = data.shape
    assert num_voxels % SPAN == 0, (
        f"num_voxels {num_voxels} must be a multiple of {SPAN}")
    from mass_tpu.ops.scatter import span_sorted_records

    ids_s, w_s, cls_s, starts = span_sorted_records(
        ids, weights, classes, num_voxels, SPAN,
        num_classes=num_features)

    # pad record arrays so aligned chunk DMAs never run past the end
    pad = _round_up(ids_s.shape[0], CHUNK) + CHUNK - ids_s.shape[0]
    ids_s = jnp.pad(ids_s, (0, pad), constant_values=num_voxels)
    w_s = jnp.pad(w_s, (0, pad))
    cls_s = jnp.pad(cls_s, (0, pad))

    n_spans = num_voxels // SPAN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_spans,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids
            pl.BlockSpec(memory_space=pl.ANY),  # w
            pl.BlockSpec(memory_space=pl.ANY),  # cls
            pl.BlockSpec(memory_space=pl.ANY),  # map (HBM, aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK,), jnp.int32),
            pltpu.VMEM((2 * CHUNK,), jnp.float32),
            pltpu.VMEM((2 * CHUNK,), jnp.int32),
            pltpu.VMEM((num_features, SPAN), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        functools.partial(_kernel, num_features=num_features,
                          interpolation_weight=interpolation_weight,
                          fast_bf16=fast_bf16, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
        input_output_aliases={4: 0},  # map input (after prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, ids_s, w_s, cls_s, data)
