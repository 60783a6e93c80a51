"""DEFLATE stream orchestration: master blocks, splitting, emission.

Semantics mirror the reference driver (src/zopfli/deflate.c:625-931):
1 MB master blocks processed with the previous bytes visible as LZ77
dictionary, two-phase block splitting, per-block btype choice with the
optional fixed-tree re-parse, and the empty-block / stored-block rules.
The parse engine is pluggable: the native host engine or the TPU kernel
pipeline (zopfli_tpu/ops) — master blocks are the data-parallel axis for
the device mesh (see zopfli_tpu/parallel).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from . import blocks, spec, squeeze, tree_encode
from .emit import BitStream, reverse_bits
from .entropy import lengths_to_symbols
from .lz77 import LZ77Store, concat_stores
from .utils.logging import Tracer


@dataclass
class Options:
    """Encoder options (reference src/zopfli/zopfli.h:33-64, util.c:28-35)."""
    verbose: bool = False
    verbose_more: bool = False
    numiterations: int = 15
    blocksplitting: bool = True
    blocksplittingmax: int = 15
    # Framework extensions (no reference counterpart):
    # "native" — C++ host engine (serial, bit-identical to reference)
    # "tpu"    — fused Pallas pipeline: device seed parse + split +
    #            all squeeze iterations in one dispatch
    # (ops.engine.TpuBlockEngine remains as a test-only oracle.)
    engine: str = "native"
    tracer: Optional[Tracer] = None
    # Master blocks are independent (32 KiB halo) and compress in
    # parallel across host threads / local devices; 0 = auto.
    workers: int = 1


def default_engine_factory(options: Options) -> Callable:
    # The fused TPU path drives its own parse; auxiliary per-block
    # engines (fixed-tree re-parse probes) run on the host.
    from . import native
    return native.BlockEngine


def default_greedy(options: Options) -> Callable:
    from . import native
    return native.greedy


def add_non_compressed_block(final: bool, data: np.ndarray, instart: int,
                             inend: int, out: BitStream) -> None:
    """Stored blocks, chunked at 65535 bytes (deflate.c:625-663)."""
    pos = instart
    while True:
        blocksize = min(65535, inend - pos)
        currentfinal = pos + blocksize >= inend
        nlen = (~blocksize) & 0xFFFF
        out.bits(1 if (final and currentfinal) else 0, 1)
        out.bits(0, 2)  # btype 00
        out.align_byte()
        header = bytes([blocksize & 0xFF, (blocksize >> 8) & 0xFF,
                        nlen & 0xFF, (nlen >> 8) & 0xFF])
        out.raw_bytes(header + data[pos : pos + blocksize].tobytes())
        if currentfinal:
            break
        pos += blocksize


def _emit_lz77_data(store: LZ77Store, lstart: int, lend: int,
                    ll_lengths, d_lengths, out: BitStream) -> None:
    """Vectorized symbol payload emission (reference AddLZ77Data).

    Per symbol, up to four fields: litlen code, length extra bits, dist
    code, dist extra bits.  Huffman codes are bit-reversed for LSB-first
    packing.
    """
    ll_syms = lengths_to_symbols(ll_lengths, 15)
    d_syms = lengths_to_symbols(d_lengths, 15)
    ll_lengths = np.asarray(ll_lengths, dtype=np.int64)
    d_lengths = np.asarray(d_lengths, dtype=np.int64)

    lit = store.litlens[lstart:lend]
    dist = store.dists[lstart:lend]
    lsym = store.ll_symbol[lstart:lend]
    dsym = store.d_symbol[lstart:lend]
    is_match = dist != 0
    n = len(lit)

    f_vals = np.zeros((n, 4), dtype=np.uint64)
    f_bits = np.zeros((n, 4), dtype=np.int64)

    # Field 0: litlen huffman code.
    code_len = ll_lengths[lsym]
    f_vals[:, 0] = reverse_bits(ll_syms[lsym], code_len.astype(np.uint32))
    f_bits[:, 0] = code_len
    # Field 1: length extra bits (matches only).
    lit_clip = np.minimum(lit, 258)
    f_vals[:, 1] = np.where(is_match, spec.LENGTH_EXTRA_VALUE[lit_clip], 0)
    f_bits[:, 1] = np.where(is_match, spec.LENGTH_EXTRA_BITS[lit_clip], 0)
    # Field 2: dist huffman code (matches only).
    dlen = np.where(is_match, d_lengths[dsym], 0)
    f_vals[:, 2] = np.where(is_match,
                            reverse_bits(d_syms[dsym], dlen.astype(np.uint32)),
                            0)
    f_bits[:, 2] = dlen
    # Field 3: dist extra bits (matches only).
    dist_clip = np.maximum(dist, 1)
    f_vals[:, 3] = np.where(is_match, spec.dist_extra_value(dist_clip), 0)
    f_bits[:, 3] = np.where(is_match, spec.dist_extra_bits(dist_clip), 0)

    out.bits(f_vals.reshape(-1), f_bits.reshape(-1))


def add_lz77_block(options: Options, btype: int, final: bool,
                   store: LZ77Store, lstart: int, lend: int,
                   out: BitStream) -> None:
    """Emit one fixed or dynamic block (deflate.c:682-745)."""
    if btype == 0:
        length = store.byte_range(lstart, lend)
        pos = 0 if lstart == lend else int(store.pos[lstart])
        add_non_compressed_block(final, store.data, pos, pos + length, out)
        return

    out.bits(1 if final else 0, 1)
    out.bits(btype & 1, 1)
    out.bits((btype & 2) >> 1, 1)

    if btype == 1:
        ll_lengths, d_lengths = spec.fixed_tree_lengths()
    else:
        _, ll_lengths, d_lengths = blocks.get_dynamic_lengths(store, lstart, lend)
        tree_encode.add_dynamic_tree(ll_lengths, d_lengths, out)

    _emit_lz77_data(store, lstart, lend, ll_lengths, d_lengths, out)
    # End symbol.
    ll_syms = lengths_to_symbols(ll_lengths, 15)
    out.bits(int(reverse_bits([ll_syms[256]], [int(ll_lengths[256])])[0]),
             int(ll_lengths[256]))


def add_lz77_block_auto_type(options: Options, final: bool, store: LZ77Store,
                             lstart: int, lend: int, out: BitStream,
                             engine_factory) -> None:
    """Choose btype by exact cost, with fixed re-parse probe (deflate.c:747)."""
    uncompressedcost = blocks.calculate_block_size(store, lstart, lend, 0)
    fixedcost = blocks.calculate_block_size(store, lstart, lend, 1)
    dyncost = blocks.calculate_block_size(store, lstart, lend, 2)

    # Re-parse under the fixed-tree cost model when it might win.
    expensivefixed = (store.size < 1000) or fixedcost <= dyncost * 1.1

    if lstart == lend:
        # Smallest empty block: fixed block with only the end symbol.
        out.bits(1 if final else 0, 1)
        out.bits(1, 2)
        out.bits(0, 7)
        return

    fixedstore = None
    if expensivefixed:
        instart = int(store.pos[lstart])
        inend = instart + store.byte_range(lstart, lend)
        engine = engine_factory(store.data, instart, inend)
        fixedstore = squeeze.lz77_optimal_fixed(engine, store.data, instart,
                                                inend)
        fixedcost = blocks.calculate_block_size(fixedstore, 0,
                                                fixedstore.size, 1)
        if hasattr(engine, "close"):
            engine.close()

    if uncompressedcost < fixedcost and uncompressedcost < dyncost:
        add_lz77_block(options, 0, final, store, lstart, lend, out)
    elif fixedcost < dyncost:
        if fixedstore is not None:
            add_lz77_block(options, 1, final, fixedstore, 0, fixedstore.size,
                           out)
        else:
            add_lz77_block(options, 1, final, store, lstart, lend, out)
    else:
        add_lz77_block(options, 2, final, store, lstart, lend, out)


def _use_devseed(options: Options) -> bool:
    """TPU engine seeds/splits on device by default (ZT_SEED=greedy
    restores the host-greedy path for A/B comparison)."""
    import os as _os
    return _os.environ.get("ZT_SEED", "device") == "device"


def tpu_master_size() -> int:
    """Master-block size for the TPU path (bytes).

    The reference uses 1e6-byte masters purely for memory boundedness
    (util.h:52-60).  The TPU path uses a power of two so masters tile
    the kernel lane geometry exactly (TILE | master size) and the
    common 1 MiB input is ONE master; larger values amortize the
    per-master seed program over more bytes (ZT_MASTER_SIZE).
    """
    import os as _os
    return int(_os.environ.get("ZT_MASTER_SIZE", str(1 << 20)))


def scaled_maxblocks(options: Options, nbytes: int) -> int:
    """blocksplittingmax scaled to preserve the reference's split
    density (15 blocks per 1e6-byte part, deflate.c:811-906) when TPU
    masters are larger than the reference's."""
    if not options.blocksplitting:
        return 1
    mb = options.blocksplittingmax
    if nbytes > spec.MASTER_BLOCK_SIZE:
        mb = -(-mb * nbytes // spec.MASTER_BLOCK_SIZE)
    return mb


def _seed_maxblocks(options: Options, nbytes: int = 0) -> int:
    return scaled_maxblocks(options, nbytes)


def _devseed_trace(tracer, entry):
    """Per-block iteration hook factory over a devseed entry."""
    if tracer is None or entry[2] is None:
        return None
    fs = entry[2]
    hooks = [tracer.block_iteration_hook(bs, be)
             for (bs, be) in fs.block_bounds]
    return lambda b, i, cost: hooks[b](i, cost)


def split_master(options: Options, data: np.ndarray, instart: int,
                 inend: int, greedy_fn) -> list[int]:
    """Block-split of one master -> bounds incl. endpoints.

    The TPU engine runs the split search on device (ops.devsplit, an
    exact reproduction of ZopfliBlockSplitLZ77 — differential-tested
    against the host splitter); other engines use the host splitter.
    Set ZT_DEVICE_SPLIT=0/1 to override.
    """
    import os as _os

    if not options.blocksplitting:
        return [instart, inend]
    maxblocks = scaled_maxblocks(options, inend - instart)
    use_dev = _os.environ.get("ZT_DEVICE_SPLIT")
    if use_dev is None:
        use_dev = "1" if options.engine == "tpu" else "0"
    if use_dev == "1":
        from .lz77 import LZ77Store
        from .ops.devsplit import block_split_lz77_device

        litlens, dists = greedy_fn(data, instart, inend)
        store = LZ77Store(data, litlens, dists, instart)
        lz77_points = block_split_lz77_device(
            litlens.astype(np.int32), dists.astype(np.int32), maxblocks)
        pts = [int(store.pos[p]) for p in lz77_points]
    else:
        pts = blocks.block_split(data, instart, inend,
                                 maxblocks, greedy_fn)
    return [instart] + pts + [inend]


def deflate_part(options: Options, btype: int, final: bool, data: np.ndarray,
                 instart: int, inend: int, out: BitStream,
                 engine_factory=None, greedy_fn=None) -> None:
    """Compress one master block (deflate.c:811-906)."""
    engine_factory = engine_factory or default_engine_factory(options)
    greedy_fn = greedy_fn or default_greedy(options)
    tracer = options.tracer

    if btype == 0:
        add_non_compressed_block(final, data, instart, inend, out)
        return
    if btype == 1:
        engine = engine_factory(data, instart, inend)
        store = squeeze.lz77_optimal_fixed(engine, data, instart, inend)
        add_lz77_block(options, 1, final, store, 0, store.size, out)
        if hasattr(engine, "close"):
            engine.close()
        return

    if options.engine == "tpu" and inend > instart and _use_devseed(options):
        from .squeeze_batched import devseed_collect, devseed_dispatch
        entry = devseed_dispatch(data, [(instart, inend)],
                                 options.numiterations,
                                 _seed_maxblocks(options, inend - instart),
                                 mesh=local_mesh())
        results = devseed_collect(entry, options.numiterations,
                                  trace=_devseed_trace(tracer, entry))
        emit_results(options, data, [(instart, inend, final)], results,
                     lambda i: out, lambda i: engine_factory)
        return

    bounds = split_master(options, data, instart, inend, greedy_fn)
    if options.engine == "tpu":
        from .squeeze_batched import lz77_optimal_fused
        trace = None
        if tracer is not None:
            hooks = [tracer.block_iteration_hook(bounds[i], bounds[i + 1])
                     for i in range(len(bounds) - 1)]
            trace = lambda b, i, cost: hooks[b](i, cost)
        if inend > instart:
            stores = lz77_optimal_fused(
                data, [(instart, inend, bounds)], options.numiterations,
                greedy_fn, trace=trace, mesh=local_mesh())[0]
        else:
            from .lz77 import LZ77Store as _S
            stores = [_S(data, np.zeros(0, np.uint16),
                         np.zeros(0, np.uint16), instart)]
    else:
        stores = []
        for i in range(len(bounds) - 1):
            start, end = bounds[i], bounds[i + 1]
            engine = engine_factory(data, start, end)
            trace = None
            if tracer is not None:
                trace = tracer.block_iteration_hook(start, end)
            st = squeeze.lz77_optimal(engine, data, start, end,
                                      options.numiterations, greedy_fn,
                                      trace=trace)
            if hasattr(engine, "close"):
                engine.close()
            stores.append(st)

    finish_part(options, final, stores, out, engine_factory)


def _block_split_lz77_device(lz77, maxblocks: int) -> list[int]:
    """Reference split search over an LZ77 store, on device (ops.devsplit).

    Thin alias of the differential-tested devsplit wrapper (the pow2
    capacity floor only bounds the compiled shape set; results are
    capacity-independent).
    """
    from .ops import devsplit as _ds

    return _ds.block_split_lz77_device(
        lz77.litlens.astype(np.int32), lz77.dists.astype(np.int32),
        maxblocks, floor=1024)


def prepare_second_split(options: Options, stores: list):
    """Async prep for finish_part: queue the device second-split search.

    Returns (lz77, handle) to pass as finish_part's presplit — the
    device search runs while the host does other emission work.
    """
    from .ops import devsplit as _ds

    lz77 = concat_stores(stores)
    handle = None
    if options.blocksplitting and len(stores) > 2:
        handle = _ds.block_split_lz77_device_dispatch(
            lz77.litlens.astype(np.int32), lz77.dists.astype(np.int32),
            scaled_maxblocks(options, lz77.byte_range(0, lz77.size)),
            floor=1024)
    return lz77, handle


def emit_results(options: Options, data: np.ndarray, chunk, results,
                 out_for, factory_for) -> None:
    """Emit one devseed chunk's results, overlapping the device
    second-split searches with the host's per-master emission.

    chunk: [(start, end, fin, ...)]; results from devseed_collect.
    out_for(i) -> BitStream; factory_for(i) -> engine factory.
    """
    def presplit_for(res):
        if res[0] != "stores" or options.engine != "tpu":
            return None
        if len(res) > 2 and res[2] is not None:
            # Megafused masters computed the whole second-split attempt
            # (search + both cost totals) inside the main dispatch.
            return ("decision", res[2])
        return prepare_second_split(options, res[1])

    presplits = [presplit_for(res) for res in results]
    for i, (m, res, ps) in enumerate(zip(chunk, results, presplits)):
        start, end, fin = m[0], m[1], m[2]
        if res[0] == "stored":
            add_non_compressed_block(fin, data, start, end, out_for(i))
        else:
            finish_part(options, fin, res[1], out_for(i), factory_for(i),
                        presplit=ps)


def finish_part(options: Options, final: bool, stores: list,
                out: BitStream, engine_factory, presplit=None) -> None:
    """Second split attempt + emission for one master's parsed blocks.

    presplit: optional (lz77, device handle) from prepare_second_split
    (the device search then overlaps the host cost pass below).
    """
    from .ops import devsplit as _ds

    tracer = options.tracer
    totalcost = 0.0
    splitpoints = []
    acc = 0
    for i, st in enumerate(stores):
        totalcost += blocks.calculate_block_size_auto_type(st, 0, st.size)
        acc += st.size
        if i + 1 < len(stores):
            splitpoints.append(acc)

    if presplit is not None and presplit[0] == "decision":
        # Megafused path: the search AND both exact cost totals were
        # computed on device inside the main dispatch.
        sp2, tc1, tc2 = presplit[1]
        lz77 = concat_stores(stores)
        if options.blocksplitting and len(splitpoints) > 1 and tc2 < tc1:
            splitpoints = sp2
        presplit = None
        bounds = [0] + splitpoints + [lz77.size]
        for i in range(len(bounds) - 1):
            add_lz77_block_auto_type(options,
                                     (i == len(bounds) - 2) and final,
                                     lz77, bounds[i], bounds[i + 1], out,
                                     engine_factory)
            if tracer is not None:
                tracer.block_done(bounds[i], bounds[i + 1], out.nbits)
        return

    lz77 = presplit[0] if presplit is not None else concat_stores(stores)

    # Second splitting attempt on the optimal parse (deflate.c:872-893).
    if options.blocksplitting and len(splitpoints) > 1:
        if presplit is not None:
            splitpoints2 = _ds.block_split_lz77_device_collect(presplit[1])
        elif options.engine == "tpu":
            # Same search on device (ops.devsplit, differential-tested
            # against the host splitter): one dispatch instead of ~0.25
            # s/MiB of host FindMinimum probes through the native cost
            # context.
            splitpoints2 = _block_split_lz77_device(
                lz77, scaled_maxblocks(options, lz77.byte_range(0,
                                                                lz77.size)))
        else:
            splitpoints2 = blocks.block_split_lz77(
                lz77, options.blocksplittingmax)
        totalcost2 = 0.0
        bounds2 = [0] + splitpoints2 + [lz77.size]
        for i in range(len(bounds2) - 1):
            totalcost2 += blocks.calculate_block_size_auto_type(
                lz77, bounds2[i], bounds2[i + 1])
        if totalcost2 < totalcost:
            splitpoints = splitpoints2

    bounds = [0] + splitpoints + [lz77.size]
    for i in range(len(bounds) - 1):
        add_lz77_block_auto_type(options, (i == len(bounds) - 2) and final,
                                 lz77, bounds[i], bounds[i + 1], out,
                                 engine_factory)
        if tracer is not None:
            tracer.block_done(bounds[i], bounds[i + 1], out.nbits)


def deflate(options: Options, btype: int, final: bool, data: np.ndarray,
            out: BitStream, engine_factory=None, greedy_fn=None) -> None:
    """Full DEFLATE stream over 1 MB master blocks (deflate.c:908-931).

    Master blocks are mutually independent here (each sees the previous
    bytes only as its LZ77 window halo), so with options.workers != 1
    they compress concurrently and their bitstreams are spliced in
    order — the data-parallel axis of SURVEY.md §5.
    """
    data = np.ascontiguousarray(np.frombuffer(bytes(data), dtype=np.uint8)
                                if not isinstance(data, np.ndarray) else data)
    insize = len(data)
    msize = (tpu_master_size() if options.engine == "tpu"
             else spec.MASTER_BLOCK_SIZE)
    masters = []
    i = 0
    while True:
        masterfinal = i + msize >= insize
        size = insize - i if masterfinal else msize
        masters.append((i, i + size, final and masterfinal))
        i += size
        if i >= insize:
            break

    if options.engine == "tpu" and btype == 2 and len(masters) > 1:
        _deflate_fused_masters(options, data, masters, out,
                               engine_factory or
                               default_engine_factory(options),
                               greedy_fn or default_greedy(options))
        return

    workers = options.workers
    if workers == 0:
        import os as _os
        workers = min(len(masters), _os.cpu_count() or 1)
    if workers <= 1 or len(masters) <= 1:
        for (start, end, fin) in masters:
            deflate_part(options, btype, fin, data, start, end, out,
                         engine_factory, greedy_fn)
        return

    from concurrent.futures import ThreadPoolExecutor

    # On multi-device hosts, round-robin masters over local devices:
    # each worker's device work lands on its master's chip (the
    # data-parallel axis of SURVEY.md §5; no collectives needed).
    devices = None
    if options.engine == "tpu":
        import jax
        devs = jax.local_devices()
        if len(devs) > 1:
            devices = devs

    def work(im):
        i, (start, end, fin) = im
        part = BitStream()
        if devices is not None:
            import jax
            with jax.default_device(devices[i % len(devices)]):
                deflate_part(options, btype, fin, data, start, end, part,
                             engine_factory, greedy_fn)
        else:
            deflate_part(options, btype, fin, data, start, end, part,
                         engine_factory, greedy_fn)
        return part

    with ThreadPoolExecutor(max_workers=workers) as ex:
        parts = list(ex.map(work, enumerate(masters)))
    for part in parts:
        out.extend(part)


def _deflate_fused_masters(options: Options, data: np.ndarray, masters,
                           out: BitStream, engine_factory,
                           greedy_fn) -> None:
    """Batched TPU path: all masters' tiles share the fused device loop.

    Masters are grouped into device batches (ZT_BATCH_MASTERS, default
    8) to bound HBM use; host splitting of batch N+1 runs while host
    emission of batch N is pending only in the trivial sense for now —
    the device sees one dispatch per batch.
    """
    import os as _os

    from .squeeze_batched import lz77_optimal_fused

    from .ops import fused_engine

    mesh = local_mesh()
    # Chunk masters by estimated tile count so batches fill the bucketed
    # lane-group geometry (ngroups rounds up to a power of two; a batch
    # just over a bucket boundary would waste half its lanes).
    budget = int(_os.environ.get(
        "ZT_TILE_BUDGET", str(4 * fused_engine.LANES)))
    chunks: list[list] = [[]]
    acc = 0
    for m in masters:
        start, end, _fin = m
        # Upper bound: block splitting adds at most blocksplittingmax-1
        # partial tiles on top of the unsplit tile count.
        est = (-(-(end - start) // fused_engine.TILE)
               + scaled_maxblocks(options, end - start) + 1)
        if chunks[-1] and acc + est > budget:
            chunks.append([])
            acc = 0
        chunks[-1].append(m)
        acc += est
    # Software pipeline: while the device runs chunk N's fused loop,
    # the host splits/seeds chunk N+1 and then emits chunk N-1 — the
    # serial host work hides under device compute at corpus scale.
    if _use_devseed(options):
        from .squeeze_batched import (devseed_collect, devseed_dispatch,
                                      devseed_fire)

        pending = None  # (chunk, entry)

        def emit_ds(p):
            chunk, entry = p
            results = devseed_collect(entry, options.numiterations,
                                      trace=_devseed_trace(options.tracer,
                                                           entry))
            emit_results(options, data, chunk, results,
                         lambda i: out, lambda i: engine_factory)

        # Software pipeline: queue chunk N's seed programs, emit chunk
        # N-1 (host) while the device runs them, then sync seeds and
        # queue chunk N's squeeze.  Host emission hides under the
        # device's seed phase instead of leaving it idle.
        for chunk in chunks:
            ranges = [(start, end) for (start, end, _fin) in chunk]
            mb = max(_seed_maxblocks(options, end - start)
                     for (start, end, _fin) in chunk)
            fired = devseed_fire(data, ranges, mb, mesh=mesh,
                                 numiterations=options.numiterations)
            if pending is not None:
                emit_ds(pending)
            entry = devseed_dispatch(data, ranges, options.numiterations,
                                     mb, mesh=mesh, fired=fired)
            pending = (chunk, entry)
        emit_ds(pending)
        return

    from .squeeze_batched import fused_collect, fused_dispatch

    pending = None  # (chunk, fs, handle)

    def emit(entry):
        chunk, fs, handle = entry
        all_stores = fused_collect(fs, handle, options.numiterations)
        for (start, end, fin), stores in zip(chunk, all_stores):
            finish_part(options, fin, stores, out, engine_factory)

    for chunk in chunks:
        specs = [(start, end,
                  split_master(options, data, start, end, greedy_fn))
                 for (start, end, _fin) in chunk]
        fs, handle = fused_dispatch(data, specs, options.numiterations,
                                    greedy_fn, mesh=mesh)
        if pending is not None:
            emit(pending)
        pending = (chunk, fs, handle)
    emit(pending)


def deflate_many(options: Options, data: np.ndarray, blob_ranges,
                 outs: list[BitStream]) -> None:
    """Compress many independent inputs in shared fused device batches.

    data concatenates the inputs; blob_ranges[i] = (start, end) of
    input i, whose raw DEFLATE stream is emitted into outs[i].  All
    inputs' masters share the fused engine's lane groups (one device
    dispatch covers many small files — the reference's only analog is
    the CLI's sequential per-file loop, zopfli_bin.c:191-211), with the
    LZ77 window clamped at each input's start.
    """
    import os as _os

    from .ops import fused_engine
    from .squeeze_batched import devseed_collect, devseed_dispatch

    engine_factory = default_engine_factory(options)
    msize = tpu_master_size()
    masters = []            # (start, end, final, blob_idx)
    for bi, (bs, be) in enumerate(blob_ranges):
        i = bs
        while True:
            fin = i + msize >= be
            size = (be - i) if fin else msize
            masters.append((i, i + size, fin, bi))
            i += size
            if i >= be:
                break

    budget = int(_os.environ.get(
        "ZT_TILE_BUDGET", str(4 * fused_engine.LANES)))
    chunks: list[list] = [[]]
    acc = 0
    for m in masters:
        start, end = m[0], m[1]
        est = (-(-(end - start) // fused_engine.TILE)
               + scaled_maxblocks(options, end - start) + 1)
        if chunks[-1] and acc + est > budget:
            chunks.append([])
            acc = 0
        chunks[-1].append(m)
        acc += est

    pending = None
    blob_start = {bi: bs for bi, (bs, be) in enumerate(blob_ranges)}

    def blob_factory(bi):
        """Auxiliary host engines (fixed re-parse probes) must not see
        bytes before this input's start — clamp via a view."""
        bs = blob_start[bi]
        if bs == 0:
            return engine_factory
        return lambda d, s, e: engine_factory(d[bs:], s - bs, e - bs)

    def emit_ds(p):
        chunk, entry = p
        results = devseed_collect(entry, options.numiterations,
                                  trace=_devseed_trace(options.tracer,
                                                       entry))
        emit_results(options, data, chunk, results,
                     lambda i: outs[chunk[i][3]],
                     lambda i: blob_factory(chunk[i][3]))

    from .squeeze_batched import devseed_fire

    mesh = local_mesh()
    for chunk in chunks:
        ranges = [(start, end) for (start, end, _f, _b) in chunk]
        wstarts = [blob_start[bi] for (_s, _e, _f, bi) in chunk]
        mb = max(_seed_maxblocks(options, end - start)
                 for (start, end) in ranges)
        fired = devseed_fire(data, ranges, mb, window_starts=wstarts,
                             mesh=mesh,
                             numiterations=options.numiterations)
        if pending is not None:
            emit_ds(pending)
        entry = devseed_dispatch(data, ranges, options.numiterations, mb,
                                 mesh=mesh, window_starts=wstarts,
                                 fired=fired)
        pending = (chunk, entry)
    emit_ds(pending)


_LOCAL_MESH = [False]  # False = not yet built; None/Mesh once built


def local_mesh():
    """1-D mesh over local devices for the fused engine, or None.

    Single-device hosts skip shard_map entirely (identical math, no
    collective); multi-device hosts shard the fused loop's group axis
    over all local devices (SURVEY §5 data-parallel axis).
    """
    if _LOCAL_MESH[0] is not False:
        return _LOCAL_MESH[0]
    import jax

    devs = jax.local_devices()
    if len(devs) <= 1:
        _LOCAL_MESH[0] = None
    else:
        from .parallel import dist
        _LOCAL_MESH[0] = dist.make_mesh(len(devs))
    return _LOCAL_MESH[0]
