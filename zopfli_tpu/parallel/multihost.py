"""Multi-host distributed compression over jax.distributed.

The reference is a single process (SURVEY.md §2 checklist); scale-out
here follows SURVEY.md §5: master blocks are data-parallel across
processes (each sees its 32 KiB halo), per-master checksums are
computed locally and merged with crc32_combine/adler32_combine, and the
variable-length bit-aligned part streams are gathered IN ORDER on
process 0 over DCN (process_allgather of padded byte blobs) and spliced
— non-final parts end byte-misaligned, which BitStream.extend resolves.

Single-process calls degrade to the local parallel driver, so this
module is exercised by the regular test suite; multi-process runs need
`jax.distributed.initialize()` in the launcher.
"""

from __future__ import annotations

import pickle

import numpy as np

from .. import containers, spec
from ..deflate import Options, deflate_part
from ..emit import BitStream


def _masters(insize: int):
    out = []
    i = 0
    while True:
        final = i + spec.MASTER_BLOCK_SIZE >= insize
        size = insize - i if final else spec.MASTER_BLOCK_SIZE
        out.append((i, i + size, final))
        i += size
        if i >= insize:
            break
    return out


def _allgather_bytes(blob: bytes) -> list[bytes]:
    """All-gather one variable-length byte blob per process."""
    import jax
    if jax.process_count() == 1:
        return [blob]
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    n = jax.process_count()
    lens = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(np.array([len(blob)], np.int64)))).reshape(n)
    maxlen = int(lens.max())
    buf = np.zeros(maxlen, np.uint8)
    buf[:len(blob)] = np.frombuffer(blob, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(buf))).reshape(n, maxlen)
    return [gathered[i, :int(lens[i])].tobytes() for i in range(n)]


def compress_multihost(data, fmt: str = "gzip",
                       options: Options | None = None) -> bytes | None:
    """Compress `data` with master blocks sharded over all processes.

    Every process must pass identical `data` (or at least the bytes of
    its own masters plus their 32 KiB halos at the same offsets).
    Returns the container bytes on process 0, None elsewhere.
    """
    import jax

    options = options or Options()
    arr = np.ascontiguousarray(np.frombuffer(bytes(data), dtype=np.uint8)
                               if not isinstance(data, np.ndarray) else data)
    pid = jax.process_index()
    nproc = jax.process_count()
    masters = _masters(len(arr))

    local = []
    for j, (start, end, final) in enumerate(masters):
        if j % nproc != pid:
            continue
        part = BitStream()
        deflate_part(options, 2, final, arr, start, end, part)
        entry = {
            "idx": j,
            "segments": part._segments,
            "crc": containers.crc32(arr[start:end]),
            "adler": containers.adler32(arr[start:end]),
            "nbytes": end - start,
        }
        local.append(entry)

    blobs = _allgather_bytes(pickle.dumps(local))
    if pid != 0:
        return None

    entries = sorted((e for b in blobs for e in pickle.loads(b)),
                     key=lambda e: e["idx"])
    assert [e["idx"] for e in entries] == list(range(len(masters)))

    out = BitStream()
    crc = 0
    adler = 1
    for e in entries:
        part = BitStream()
        part._segments = e["segments"]  # extend() replays segments only
        out.extend(part)
        crc = containers.crc32_combine(crc, e["crc"], e["nbytes"])
        adler = containers.adler32_combine(adler, e["adler"], e["nbytes"])

    payload = out.getvalue()
    if fmt == "deflate":
        return payload
    if fmt == "gzip":
        return containers.gzip_frame(payload, crc, len(arr))
    if fmt == "zlib":
        return containers.zlib_frame(payload, adler)
    raise ValueError(f"unknown format {fmt!r}")
