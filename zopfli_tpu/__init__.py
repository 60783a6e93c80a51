"""tpu-zopfli: a TPU-native Zopfli-class DEFLATE/zlib/gzip encoder.

Public API (the analogue of the reference's ZopfliCompress,
src/zopfli/zopfli.h:66-88 / zopfli_lib.c:28-42):

    import zopfli_tpu
    out = zopfli_tpu.compress(data, fmt="gzip", options=...)

Formats: "gzip" (RFC 1952), "zlib" (RFC 1950), "deflate" (raw RFC 1951).
Every output decompresses bit-for-bit to the input with stock zlib.
"""

from __future__ import annotations

import os

# Persistent XLA compile cache: the Pallas DP kernel costs minutes to
# compile cold but milliseconds to load back.  Set before jax import.
# The dir is keyed by host CPU features: XLA:CPU AOT cache entries are
# NOT machine-feature-checked on load, and replaying entries compiled
# on a different host makes later compiles hang for minutes.
def _cache_dir() -> str:
    import hashlib
    key = "nocpuinfo"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = hashlib.sha256(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    return os.path.expanduser(f"~/.cache/zopfli_tpu_xla_{key}")


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from . import containers
from .deflate import Options, deflate
from .emit import BitStream

__version__ = "0.1.0"

FORMATS = ("gzip", "zlib", "deflate")


def _as_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray) and data.dtype == np.uint8:
        return np.ascontiguousarray(data)
    return np.frombuffer(bytes(data), dtype=np.uint8)


def deflate_raw(data, options: Options | None = None) -> bytes:
    options = options or Options()
    data = _as_u8(data)
    out = BitStream()
    deflate(options, 2, True, data, out)
    return out.getvalue()


def _multihost_active() -> bool:
    """True inside an initialized multi-process jax.distributed cluster."""
    import sys
    jax = sys.modules.get("jax")
    if jax is None:
        return False
    try:
        return jax.process_count() > 1
    except Exception:
        return False


def compress(data, fmt: str = "gzip", options: Options | None = None) -> bytes:
    """Compress `data` into the requested container format.

    Inside a multi-process `jax.distributed` cluster this auto-routes
    to `parallel.multihost.compress_multihost` (master blocks sharded
    over processes; bytes returned on process 0, None elsewhere) —
    every process must call it with identical data.
    """
    options = options or Options()
    data = _as_u8(data)
    if _multihost_active():
        from .parallel.multihost import compress_multihost
        return compress_multihost(data, fmt, options)
    if fmt == "deflate":
        payload = deflate_raw(data, options)
        result = payload
    elif fmt == "gzip":
        crc = containers.crc32(data)
        payload = deflate_raw(data, options)
        result = containers.gzip_frame(payload, crc, len(data))
    elif fmt == "zlib":
        adler = containers.adler32(data)
        payload = deflate_raw(data, options)
        result = containers.zlib_frame(payload, adler)
    else:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if options.tracer is not None:
        options.tracer.summary(len(data), len(result), fmt)
    return result


def compress_many(blobs, fmt: str = "gzip",
                  options: Options | None = None) -> list[bytes]:
    """Compress many independent inputs, batched on device.

    With the TPU engine, all inputs' master blocks share the fused
    engine's lane groups — one device dispatch serves many small files
    instead of paying per-file dispatch latency (the reference's only
    analog is the CLI's sequential file loop, zopfli_bin.c:191-211).
    Other engines compress sequentially.  Returns one container per
    input, same semantics as compress().
    """
    options = options or Options()
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    blobs = [_as_u8(b) for b in blobs]
    if options.engine != "tpu" or _multihost_active():
        return [compress(b, fmt, options) for b in blobs]

    from .deflate import deflate_many

    # Empty inputs take the scalar path (fixed empty block rules).
    idx = [i for i, b in enumerate(blobs) if len(b)]
    results: list[bytes | None] = [None] * len(blobs)
    for i, b in enumerate(blobs):
        if not len(b):
            results[i] = compress(b, fmt, options)
    if idx:
        data = np.concatenate([blobs[i] for i in idx])
        ranges = []
        pos = 0
        for i in idx:
            ranges.append((pos, pos + len(blobs[i])))
            pos += len(blobs[i])
        outs = [BitStream() for _ in idx]
        deflate_many(options, data, ranges, outs)
        for k, i in enumerate(idx):
            payload = outs[k].getvalue()
            b = blobs[i]
            if fmt == "deflate":
                results[i] = payload
            elif fmt == "gzip":
                results[i] = containers.gzip_frame(
                    payload, containers.crc32(b), len(b))
            else:
                results[i] = containers.zlib_frame(
                    payload, containers.adler32(b))
    return results


_WARMED: set = set()


def warmup(sizes=(1 << 20,), options: Options | None = None,
           background: bool = False):
    """Pre-compile the TPU kernel geometry for the given input sizes.

    First use of each input-size bucket pays the Pallas/XLA compiles
    (minutes on a remote-compile TPU transport, where the persistent
    cache cannot capture the kernels — see README).  Call warmup() once
    at startup, or with background=True to compile on a thread while
    the host does other work (returns the Thread; join() it before
    timing anything).

    sizes: input byte lengths to warm (each size bucket — pow2 master
    capacity, lane-group count — is a distinct compile).
    """
    options = options or Options(engine="tpu")
    rng = np.random.default_rng(12345)
    words = [b"the ", b"warm ", b"up ", b"corpus ", b"for ", b"kernel ",
             b"shapes ", b"only "]

    def run():
        for size in sizes:
            key = (size, options.numiterations, options.engine)
            if key in _WARMED:
                continue
            blob = b"".join(
                words[i] for i in rng.integers(0, len(words),
                                               size // 5 + 2))[:size]
            compress(blob, "gzip", options)
            _WARMED.add(key)

    if background:
        import threading
        t = threading.Thread(target=run, name="zopfli-tpu-warmup",
                             daemon=True)
        t.start()
        return t
    run()
    return None


def gzip_compress(data, options: Options | None = None) -> bytes:
    return compress(data, "gzip", options)


def zlib_compress(data, options: Options | None = None) -> bytes:
    return compress(data, "zlib", options)
