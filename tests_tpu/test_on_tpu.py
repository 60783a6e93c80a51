"""Real-TPU regression tests: end-to-end bounds + miscompile sentinels.

(a) compresses 256 KiB and 2 MiB blobs end-to-end on the real backend
    and asserts round-trip + a pinned size bound;
(b) runs the seed program on TPU and asserts its per-block histograms
    and split points equal the CPU/interpret run bit-for-bit — the
    assertion that would have caught the r3/r4 seed-stats miscompile
    on day one (integer outputs of the fixed-cost parse: the DP sums
    small integer costs exactly in f32 on both backends, so any
    difference is a lowering bug, not float noise);
(c) runs the megafused program and the two-dispatch devseed path on
    the same master and asserts bit-identical exact block costs and
    identical final bytes — the assertion that caught the r5 mega
    prepare-gather miscompile (element-0 broadcast under fusion).
"""

import os
import zlib

import numpy as np
import pytest


def _blob(size: int) -> bytes:
    import zopfli_tpu  # noqa: F401  (path setup)
    srcs = []
    base = "/root/reference/src/zopfli"
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            p = os.path.join(base, name)
            if os.path.isfile(p):
                srcs.append(open(p, "rb").read())
    blob = b"".join(srcs) or b"fallback text " * 4096
    while len(blob) < size:
        blob += blob
    return blob[:size]


@pytest.mark.parametrize("size,max_ratio", [(256 << 10, 0.35),
                                            (2 << 20, 0.30)])
def test_end_to_end_tpu(size, max_ratio):
    import zopfli_tpu
    from zopfli_tpu import Options

    data = _blob(size)
    out = zopfli_tpu.compress(data, "gzip",
                              Options(engine="tpu", numiterations=15))
    assert zlib.decompress(out, 16 + 15) == data
    # Pinned bound: the 1 MiB bench blob compresses to ~0.22x; any
    # silent parse/stats corruption shows up as a ratio jump.
    assert len(out) < size * max_ratio, (len(out), size)


def test_seed_program_tpu_matches_cpu():
    import jax
    from zopfli_tpu.ops import seed as seed_mod

    data = np.frombuffer(_blob(768 << 10), np.uint8)  # > 512 KiB cap
    sr_tpu = seed_mod.seed_master(data, 0, len(data), 16,
                                  interpret=False)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sr_cpu = seed_mod.seed_master(data, 0, len(data), 16,
                                      interpret=True)
    assert sr_tpu.bounds == sr_cpu.bounds
    assert np.array_equal(sr_tpu.seed_ll, sr_cpu.seed_ll)
    assert np.array_equal(sr_tpu.seed_d, sr_cpu.seed_d)
    assert np.array_equal(sr_tpu.block_costs, sr_cpu.block_costs)


def test_mega_matches_two_dispatch():
    import zopfli_tpu
    from zopfli_tpu import Options
    from zopfli_tpu.ops import fused_engine, mega as mega_mod
    from zopfli_tpu.ops import seed as seed_mod

    data = np.frombuffer(_blob(1 << 20), np.uint8)
    iters = 15
    sr = seed_mod.seed_master(data, 0, len(data), 16, interpret=False)
    fs = fused_engine.FusedSqueeze(data, [(0, len(data), sr.bounds)],
                                   interpret=False,
                                   cand=[(sr.bp_len, sr.bp_dist)])
    _, cost_two, _, _ = fs.collect(fs.dispatch(sr.seed_ll, sr.seed_d,
                                               iters))
    mr = mega_mod.mega_finish(mega_mod.mega_dispatch(
        data, 0, len(data), 16, iters, interpret=False))
    assert mr.bounds == sr.bounds
    _, cost_mega, _, _ = mr.collect()
    assert np.array_equal(cost_two, cost_mega), (cost_two, cost_mega)

    # Full-pipeline bytes: mega on/off must agree exactly.
    opts = Options(engine="tpu", numiterations=iters)
    old = os.environ.get("ZT_MEGA")
    try:
        os.environ["ZT_MEGA"] = "0"
        out0 = zopfli_tpu.compress(bytes(data), "gzip", opts)
        os.environ["ZT_MEGA"] = "1"
        out1 = zopfli_tpu.compress(bytes(data), "gzip", opts)
    finally:
        if old is None:
            os.environ.pop("ZT_MEGA", None)
        else:
            os.environ["ZT_MEGA"] = old
    assert out0 == out1
    assert zlib.decompress(out1, 16 + 15) == bytes(data)
