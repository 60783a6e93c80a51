"""Device-mesh pipeline tests on the virtual CPU mesh (8 devices)."""

import numpy as np
import pytest

import jax

from zopfli_tpu.parallel import dist


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_pipeline_matches_unsharded():
    cap = 2048
    rng = np.random.default_rng(2)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta "]
    text = b"".join(words[i] for i in rng.integers(0, 4, 6000))
    data = np.frombuffer(text[: 8 * cap], dtype=np.uint8)
    ranges = [(i * cap, (i + 1) * cap) for i in range(8)]
    bufs, min_pos, inend = dist.pack_blocks(data, ranges, cap)
    ll = np.full((8, 288), 8.0, dtype=np.float32)
    dd = np.full((8, 32), 5.0, dtype=np.float32)

    cl0, cd0, cost0 = dist.block_pipeline(bufs, cap, min_pos, inend, ll, dd)

    mesh = dist.make_mesh(8)
    fn = dist.sharded_pipeline(mesh, cap)
    cl1, cd1, cost1, total = fn(bufs, min_pos, inend, ll, dd)

    np.testing.assert_array_equal(np.asarray(cl0), np.asarray(cl1))
    np.testing.assert_array_equal(np.asarray(cd0), np.asarray(cd1))
    np.testing.assert_allclose(np.asarray(cost0), np.asarray(cost1),
                               rtol=1e-6)
    assert abs(float(total) - float(np.asarray(cost0).sum())) < 1e-3 * \
        max(1.0, float(np.asarray(cost0).sum()))


def test_mesh_fused_matches_single_device():
    """Mesh-sharded fused squeeze == single-device fused squeeze, byte-
    for-byte (the psum'd histograms are integer-valued, so iteration
    control is exactly reproducible across shardings)."""
    import numpy as np
    from zopfli_tpu.deflate import Options, default_greedy, split_master
    from zopfli_tpu.squeeze_batched import lz77_optimal_fused
    from zopfli_tpu.parallel import dist

    rng = np.random.default_rng(11)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"epsilon "]
    data = b"".join(words[i] for i in rng.integers(0, len(words), 6000))
    arr = np.frombuffer(data, dtype=np.uint8)
    opts = Options(engine="tpu")
    greedy = default_greedy(opts)
    n = len(arr)
    bounds = split_master(opts, arr, 0, n, greedy)
    spec_m = [(0, n, bounds)]

    single = lz77_optimal_fused(arr, spec_m, 4, greedy, mesh=None)[0]
    mesh = dist.make_mesh(8)
    sharded = lz77_optimal_fused(arr, spec_m, 4, greedy, mesh=mesh)[0]

    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        assert np.array_equal(a.litlens, b.litlens)
        assert np.array_equal(a.dists, b.dists)


def test_dryrun_multichip_roundtrip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
