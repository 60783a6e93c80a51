"""Real multi-process multihost test (SURVEY §4: multi-process simulation).

Spawns N OS processes that form a jax.distributed cluster over
localhost gRPC, runs compress_multihost in each, and asserts process
0's gathered bytes equal the serial single-process output byte for
byte.  CPU backend only — no TPUs required.
"""

import os
import socket
import subprocess
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes={n},
                           process_id=int(sys.argv[1]))
import numpy as np
import zopfli_tpu
from zopfli_tpu.deflate import Options

rng = np.random.default_rng(77)
words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"eps "]
data = b"".join(words[i] for i in rng.integers(0, len(words), 400000))
data = data[:{nbytes}]
# The public API auto-routes to compress_multihost when
# jax.process_count() > 1 (returns bytes on process 0, None elsewhere).
out = zopfli_tpu.compress(data, "gzip", Options(numiterations=2))
if jax.process_index() == 0:
    with open({outpath!r}, "wb") as f:
        f.write(out)
else:
    assert out is None
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_multihost(tmp_path, n: int, nbytes: int):
    outpath = str(tmp_path / f"mh{n}.gz")
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER.format(repo=REPO, coord=coord, n=n, outpath=outpath,
                            nbytes=nbytes)

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    })
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              env=env, cwd=REPO)
             for i in range(n)]
    for p in procs:
        assert p.wait(timeout=600) == 0

    out = open(outpath, "rb").read()

    # Serial oracle in-process.
    rng = np.random.default_rng(77)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"eps "]
    data = b"".join(words[i] for i in rng.integers(0, len(words), 400000))
    data = data[:nbytes]
    assert zlib.decompress(out, 16 + 15) == data

    import zopfli_tpu
    from zopfli_tpu.deflate import Options
    serial = zopfli_tpu.compress(data, "gzip", Options(numiterations=2))
    assert out == serial


def test_multihost_two_processes(tmp_path):
    _run_multihost(tmp_path, n=2, nbytes=2100000)


def test_multihost_four_processes(tmp_path):
    # 5 masters over 4 processes: one process gets two, one idles on
    # the last gather round — exercises the ragged in-order splice.
    _run_multihost(tmp_path, n=4, nbytes=4200000)
