"""Deterministic local benchmark corpus (Silesia/Canterbury stand-in).

The canonical corpora are not redistributable into this environment
(no network egress), so the corpus-scale measurements of BASELINE.md
configs 2-3 run on a documented, reproducible mix of file classes
assembled from files present in the image: C/C++ source, Python
source, ELF executables, shared libraries, HTML docs, English-ish
text, and structured/repetitive data.  Class coverage mirrors
Silesia's (text / source / binary / database-like / mixed).

`files()` returns [(name, bytes)] — deterministic content, each entry
truncated to its listed size.  `python corpus.py` prints the manifest.
"""

from __future__ import annotations

import hashlib
import os

# (name, path-or-None, size_cap).  Paths chosen for existence in the
# build image; missing paths are skipped (manifest prints what's used).
_SPEC = [
    # -- source code (text, Canterbury-ish small to mid) --
    ("csrc_zopfli", "/root/reference/src/zopfli", 160_000),       # dir: cat
    ("cppsrc_lodepng", "/root/reference/src/zopflipng/lodepng", 420_000),
    ("pysrc_numpy", "/opt/venv/lib/python3.12/site-packages/numpy/_core",
     2_000_000),
    ("pysrc_jax", "/opt/venv/lib/python3.12/site-packages/jax/_src",
     6_000_000),
    # -- binaries --
    ("elf_python", "/usr/bin/python3.11", 6_834_488),
    ("lib_c", "/usr/lib/x86_64-linux-gnu/libc.so.6", 1_926_232),
    ("lib_qt5core", "/usr/lib/x86_64-linux-gnu/libQt5Core.so.5.15.8",
     5_000_000),
    # -- docs / markup --
    ("xml_mime", "/usr/share/mime/packages/freedesktop.org.xml", 2_408_297),
    ("text_pydoc", "/usr/lib/python3.11/pydoc_data/topics.py", 756_209),
    # -- synthetic classes (fully deterministic) --
    ("log_repetitive", None, 4_000_000),
    ("dna_like", None, 2_000_000),
    ("random_incompressible", None, 1_000_000),
]


def _read_capped(path: str, cap: int) -> bytes:
    if os.path.isdir(path):
        parts = []
        total = 0
        for root, dirs, names in os.walk(path):
            dirs.sort()
            for name in sorted(names):
                p = os.path.join(root, name)
                if not os.path.isfile(p):
                    continue
                with open(p, "rb") as f:
                    b = f.read()
                parts.append(b)
                total += len(b)
                if total >= cap:
                    return b"".join(parts)[:cap]
        return b"".join(parts)[:cap]
    with open(path, "rb") as f:
        return f.read(cap)


def _synthetic(name: str, cap: int) -> bytes:
    import numpy as np
    import zlib

    # zlib.crc32, not hash(): Python string hashes are salted per
    # process and would make the "deterministic" corpus content vary.
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    if name == "log_repetitive":
        lines = []
        svcs = [b"kernel", b"sshd", b"cron", b"systemd", b"nginx"]
        msgs = [b"connection accepted from 10.0.%d.%d",
                b"worker %d exited with status %d",
                b"scheduled job %d finished in %dms"]
        t = 1700000000
        while sum(map(len, lines)) < cap:
            t += int(rng.integers(1, 30))
            svc = svcs[int(rng.integers(0, len(svcs)))]
            msg = msgs[int(rng.integers(0, len(msgs)))] % \
                (int(rng.integers(0, 255)), int(rng.integers(0, 65536)))
            lines.append(b"%d %s[%d]: " % (t, svc, int(rng.integers(1, 9999)))
                         + msg + b"\n")
        return b"".join(lines)[:cap]
    if name == "dna_like":
        return rng.choice(np.frombuffer(b"ACGT", np.uint8),
                          cap).tobytes()
    if name == "random_incompressible":
        return rng.integers(0, 256, cap, dtype=np.uint8).tobytes()
    raise KeyError(name)


def files() -> list[tuple[str, bytes]]:
    out = []
    for name, path, cap in _SPEC:
        if path is None:
            out.append((name, _synthetic(name, cap)))
        elif os.path.exists(path):
            out.append((name, _read_capped(path, cap)))
    return out


if __name__ == "__main__":
    total = 0
    for name, data in files():
        total += len(data)
        print(f"{name:24s} {len(data):>10,d} B  "
              f"sha256={hashlib.sha256(data).hexdigest()[:16]}")
    print(f"{'TOTAL':24s} {total:>10,d} B")
