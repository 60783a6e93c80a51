"""CLI tests: zopfli-compatible and zopflipng-compatible front ends."""

import io
import os
import zlib

import numpy as np
import pytest

from zopfli_tpu import cli as zcli


def test_cli_gzip_file(tmp_path, capsys):
    p = tmp_path / "x.txt"
    data = b"hello cli world " * 40
    p.write_bytes(data)
    assert zcli.main(["--i5", str(p)]) == 0
    out = (tmp_path / "x.txt.gz").read_bytes()
    assert zlib.decompress(out, 16 + 15) == data


def test_cli_zlib_stdout(tmp_path, capsys, monkeypatch):
    p = tmp_path / "y.bin"
    data = bytes(range(256)) * 4
    p.write_bytes(data)
    buf = io.BytesIO()

    class FakeStdout:
        buffer = buf
    monkeypatch.setattr("sys.stdout", FakeStdout)
    assert zcli.main(["--zlib", "--i3", "-c", str(p)]) == 0
    assert zlib.decompress(buf.getvalue()) == data


def test_cli_deflate_and_flags(tmp_path):
    p = tmp_path / "z.txt"
    p.write_bytes(b"abcabcabc")
    assert zcli.main(["--deflate", "--splitlast", "--i2", str(p)]) == 0
    out = (tmp_path / "z.txt.deflate").read_bytes()
    assert zlib.decompress(out, -15) == b"abcabcabc"


def test_cli_bad_iterations(capsys):
    assert zcli.main(["--i0", "f"]) == 1


def test_cli_no_files(capsys):
    assert zcli.main([]) == 1


def test_png_cli_quick(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    arr[::2] = 128
    img = PIL.fromarray(arr, "RGB")
    src = tmp_path / "in.png"
    dst = tmp_path / "out.png"
    img.save(src, format="PNG")
    from zopfli_tpu.png import cli as pcli
    assert pcli.main(["-q", "-y", str(src), str(dst)]) == 0
    a = np.asarray(PIL.open(src).convert("RGBA"))
    b = np.asarray(PIL.open(dst).convert("RGBA"))
    assert np.array_equal(a, b)
