"""PNG pipeline tests: decode vs PIL oracle, optimize round trips."""

import io
import os
import zlib

import numpy as np
import pytest

from zopfli_tpu.png import PNGOptions, chunks, codec, filters, optimize

PIL = pytest.importorskip("PIL.Image")

FIXTURE = "/root/reference/go/zopflipng/testdata/zoidberg.png"
QUICK = PNGOptions(num_iterations=2, num_iterations_large=2)


def _pil_rgba(png_bytes):
    return np.asarray(PIL.open(io.BytesIO(png_bytes)).convert("RGBA"))


def _png_from_array(arr, mode):
    img = PIL.fromarray(arr, mode)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _check(png_bytes, opts=QUICK):
    rgba, _ = codec.decode(png_bytes)
    assert np.array_equal(rgba, _pil_rgba(png_bytes))
    out = optimize(png_bytes, opts)
    assert np.array_equal(_pil_rgba(out), _pil_rgba(png_bytes))
    return out


def test_fixture_roundtrip_and_shrink():
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture not available")
    png = open(FIXTURE, "rb").read()
    out = _check(png)
    assert len(out) < len(png)


def test_rgb_image(rng):
    arr = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    arr[10:30, 10:50] = [200, 10, 10]  # compressible region
    _check(_png_from_array(arr, "RGB"))


def test_rgba_with_transparency(rng):
    arr = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
    arr[:8, :, 3] = 0
    arr[8:, :, 3] = 255
    _check(_png_from_array(arr, "RGBA"))


def test_grayscale():
    g = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
    _check(_png_from_array(g, "L"))


def test_palette_image(rng):
    idx = rng.integers(0, 7, (48, 48), dtype=np.uint8) * 30
    img = PIL.fromarray(idx, "L").convert("P")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    _check(buf.getvalue())


def test_binary_image_packs_to_1bit():
    arr = np.zeros((40, 40), dtype=np.uint8)
    arr[::2] = 255
    out = _check(_png_from_array(arr, "L"))
    # Our encoder should choose grayscale 1-bit for a 2-color b/w image.
    cl = chunks.parse(out)
    ihdr = next(c for c in cl if c.type == "IHDR")
    assert ihdr.data[8] in (1, 2)  # bitdepth


def test_16bit_preserved():
    arr = (np.arange(32 * 32, dtype=np.uint16).reshape(32, 32) * 37) % 65521
    img = PIL.fromarray(arr, "I;16")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    png = buf.getvalue()
    out = optimize(png, QUICK)
    a = np.asarray(PIL.open(io.BytesIO(png)))
    b = np.asarray(PIL.open(io.BytesIO(out)))
    assert np.array_equal(a, b)


def test_lossy_transparent():
    arr = np.zeros((16, 16, 4), dtype=np.uint8)
    arr[:, :, :3] = 77
    arr[:8, :, 3] = 0
    arr[:8, :, 0] = 231  # junk RGB behind alpha=0
    arr[8:, :, 3] = 255
    png = _png_from_array(arr, "RGBA")
    opts = PNGOptions(num_iterations=2, num_iterations_large=2,
                      lossy_transparent=True)
    out = optimize(png, opts)
    a = _pil_rgba(png)
    b = _pil_rgba(out)
    clear = a[:, :, 3] == 0
    assert np.array_equal(a[~clear], b[~clear])
    assert np.array_equal(a[:, :, 3], b[:, :, 3])


def test_keepchunks():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    img = PIL.fromarray(arr, "RGB")
    buf = io.BytesIO()
    from PIL import PngImagePlugin
    meta = PngImagePlugin.PngInfo()
    meta.add_text("Comment", "hello metadata")
    img.save(buf, format="PNG", pnginfo=meta)
    png = buf.getvalue()
    opts = PNGOptions(num_iterations=1, num_iterations_large=1,
                      keepchunks=["tEXt"])
    out = optimize(png, opts)
    kept = [c for c in chunks.parse(out) if c.type == "tEXt"]
    assert kept and b"hello metadata" in kept[0].data


def test_filter_unfilter_roundtrip(rng):
    img = rng.integers(0, 256, (20, 33), dtype=np.uint8)
    cand = filters.filter_all_types(img, 3)
    for strat in range(5):
        ftypes = np.full(20, strat, dtype=np.int64)
        raw = filters.serialize(cand, ftypes)
        rec = filters.unfilter(np.frombuffer(raw, np.uint8), 20, 33, 3)
        assert np.array_equal(rec, img), strat


def _make_interlaced_png(arr):
    """Hand-assemble an Adam7-interlaced RGB8 PNG (filter 0 lines)."""
    import zlib as _z
    from zopfli_tpu.png.chunks import Chunk, assemble
    h, w, _ = arr.shape
    raw = bytearray()
    for (x0, y0, dx, dy) in codec._ADAM7:
        sub = arr[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        for y in range(ph):
            raw.append(0)
            raw.extend(sub[y].tobytes())
    idat = _z.compress(bytes(raw), 6)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big") +
            bytes([8, 2, 0, 0, 1]))
    return assemble([Chunk("IHDR", ihdr), Chunk("IDAT", idat),
                     Chunk("IEND", b"")])


def test_interlaced_decode_and_optimize(rng):
    arr = (rng.integers(0, 256, (19, 23, 3))).astype(np.uint8)
    png = _make_interlaced_png(arr)
    rgba, info = codec.decode(png)
    assert info.interlace == 1
    assert np.array_equal(rgba[:, :, :3], arr)
    assert np.array_equal(rgba, _pil_rgba(png))  # PIL cross-check
    out = optimize(png, QUICK)   # re-encoded non-interlaced
    assert np.array_equal(_pil_rgba(out), _pil_rgba(png))


def _make_interlaced_gray_png(arr, bitdepth):
    """Hand-assemble an Adam7-interlaced grayscale PNG at sub-byte depth."""
    import zlib as _z
    from zopfli_tpu.png.chunks import Chunk, assemble
    h, w = arr.shape
    raw = bytearray()
    for (x0, y0, dx, dy) in codec._ADAM7:
        sub = arr[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        for y in range(ph):
            raw.append(0)
            bits = np.unpackbits(
                sub[y][:, None] << (8 - bitdepth), axis=1)[:, :bitdepth]
            raw.extend(np.packbits(bits.reshape(-1)).tobytes())
    idat = _z.compress(bytes(raw), 6)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big") +
            bytes([bitdepth, 0, 0, 0, 1]))
    return assemble([Chunk("IHDR", ihdr), Chunk("IDAT", idat),
                     Chunk("IEND", b"")])


@pytest.mark.parametrize("bitdepth", [1, 2, 4])
def test_interlaced_subbyte_decode(rng, bitdepth):
    arr = rng.integers(0, 1 << bitdepth, (13, 21), dtype=np.uint8)
    png = _make_interlaced_gray_png(arr, bitdepth)
    rgba, info = codec.decode(png)
    assert info.interlace == 1 and info.bitdepth == bitdepth
    assert np.array_equal(rgba, _pil_rgba(png))  # PIL cross-check
    out = optimize(png, QUICK)
    assert np.array_equal(_pil_rgba(out), _pil_rgba(png))


def test_16bit_trns_key_preserved():
    """16-bit color-keyed transparency survives optimize (ADVICE r1)."""
    import zlib as _z
    from zopfli_tpu.png.chunks import Chunk, assemble
    h, w = 12, 16
    arr = (np.arange(h * w, dtype=np.int64).reshape(h, w) * 4099
           % 65536).astype(np.uint16)
    key = int(arr[3, 5])
    # Make the key value appear in a few known places only; ensure no
    # other pixel collides with it at 16-bit precision, but DO create a
    # pixel that collides at 8-bit precision (key ^ 1 shares high byte).
    arr[arr == key] = key ^ 1
    arr[3, 5] = key
    arr[7, 2] = key
    raw = bytearray()
    be = arr.astype(">u2")
    for y in range(h):
        raw.append(0)
        raw.extend(be[y].tobytes())
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big") +
            bytes([16, 0, 0, 0, 0]))
    png = assemble([Chunk("IHDR", ihdr),
                    Chunk("tRNS", key.to_bytes(2, "big")),
                    Chunk("IDAT", _z.compress(bytes(raw), 6)),
                    Chunk("IEND", b"")])
    rgba, info = codec.decode(png)
    assert (rgba[:, :, 3] == 0).sum() == 2   # exactly the two key pixels
    out = optimize(png, QUICK)
    rgba2, info2 = codec.decode(out)
    assert np.array_equal(rgba, rgba2)
    a = np.asarray(PIL.open(io.BytesIO(png)))
    b = np.asarray(PIL.open(io.BytesIO(out)))
    assert np.array_equal(a, b)


def test_keepcolortype():
    arr = np.zeros((24, 24, 3), np.uint8)
    arr[::2] = [200, 30, 30]
    png = _png_from_array(arr, "RGB")
    auto = optimize(png, QUICK)
    keep = optimize(png, PNGOptions(num_iterations=2, num_iterations_large=2,
                                    keep_colortype=True))
    ih_auto = next(c for c in chunks.parse(auto) if c.type == "IHDR")
    ih_keep = next(c for c in chunks.parse(keep) if c.type == "IHDR")
    assert ih_auto.data[9] == 3   # auto palettizes this image
    assert ih_keep.data[9] == 2   # keepcolortype stays RGB
    assert np.array_equal(_pil_rgba(keep), _pil_rgba(png))


def test_lossy_transparent_modes():
    """The three LossyOptimizeTransparent modes (zopflipng_lib.cc:86-135)."""
    from zopfli_tpu.png.optimize import lossy_optimize_transparent

    # key/palette mode: binary alpha -> every clear pixel gets the RGB
    # of the FIRST clear pixel.
    a = np.zeros((4, 4, 4), np.uint8)
    a[:, :, 3] = 255
    a[0, 1] = [10, 20, 30, 0]
    a[2, 2] = [90, 91, 92, 0]
    out = lossy_optimize_transparent(a)
    assert tuple(out[0, 1, :3]) == (10, 20, 30)
    assert tuple(out[2, 2, :3]) == (10, 20, 30)

    # no-key no-palette mode: partial alpha + >256 colors -> clear
    # pixels copy the last opaque RGB; before any opaque pixel, zeros.
    rng = np.random.default_rng(0)
    b = rng.integers(0, 256, (32, 32, 4)).astype(np.uint8)
    b[:, :, 3] = 255
    b[0, 0] = [7, 8, 9, 128]          # partial alpha kills key mode
    b[0, 1] = [1, 2, 3, 0]
    b[5, 5] = [99, 98, 97, 0]
    flat = b.reshape(-1, 4)
    out = lossy_optimize_transparent(b).reshape(-1, 4)
    i1 = 1                             # b[0,1] follows opaque b[0,0]
    assert tuple(out[i1, :3]) == (7, 8, 9)
    i2 = 5 * 32 + 5
    assert tuple(out[i2, :3]) == tuple(flat[i2 - 1, :3])

    # leading clear run with no preceding opaque pixel -> zeros.
    c = rng.integers(0, 256, (32, 32, 4)).astype(np.uint8)
    c[:, :, 3] = 255
    c[16, 16, 3] = 128                 # kill key mode
    c[0, 0] = [50, 60, 70, 0]
    out = lossy_optimize_transparent(c)
    assert tuple(out[0, 0, :3]) == (0, 0, 0)
