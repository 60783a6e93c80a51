"""Deterministic 52-image PNG corpus for parity vs reference zopflipng.

Classes cover the reference's own test dimensions (README.zopflipng):
flat/gradient/palette/grayscale/alpha/noise/photo-like/16-bit/sub-byte
depths.  `files()` returns [(name, png_bytes)]; `python png_corpus.py`
prints the manifest.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np


def _png(arr, mode):
    from PIL import Image
    img = Image.fromarray(arr, mode)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _smooth(rng, h, w, ch):
    """Photo-like: random walk smoothed twice."""
    a = rng.standard_normal((h, w, ch))
    for _ in range(3):
        a = (a + np.roll(a, 1, 0) + np.roll(a, 1, 1)
             + np.roll(a, -1, 0) + np.roll(a, -1, 1)) / 5.0
    a = np.cumsum(a, axis=1)
    a -= a.min()
    a *= 255.0 / max(a.max(), 1e-9)
    return a.astype(np.uint8)


def files() -> list[tuple[str, bytes]]:
    out = []
    rng = np.random.default_rng(20260817)

    for i, (h, w) in enumerate([(48, 48), (96, 128), (200, 150)]):
        flat = np.full((h, w, 3), [30 + 40 * i, 90, 200 - 50 * i], np.uint8)
        out.append((f"flat_{i}", _png(flat, "RGB")))

        gx = np.linspace(0, 255, w, dtype=np.uint8)
        grad = np.stack([np.tile(gx, (h, 1))] * 3, axis=2)
        grad[:, :, 1] = grad[:, :, 1][::-1]
        out.append((f"gradient_{i}", _png(grad, "RGB")))

        pal = rng.integers(0, 256, (8, 3), np.uint8)
        idx = rng.integers(0, 8, (h, w))
        out.append((f"palette8_{i}", _png(pal[idx], "RGB")))

        gray = _smooth(rng, h, w, 1)[:, :, 0]
        out.append((f"gray_{i}", _png(gray, "L")))

        photo = _smooth(rng, h, w, 3)
        out.append((f"photo_{i}", _png(photo, "RGB")))

        noise = rng.integers(0, 256, (h, w, 3), np.uint8)
        out.append((f"noise_{i}", _png(noise, "RGB")))

        rgba = _smooth(rng, h, w, 4)
        rgba[:, :, 3] = 255
        rgba[: h // 3, :, 3] = 0          # transparent band w/ junk RGB
        rgba[h // 3: h // 2, :, 3] = 128  # partial alpha
        out.append((f"alpha_{i}", _png(rgba, "RGBA")))

        binalpha = rgba.copy()
        binalpha[:, :, 3] = np.where(rgba[:, :, 3] > 100, 255, 0)
        out.append((f"binalpha_{i}", _png(binalpha, "RGBA")))

        checker = ((np.add.outer(np.arange(h), np.arange(w)) // 4) % 2)
        out.append((f"checker_{i}",
                    _png((checker * 255).astype(np.uint8), "L")))

        text = np.zeros((h, w), np.uint8)
        for _ in range(h * w // 128):
            y, x = rng.integers(0, h - 4), rng.integers(0, w - 4)
            text[y:y + rng.integers(1, 4), x:x + rng.integers(1, 4)] = 255
        out.append((f"textish_{i}", _png(text, "L")))

        gray16 = (_smooth(rng, h, w, 1)[:, :, 0].astype(np.uint16) * 257)
        out.append((f"gray16_{i}", _png(gray16, "I;16")))

        bit1 = (checker ^ (rng.random((h, w)) < 0.02)).astype(np.uint8)
        from PIL import Image
        img = Image.fromarray((bit1 * 255).astype(np.uint8), "L").convert("1")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        out.append((f"bit1_{i}", buf.getvalue()))

        few = rng.integers(0, 4, (h, w))
        pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [40, 40, 255]],
                        np.uint8)
        img = Image.fromarray(pal4[few], "RGB").quantize(colors=4)
        buf = io.BytesIO()
        img.save(buf, format="PNG", bits=2)
        out.append((f"pal4_{i}", buf.getvalue()))

        stripes = np.zeros((h, w, 3), np.uint8)
        stripes[::3] = [200, 0, 0]
        stripes[1::3] = [0, 200, 0]
        out.append((f"stripes_{i}", _png(stripes, "RGB")))

    # the reference repo's one binary fixture
    try:
        with open("/root/reference/go/zopflipng/testdata/zoidberg.png",
                  "rb") as f:
            out.append(("zoidberg", f.read()))
    except OSError:
        pass
    return out


if __name__ == "__main__":
    total = 0
    for name, png in files():
        total += len(png)
        print(f"{name:16s} {len(png):>8,d} B  "
              f"sha256={hashlib.sha256(png).hexdigest()[:12]}")
    print(f"{'TOTAL':16s} {total:>8,d} B  ({len(files())} images)")
