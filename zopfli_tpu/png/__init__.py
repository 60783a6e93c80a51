"""ZopfliPNG-equivalent PNG recompression (reference src/zopflipng/).

    from zopfli_tpu.png import optimize, PNGOptions
    better = optimize(open("in.png", "rb").read())
"""

from .optimize import PNGOptions, optimize  # noqa: F401
from . import chunks, codec, filters  # noqa: F401
