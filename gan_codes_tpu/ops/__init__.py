from . import blocks, fusion, nn  # noqa: F401
