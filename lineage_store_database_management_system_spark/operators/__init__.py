from . import (
    dedup,
    expectations,
    multimodal,
    similarity,
    textops,
    textsearch,
    windows,
)

__all__ = [
    "dedup",
    "expectations",
    "multimodal",
    "similarity",
    "textops",
    "textsearch",
    "windows",
]
