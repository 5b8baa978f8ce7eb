from . import dedup, multimodal, similarity, textops, windows

__all__ = ["dedup", "multimodal", "similarity", "textops", "windows"]
