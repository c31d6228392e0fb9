from . import dedup, multimodal, similarity, textual

__all__ = ["dedup", "similarity", "textual", "multimodal"]
