from . import corpus, dedup, multimodal, similarity, textual

__all__ = ["corpus", "dedup", "similarity", "textual", "multimodal"]
