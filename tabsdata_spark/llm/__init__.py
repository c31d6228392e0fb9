from . import (cluster, codecs, corpus, decontam, dedup, dsir, multimodal,
               pipeline, similarity, textual)

__all__ = ["cluster", "codecs", "corpus", "decontam", "dedup", "dsir",
           "multimodal", "pipeline", "similarity", "textual"]
