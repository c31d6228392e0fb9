from . import (bpe, cluster, codecs, corpus, decontam, dedup, dsir,
               multimodal, pipeline, similarity, textual)

__all__ = ["bpe", "cluster", "codecs", "corpus", "decontam", "dedup", "dsir",
           "multimodal", "pipeline", "similarity", "textual"]
