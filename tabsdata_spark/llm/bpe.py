"""Byte-pair-encoding tokenizer: distributed training front-end and an
Arrow-batched encoder (Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016).

Scale design:
- TRAINING operates on the word-frequency DICTIONARY, not the corpus —
  the standard BPE formulation.  The corpus-sized work is exactly one
  distributed word count (explode + groupBy, map-side combine), then the
  top-`max_vocab_words` dictionary (TakeOrderedAndProject, bounded) feeds
  the driver-side merge loop.  A 100 TB corpus has a few 1e7 distinct
  cleaned words; capping at 1e5-1e6 count-weighted words loses only the
  long tail that cannot influence early merges.
- ENCODING is embarrassingly parallel: merge ranks ship in the task
  closure (bounded: num_merges pairs), each Arrow batch runs the
  iterative min-rank merge loop per word with a per-batch word cache —
  web text repeats words heavily, so the cache collapses most work to a
  dict lookup.  No shuffle, no driver involvement.

Word boundary = llm.corpus.clean_tokens semantics (lowercase, alnum-only,
whitespace split) so BPE composes with the rest of the text suite; no
end-of-word marker (word-internal merges only, documented divergence from
marker-bearing vocabularies).
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_CLEAN_RE = re.compile(r"[^a-z0-9\s]")


def _clean_words(text: str | None) -> list[str]:
    """Python twin of corpus.clean_tokens (lower, strip non-alnum, split
    on whitespace) — MUST stay in lockstep with the JVM expression."""
    if text is None:
        return []
    return _CLEAN_RE.sub("", text.lower()).split()


def train_bpe_on_vocab(word_counts: dict[str, int],
                       num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency dictionary: each
    step merges the most frequent adjacent symbol pair (count-weighted;
    ties broken by lexicographically smallest pair — deterministic).
    O(num_merges * total symbols); the dictionary is bounded by the
    caller, so this is driver-cheap."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def train_bpe(docs: DataFrame, text_col: str = "text",
              num_merges: int = 50,
              max_vocab_words: int = 100_000) -> list[tuple[str, str]]:
    """Distributed BPE training: ONE corpus pass (word count shuffle with
    map-side combine), top-`max_vocab_words` dictionary by count (bounded
    TakeOrderedAndProject — never a global sort), then the driver merge
    loop on the dictionary.  Returns the ranked merge list."""
    from .corpus import clean_tokens

    rows = (docs.select(F.explode(clean_tokens(F.col(text_col))).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(max_vocab_words)
            .collect())
    return train_bpe_on_vocab({r["w"]: r["c"] for r in rows}, num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                cache: dict[str, list[str]]) -> list[str]:
    """Iterative min-rank BPE encode of one word (the exact algorithm
    reference tokenizers use: repeatedly merge the lowest-rank adjacent
    pair, all occurrences left-to-right, until no rule applies)."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (syms[i], syms[i + 1])
        if best is None:
            break
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[word] = syms
    return syms


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Add a BPE token-array column.  One Arrow-batched pandas_udf, no
    shuffle; merge ranks travel in the closure (num_merges pairs); a
    per-batch word cache collapses repeated words to a lookup."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in _clean_words(t):
                toks.extend(encode_word(w, ranks, cache))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))
