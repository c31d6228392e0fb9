"""Text-analysis operators for large-scale training-data pipelines.

All hot-path computation is built-in JVM expressions (split/regexp/array
functions) — no Python UDFs — so every operator here runs inside
whole-stage codegen and scales linearly with input splits at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Deliberately simple, engine-portable token boundary: runs identically as a
# java regex (Spark) and an RE2 regex (DuckDB oracle).
_TOKEN_SPLIT = r"\s+"
#: BPE-ish word/number/punct pieces for token estimation
_BPE_PIECE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny public stopword/marker lists (common words, public knowledge).
STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be",
]

#: language marker words for the n-gram/marker heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "that"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empty strings removed; null text -> empty array
    (so size() is 0, not Spark's legacy -1)."""
    safe = F.coalesce(text, F.lit(""))
    return F.filter(F.split(F.trim(safe), _TOKEN_SPLIT), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """Rough BPE token count: word/number/punct pieces + intra-word splits
    every 4 chars (long words fragment in BPE vocabularies)."""
    pieces = F.regexp_count(text, F.lit(_BPE_PIECE))
    long_word_extra = F.regexp_count(text, F.lit(r"[A-Za-z]{5,}"))
    return (pieces + long_word_extra).cast("long")


def char_count(text: Column) -> Column:
    return F.char_length(text)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (fixed class, portable regex)."""
    n = F.regexp_count(text, F.lit(r"[.,!?;:]"))
    return F.when(F.char_length(text) > 0, n / F.char_length(text)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens."""
    sw = stopwords or STOPWORDS_EN
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    total = F.size(toks)
    return F.when(total > 0, hits / total).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.char_length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: favors texts with moderate length,
    low punctuation density, and a healthy stopword ratio (the classic
    cheap-filter trio for web-scale corpus cleaning)."""
    length = F.char_length(text)
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5.0)
    sw = stopword_ratio(text)
    sw_score = F.when(sw > 0.1, F.lit(1.0)).otherwise(sw * 10.0)
    return F.round((len_score + punct_pen + sw_score) / 3.0, 6)


def char_entropy(text: Column) -> Column:
    """Shannon entropy (bits/char) of the character distribution — a cheap
    gibberish/boilerplate signal: repeated filler scores low, keyboard
    mash / base64 blobs score high, natural prose sits ~3.5-4.5.

    Shuffle-free: one pass of array expressions per row, O(distinct-chars
    x len) compares (ASCII prose has <100 distinct chars).  The char array
    is BOUND ONCE through a one-element transform — referencing the
    computed split inside the per-distinct-char lambda would inline and
    re-run it once per distinct char (the documented lambda-inlining
    trap).  Entropy is computed as log2(n) - sum(c*log2(c))/n over integer
    counts c: fewer float ops than the p*log2(p) form and identical
    rounding behavior across engines.

    Unicode contract: F.split(text, "") is CODE-POINT safe on Spark 4
    (Java regex zero-width matches never land inside a surrogate pair,
    so non-BMP chars — emoji, rare CJK — stay whole), matching DuckDB's
    string_split('') code-point semantics; verified by the non-BMP
    parity test in tests/test_llm.py."""
    chars = F.filter(F.split(F.coalesce(text, F.lit("")), ""),
                     lambda c: c != "")

    def ent_of(cs: Column) -> Column:
        n = F.size(cs)
        counts = F.transform(
            F.array_distinct(cs),
            lambda c: F.size(F.filter(cs, lambda x: x == c)).cast("double"))
        csum = F.aggregate(counts, F.lit(0.0),
                           lambda acc, c: acc + c * F.log2(c))
        return F.when(n > 0, F.log2(n.cast("double")) - csum / n) \
                .otherwise(F.lit(0.0))

    return F.element_at(F.transform(F.array(chars), ent_of), 1)


def language_id(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Marker-word language ID: score each language by marker-token hits,
    pick the argmax (ties -> lexicographically first language, deterministic).
    Pure JVM expressions; for N languages this is N array-filter passes over
    the token array — columnar and cheap."""
    marks = markers or LANG_MARKERS
    toks = tokens(F.lower(text))
    scored = []
    for lang in sorted(marks):
        score = F.size(F.filter(toks, lambda t: t.isin(marks[lang])))
        scored.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # argmax: sort structs (score asc, lang asc) and take the last-by-score;
    # to make ties pick the *first* lang, invert: take max of (score, neglang)
    arr = F.array(*scored)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Key-collision fingerprint (the public OpenRefine method): lowercase,
    strip punctuation, split, sort unique tokens, re-join.  Deterministic
    and engine-portable -> usable as an exact-dedup key."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", "")
    toks = F.filter(F.split(F.trim(cleaned), _TOKEN_SPLIT), lambda t: t != "")
    return F.array_join(F.array_sort(F.array_distinct(toks)), " ")


def portable_hash60(col: Column) -> Column:
    """60-bit engine-portable hash: first 15 hex chars of md5 parsed as an
    integer.  Identical in Spark, DuckDB, Python (`int(md5hex[:15], 16)`) —
    use when a hash value must be reproducible OUTSIDE Spark (oracle
    checks, cross-engine pipelines).  ~3x slower than xxhash64; keep
    xxhash64 for Spark-internal paths."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array, as a fold of zip_with
    over n SHIFTED COPIES of the array — n O(len) slices total.

    The naive transform(sequence(1, len-n+1), i -> array_join(slice(toks,
    i, n))) form evaluates an interpreted Slice per position — O(len^2)
    element copies plus per-call object churn (higher-order array
    functions never enter codegen); measured 10x slower on the documents
    table.  Short inputs (len < n) yield one truncated gram; callers gate
    on size when that matters.

    `toks` is BOUND ONCE through a one-element transform: when callers
    pass a computed expression (e.g. clean_tokens(text)), naive slicing
    would inline that expression into all n slices and re-run the
    tokenizer n times per row — the wrapper makes the helper safe to call
    on expressions, not just materialized columns."""
    def grams_of(t: Column) -> Column:
        m = F.greatest(F.size(t) - (n - 1), F.lit(1))
        grams = F.slice(t, 1, m)
        for j in range(1, n):
            grams = F.zip_with(grams, F.slice(t, j + 1, m),
                               lambda g, w: F.concat_ws(" ", g, w))
        return grams

    return F.element_at(F.transform(F.array(toks), grams_of), 1)


def rolling_hash_fingerprint(text: Column, window: int = 8,
                             hash_fn=F.xxhash64) -> Column:
    """Winnowing-style document fingerprint: `hash_fn` over each token
    `window`-gram, keep the minimum hash (a 1-of-n winnow).  64-bit, stable
    across partitions/executors.  Pass `hash_fn=portable_hash60` when the
    fingerprint must reproduce outside Spark."""
    toks = tokens(F.lower(text))
    hashes = F.transform(word_ngrams(toks, window), lambda g: hash_fn(g))
    return F.array_min(hashes)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: all metrics in a single projection."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_tokens_bpe": bpe_token_estimate(t),
            "punct_ratio": F.round(punct_ratio(t), 6),
            "stopword_ratio": F.round(stopword_ratio(t), 6),
            "quality": quality_score(t),
            "lang_pred": language_id(t),
            "fingerprint": fingerprint(t),
        }
    )


# -- PII scrubbing / dataset splitting (training-data hygiene) --------------
#: engine-portable regexes (Java regex and RE2 agree on these constructs)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def redact_pii(text: Column, replacement: str = "[PII]",
               patterns: dict[str, str] | None = None) -> Column:
    """Chained regexp_replace over the PII pattern table — pure JVM
    expressions (no UDF), so redaction streams through whole-stage codegen
    at scan speed.  Order matters: email before phone so the digits inside
    an address are consumed by the earlier, more specific rule."""
    out = text
    for pat in (patterns or PII_PATTERNS).values():
        out = F.regexp_replace(out, pat, replacement)
    return out


def hash_split(key: Column, buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, buckets): md5 of the
    stringified key -> first 6 hex digits -> int.  Unlike xxhash64 %, the
    md5 path gives identical assignment in Spark, DuckDB, or any other
    tool that joins the pipeline — splits must never depend on engine
    hash internals.  Use for train/val/test partitioning."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10)
    return (h.cast("long") % buckets).cast("int")


def train_val_test(key: Column, val_pct: int = 5, test_pct: int = 5) -> Column:
    """Label rows train/val/test by hash_split bucket ranges — stable under
    re-runs, insertions, and repartitioning (membership depends only on the
    key)."""
    b = hash_split(key, 100)
    return (F.when(b < test_pct, F.lit("test"))
            .when(b < test_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("train")))


def composite_quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    keep_lang: str = "en",
    min_tokens: int = 30,
    max_tokens: int = 400,
    max_top_token_ratio: float = 0.15,
) -> DataFrame:
    """C4-style composite keep/drop gate with per-rule flags: language,
    token-count band, and max single-token dominance (a cheap repetition
    proxy).  Returns (id, n_tokens, top_token_ratio, lang_ok, len_ok,
    rep_ok, keep) so downstream stats can attribute drops to rules.

    Scale shape: token counting is a per-row projection; the dominance
    ratio needs per-(doc, token) counts — two partial-agg shuffles on the
    doc id, no window, no UDF.
    """
    lang_ok = (F.col(lang_col) == keep_lang) if lang_col else F.lit(True)
    toks = docs.select(
        F.col(id_col),
        lang_ok.alias("lang_ok"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    per_tok = toks.groupBy(id_col, "lang_ok", "tok").agg(
        F.count(F.lit(1)).alias("c"))
    stats = per_tok.groupBy(id_col, "lang_ok").agg(
        F.coalesce(F.sum(F.when(F.col("tok").isNotNull(), F.col("c"))),
                   F.lit(0)).alias("n_tokens"),
        F.coalesce(F.max(F.when(F.col("tok").isNotNull(), F.col("c"))),
                   F.lit(0)).alias("top_c"),
    )
    top_ratio = F.when(F.col("n_tokens") > 0,
                       F.round(F.col("top_c") / F.col("n_tokens"), 6)) \
        .otherwise(F.lit(0.0))
    out = stats.select(
        F.col(id_col),
        F.col("n_tokens"),
        top_ratio.alias("top_token_ratio"),
        F.col("lang_ok"),
        F.col("n_tokens").between(min_tokens, max_tokens).alias("len_ok"),
        (top_ratio <= max_top_token_ratio).alias("rep_ok"),
    )
    return out.withColumn(
        "keep", F.col("lang_ok") & F.col("len_ok") & F.col("rep_ok"))


#: the Gopher "must contain >= 2 of these" stop list (public Rae et al.
#: 2021 appendix A1.1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher rep-removal rules (Rae et al. 2021 A1.1) as one pure-JVM
    projection — word-count band, mean word length band, fraction of words
    with an alphabetic character, and stopword presence — with per-rule
    flags plus the combined keep bit.

    Scale shape: every metric folds over the token ARRAY in the same
    projection (aggregate/filter/size — no explode, no shuffle, no UDF):
    a 100 TB scan stays one stage wide with zero exchanges."""
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    nd = n.cast("double")
    mean_len = F.when(n > 0, F.round(
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t)).cast("double") / nd, 6)
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(n > 0, F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / nd, 6)
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(
        toks, lambda t: t.isin(*GOPHER_STOPWORDS)))
    out = docs.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        n.between(min_words, max_words).alias("words_ok"),
        mean_len.between(min_mean_len, max_mean_len).alias("word_len_ok"),
        (alpha_frac >= min_alpha_frac).alias("alpha_ok"),
        (stop_hits >= min_stop_hits).alias("stopword_ok"),
    )
    return out.withColumn(
        "keep", F.col("words_ok") & F.col("word_len_ok")
                & F.col("alpha_ok") & F.col("stopword_ok"))


def syllable_estimate(word: Column) -> Column:
    """Syllables ~ vowel-group count (runs of [aeiouy] in a lowercased
    word), floored at 1 — the standard cheap estimator readability
    formulas are calibrated against.  Portable regex (Java + RE2)."""
    groups = F.regexp_count(F.lower(word), F.lit(r"[aeiouy]+"))
    return F.greatest(groups, F.lit(1))


def readability(text: Column) -> Column:
    """Flesch-Kincaid grade level (Kincaid et al., 1975):
    0.39*(words/sentences) + 11.8*(syllables/word) - 15.59.

    Sentences = [.!?]+ runs (floored at 1), words = whitespace tokens,
    syllables via `syllable_estimate` summed with one array fold.  Pure
    JVM expressions, shuffle-free — a per-row quality signal for corpus
    filtering (very high grade = run-on gibberish, very low = fragment
    soup).  Null/empty text -> 0.0."""
    toks = tokens(text)
    n_words = F.size(toks)
    n_sent = F.greatest(
        F.regexp_count(F.coalesce(text, F.lit("")), F.lit(r"[.!?]+")),
        F.lit(1))
    n_syll = F.aggregate(
        toks, F.lit(0),
        lambda acc, w: acc + syllable_estimate(w))
    grade = (F.lit(0.39) * (n_words.cast("double") / n_sent.cast("double"))
             + F.lit(11.8) * (n_syll.cast("double") / n_words.cast("double"))
             - F.lit(15.59))
    return F.when(n_words > 0, grade).otherwise(F.lit(0.0))


def normalize_text(text: Column) -> Column:
    """Canonicalize raw web text before fingerprinting / dedup: unify
    curly quotes, en/em dashes, and NBSP to ASCII; strip C0/C1-adjacent
    control characters (keeping tab and newline); collapse runs of
    spaces/tabs to one space; trim spaces around newlines; cap blank-line
    runs at one blank line; trim the ends.

    Pure translate/regexp_replace chain — runs at scan speed inside
    codegen, and every step has identical semantics in Java regex and
    DuckDB/RE2 so oracles can recompute it verbatim."""
    t = F.coalesce(text, F.lit(""))
    t = F.translate(
        t,
        "‘’“”–— ",
        "''\"\"-- ")
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    t = F.regexp_replace(t, "[ \\t]+", " ")
    t = F.regexp_replace(t, " ?\\n ?", "\n")
    t = F.regexp_replace(t, "\\n{3,}", "\n\n")
    return F.trim(t)


def k_anonymity_report(df, quasi_cols: list[str], k: int = 5):
    """k-anonymity audit over a set of quasi-identifier columns: every
    row whose quasi-identifier combination is shared by fewer than k rows
    is re-identifiable at that k — the privacy gate a training-data
    release runs next to PII redaction.  Returns one row per equivalence
    class SIZE (the anonymity histogram): class size, number of classes,
    rows covered, and whether that size violates k.

    Scale shape: one partial-agg shuffle onto the quasi-identifier
    combinations, then a re-aggregation of the (tiny) class-size
    distribution — row count never reaches the second shuffle.  The
    histogram form keeps the output bounded (class sizes, not classes),
    so the report itself cannot leak a small class's identifiers."""
    import pyspark.sql.functions as F

    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n"))
    return (classes.groupBy("__n")
            .agg(F.count(F.lit(1)).alias("n_classes"))
            .select(F.col("__n").alias("class_size"),
                    "n_classes",
                    (F.col("__n") * F.col("n_classes")).alias("rows_covered"),
                    (F.col("__n") < k).alias("violates_k")))


def k_anonymize(df, ladder: list[list], names: list[str], k: int = 5):
    """Generalization-ladder k-anonymization: walk an ordered list of
    generalization LEVELS (each a list of quasi-identifier expressions,
    most specific first) and publish the FIRST level whose smallest
    equivalence class reaches k — the active sibling of
    k_anonymity_report (audit says where you stand; this picks the
    minimal coarsening that passes, the Samarati ladder).

    Returns the anonymized equivalence classes (generalized identifiers
    cast to string + class size) tagged with the chosen level; if no
    level satisfies k, the most general level publishes (callers add a
    suppression level — e.g. a '*' literal — as the last rung).

    Scale shape: one partial-agg pass per CANDIDATE level (ladders are
    3-5 rungs; each pass is a count shuffle), with a 1-number driver
    collect per rung to decide escalation — the kmeans model-roundtrip
    contract.  Class-size output only, so the report itself cannot leak
    a rare combination's raw identifiers."""
    import pyspark.sql.functions as F

    def classes(exprs):
        cols = [e.cast("string").alias(n) for e, n in zip(exprs, names)]
        return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))

    chosen = len(ladder) - 1
    for lvl, exprs in enumerate(ladder):
        m = classes(exprs).agg(F.min("n")).first()[0]
        if m is not None and m >= k:
            chosen = lvl
            break
    return classes(ladder[chosen]).select(
        F.lit(chosen).alias("level"), *names, "n")


def pii_density(df, source_col: str = "source", text_col: str = "text"):
    """Per-source PII density report: share of documents containing any
    PII pattern and the average characters removed by redaction — the
    release-gate metric that ranks sources by privacy risk (redact_pii
    scrubs; this measures how much scrubbing each source needs).

    Pure chained-regex expressions (the same PII_PATTERNS table
    redact_pii applies) + one count shuffle on source — scan-speed, no
    UDF."""
    import pyspark.sql.functions as F

    red = redact_pii(F.col(text_col))
    delta = F.length(F.col(text_col)) - F.length(red)
    hit = (F.col(text_col) != red).cast("int")
    return (df.groupBy(F.col(source_col))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(hit).alias("n_with_pii"),
                 F.sum(delta.cast("bigint")).alias("chars_delta"))
            .select(source_col, "n_docs", "n_with_pii",
                    F.round(F.col("n_with_pii").cast("double")
                            / F.col("n_docs"), 6).alias("pii_rate"),
                    "chars_delta"))


def stratified_split_report(df, stratum_col: str, key_col: str,
                            val_pct: int = 5, test_pct: int = 5):
    """Per-stratum deterministic split assignment + balance report:
    bucket on md5(stratum || ':' || key) so each stratum is hashed
    independently (a pathological key distribution in one stratum
    cannot skew another), then report (stratum, split, n, share within
    stratum) — the check that train/val/test stay representative per
    language/domain/source.

    One projection + one count shuffle on (stratum, split); the window
    for within-stratum shares runs over the bounded report rows."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    key = F.concat(F.col(stratum_col).cast("string"), F.lit(":"),
                   F.col(key_col).cast("string"))
    split = train_val_test(key, val_pct=val_pct, test_pct=test_pct)
    counts = (df.select(F.col(stratum_col).alias("stratum"),
                        split.alias("split"))
              .groupBy("stratum", "split")
              .agg(F.count(F.lit(1)).alias("n")))
    tot = F.sum("n").over(W.partitionBy("stratum"))
    return counts.select("stratum", "split", "n",
                         F.round(F.col("n").cast("double") / tot, 6)
                         .alias("share"))


def pii_pattern_counts(df, source_col: str = "source",
                       text_col: str = "text"):
    """Per-source, per-pattern PII breakdown: how many documents match
    each PII pattern class (email / ipv4 / phone) — the itemized
    companion to pii_density's aggregate rate, answering WHICH kind of
    identifier a source leaks.  One scan, one count shuffle; the long
    (source, pattern) form keeps the output schema stable as the
    pattern table grows."""
    import pyspark.sql.functions as F

    per = [F.sum((F.col(text_col).rlike(pat)).cast("int")).alias(name)
           for name, pat in PII_PATTERNS.items()]
    wide = (df.groupBy(F.col(source_col).alias("source"))
            .agg(F.count(F.lit(1)).alias("__n"), *per))
    stacked = F.explode(F.array(*[
        F.struct(F.lit(name).alias("pattern"),
                 F.col(name).cast("bigint").alias("n_docs"))
        for name in PII_PATTERNS]))
    return (wide.select("source", "__n", stacked.alias("__s"))
            .select("source", F.col("__s.pattern").alias("pattern"),
                    F.col("__s.n_docs").alias("n_docs"),
                    F.round(F.col("__s.n_docs").cast("double")
                            / F.col("__n"), 6).alias("rate")))


#: engine-portable markup-stripping rules, applied in order: script/style
#: blocks (content AND tags), remaining tags, the common entities, then
#: whitespace collapapse happens via normalize_text downstream if wanted
MARKUP_RULES: list[tuple[str, str]] = [
    (r"(?s)<script\b[^>]*>.*?</script>", " "),
    (r"(?s)<style\b[^>]*>.*?</style>", " "),
    (r"<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
]


def strip_markup(text):
    """HTML/markup removal for web-crawl text: drop script/style blocks
    with their content, strip remaining tags, decode the common
    entities — chained JVM regexp_replace (RE2/Java-portable patterns),
    scan-speed, no UDF.  Pair with normalize_text to collapse the
    whitespace the tags leave behind."""
    import pyspark.sql.functions as F

    out = text
    for pat, rep in MARKUP_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def script_ratio_report(docs: DataFrame, lang_col: str = "lang",
                        text_col: str = "text") -> DataFrame:
    """Unicode-script composition per language: mean Latin / CJK /
    digit character ratios over non-space characters — the cheap
    script sanity check that catches mislabeled languages and
    mojibake batches before language-specific processing.

    Exactness: per-doc ratios quantize to micros, per-lang means are
    exact integer sums over those (one IEEE division, round 6); docs
    with no non-space characters are excluded from the means.

    Scale shape: one narrow regexp pass per row, one partial-agg
    shuffle onto languages."""
    nonspace = F.regexp_count(F.col(text_col), F.lit(r"\S"))
    latin = F.regexp_count(F.col(text_col), F.lit("[A-Za-z]"))
    cjk = F.regexp_count(F.col(text_col), F.lit(r"[\x{4e00}-\x{9fff}]"))
    digit = F.regexp_count(F.col(text_col), F.lit("[0-9]"))

    def ratio_q(c):
        return (F.floor(c.cast("double") * 1e6
                        / nonspace.cast("double") + F.lit(0.5))
                .cast("bigint"))

    base = (docs.filter(nonspace > 0)
            .select(F.col(lang_col).alias("lang"),
                    ratio_q(latin).alias("__l"),
                    ratio_q(cjk).alias("__c"),
                    ratio_q(digit).alias("__d")))
    agg = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__l").alias("__sl"), F.sum("__c").alias("__sc"),
        F.sum("__d").alias("__sd"))
    n = F.col("n_docs").cast("double")
    return agg.select(
        "lang", F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.col("__sl").cast("double") / 1e6 / n, 6)
        .alias("latin_ratio"),
        F.round(F.col("__sc").cast("double") / 1e6 / n, 6)
        .alias("cjk_ratio"),
        F.round(F.col("__sd").cast("double") / 1e6 / n, 6)
        .alias("digit_ratio"))


def bytes_per_token_report(docs: DataFrame, lang_col: str = "lang",
                           text_col: str = "text") -> DataFrame:
    """Bytes-per-token by language: total UTF-8 bytes over total
    whitespace tokens — the tokenizer-cost planning number (CJK and
    morphologically rich languages pay more bytes and more subwords
    per word; this catches both before budget math goes wrong).

    Exactness: byte and token counts are exact integers; the ratio is
    one IEEE division (round 6).  Scale: one narrow pass + one
    partial-agg shuffle onto languages."""
    toks = F.size(tokens(F.lower(F.col(text_col))))
    agg = (docs.groupBy(F.col(lang_col).alias("lang"))
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.octet_length(F.col(text_col)).cast("bigint"))
                .alias("__b"),
                F.sum(toks.cast("bigint")).alias("__t")))
    return agg.select(
        "lang", F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("__b").alias("total_bytes"),
        F.col("__t").alias("total_tokens"),
        F.when(F.col("__t") > 0,
               F.round(F.col("__b").cast("double")
                       / F.col("__t").cast("double"), 6))
        .alias("bytes_per_token"))


def code_switch_report(docs, id_col: str = "doc_id",
                       text_col: str = "text",
                       min_second: int = 2):
    """Code-switch detection: per document, the top-2 languages by
    marker-token hits and a flag when the SECOND language still has at
    least `min_second` hits — mixed-language documents poison both
    language-ID routing and monolingual tokenizer training, so they
    need their own bucket.

    Tie rule (shared with language_id and the SQL oracle): equal
    scores resolve to the lexicographically first language; a zero
    score surfaces 'und'.  Exact integer scores; no floats at all.

    Scale shape: N-language array-filter passes in ONE projection —
    no explode, no shuffle, no UDF."""
    marks = LANG_MARKERS
    toks = tokens(F.lower(F.col(text_col)))
    scored = []
    for lang in sorted(marks):
        score = F.size(F.filter(toks, lambda t: t.isin(marks[lang])))
        scored.append(F.struct(score.alias("score"),
                               F.lit(lang).alias("lang")))
    arr = F.array(*scored)
    zero = F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang"))
    best = F.aggregate(
        arr, zero,
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc))
    second = F.aggregate(
        arr, zero,
        lambda acc, x: F.when((x["lang"] != best["lang"])
                              & (x["score"] > acc["score"]), x)
        .otherwise(acc))
    l1 = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    l2 = F.when((best["score"] > 0) & (second["score"] > 0),
                second["lang"]).otherwise(F.lit("und"))
    return docs.select(
        F.col(id_col),
        l1.alias("lang_1"),
        F.greatest(best["score"], F.lit(0)).cast("bigint").alias("s_1"),
        l2.alias("lang_2"),
        F.greatest(second["score"], F.lit(0)).cast("bigint").alias("s_2"),
        ((best["score"] > 0) & (second["score"] >= min_second))
        .alias("code_switch"))
