"""Text analysis operators for training-data pipelines — all pure Catalyst
expressions (JVM-side, codegen'd; zero Python in the hot path).

Each returns a Column so callers compose them into one projection over the
scan (one pass, full column pruning).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A tiny in-expression stopword heuristic per language. Real pipelines swap
# in fastText/cld3 via mapInPandas; the Spark-side shape stays identical.
_LANG_PATTERNS = [
    ("zh", r"[一-鿿]"),
    ("ja", r"[぀-ヿ]"),
    ("ru", r"[Ѐ-ӿ]"),
    ("en", r"(?i)\b(the|and|of|to|is)\b"),
    ("es", r"(?i)\b(el|la|los|las|una)\b"),
    ("fr", r"(?i)\b(le|les|des|une|est)\b"),
    ("de", r"(?i)\b(der|die|das|und|ist)\b"),
]


_UPPER_ASCII = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def token_count(col: str) -> Column:
    """Whitespace token count; 0 for empty/blank text.

    Counted as separator runs + 1 (``regexp_count``) rather than
    materializing the split array just to take its size — same value on
    trimmed text (no leading/trailing separators), one regex pass, zero
    allocation (guide §4.1: prefer the cheapest built-in)."""
    t = F.trim(F.col(col))
    return F.when(F.length(t) == 0, F.lit(0)) \
            .otherwise(F.regexp_count(t, F.lit("[ \t\n\f\r]+")) + 1) \
            .alias("n_tokens")


def bpe_ish_token_count(col: str) -> Column:
    """A BPE-flavored token estimate: word pieces + punctuation as units
    — the cheap stand-in for a real tokenizer when budgeting LLM training
    tokens.

    Closed form: maximal ``\\w+`` runs plus non-word-non-space chars —
    identical to splitting at every word/non-word boundary and dropping
    blank pieces (each non-word char is its own piece; blank pieces are
    exactly the whitespace ones), but two linear regex passes instead of
    a lookaround split that allocates a piece array per row. This is
    also literally the formula the DuckDB oracle replays."""
    t = F.trim(F.col(col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.regexp_count(t, F.lit(r"\w+"))
        + F.regexp_count(t, F.lit(r"[^\w\s]")))


def punct_count(col: str, chars: str = ".!?") -> Column:
    """Count of chars in ``chars`` via translate (char-table lookup) —
    equals length(regexp_replace(col, [^chars], '')) without the regex
    engine or the intermediate string."""
    c = F.col(col)
    return (F.length(c) - F.length(F.translate(c, chars, ""))) \
        .alias("n_punct")


def upper_ratio(col: str, digits: int = 6) -> Column:
    c = F.col(col)
    up = F.length(c) - F.length(F.translate(c, _UPPER_ASCII, ""))
    n = F.length(c)
    return F.round(F.when(n > 0, up.cast("double") / n).otherwise(F.lit(0.0)),
                   digits)


def stopword_ratio(col: str, stopwords=None, digits: int = 6) -> Column:
    sw = stopwords or ["the", "and", "of", "to", "a", "is", "in", "it"]
    toks = F.split(F.trim(F.lower(F.col(col))), "[ \t\n\f\r]+")
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    n = F.size(toks)
    return F.round(F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0)),
                   digits)


def quality_score(col: str) -> Column:
    """Composite [0,1] quality heuristic: enough length, sane punctuation
    density, not shouting, some stopwords — the classic cheap pre-filter
    before expensive model-based scoring."""
    n = F.length(F.col(col))
    len_ok = F.when(n >= 200, 1.0).otherwise(n.cast("double") / 200.0)
    punct_density = punct_count(col).cast("double") / F.greatest(n, F.lit(1))
    punct_ok = F.when(punct_density <= 0.05, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (punct_density - 0.05) * 10))
    shout = upper_ratio(col)
    shout_ok = F.when(shout <= 0.3, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (shout - 0.3) * 2))
    sw_ok = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    # no final round: the blend of 6-dp components divided by 4 lands on
    # exact quarter-ties where engines' round() implementations disagree;
    # the raw double is bit-deterministic (pure per-row IEEE arithmetic)
    return (len_ok + punct_ok + shout_ok + sw_ok) / 4.0


def lang_id(col: str) -> Column:
    """n-gram/charset heuristic language guess (first matching rule)."""
    expr = F.lit("other")
    for lang, pat in reversed(_LANG_PATTERNS):
        expr = F.when(F.col(col).rlike(pat), lang).otherwise(expr)
    return expr


def fingerprint(col: str) -> Column:
    """Deterministic document fingerprint: md5 of case/whitespace-normalized
    text — the exact-dedup key (rolling/shingle hashing lives in
    sketches.minhash for the near-dup path)."""
    norm = F.regexp_replace(F.lower(F.col(col)), "[ \t\n\f\r]+", " ")
    return F.md5(F.trim(norm))


def grapheme_length(col: str):
    """Grapheme-cluster count (Arrow-batched pandas UDF).

    The reference's --char-len counts GRAPHEMES, not code points
    (tsv-filter.d:331); Spark's char_length counts code points. The
    segmentation is UAX #29 extended grapheme clusters, rules GB3-GB13 +
    GB9c + GB999, with EXACT property tables generated from the Unicode
    database (functions/_unicode_tables.py; Hangul stays arithmetic).
    Hot path: when the ``regex`` module is importable its C-implemented
    ``\\X`` engine does the counting (~20x the per-char Python loop);
    the pure-Python segmenter (functions.grapheme) is the implementation
    of record and the two are fuzz-asserted identical over every
    property class in tests/test_pipeline_ops.py.
    """
    from pyspark.sql.functions import pandas_udf

    from tsv_utils_spark.functions.grapheme import count_graphemes

    @pandas_udf("int")
    def _glen(s: pd.Series) -> pd.Series:
        try:
            import regex

            x = regex.compile(r"\X")
            return s.fillna("").map(lambda t: len(x.findall(t)))
        except ImportError:
            return s.fillna("").map(count_graphemes)

    return _glen(F.col(col))


# PII patterns chosen to be portable across regex engines (Java regex,
# RE2/DuckDB): no lookaround, no backreferences. Order matters: emails
# before phones (an email's digits must not half-match as a phone).
_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d{1,3}[ .\-]?\(?\d{2,4}\)?([ .\-]?\d{2,4}){2,4}"),
]


def scrub_pii(df: DataFrame, col: str = "text",
              id_col: str = "doc_id",
              replacement: str = "[{kind}]") -> DataFrame:
    """Redact emails / IPv4 addresses / phone-like numbers — the
    standard PII pass of training-data pipelines, as one Catalyst
    projection (zero Python). Returns (id, scrubbed text, per-kind
    match counts). Patterns are deliberately lookaround-free so any
    RE2-class engine replays them identically (the DuckDB oracle does).
    """
    c = F.coalesce(F.col(col), F.lit(""))
    counts = []
    scrubbed = c
    for kind, pat in _PII_PATTERNS:
        # each kind counts on the PARTIALLY-scrubbed value (earlier kinds
        # already redacted) so one span never counts twice
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0)))
             .alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(
            scrubbed, pat, replacement.format(kind=kind.upper()))
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


# RE2-portable URL pattern (no lookaround): scheme://host[:port][/path]
_URL_PATTERN = r"https?://[A-Za-z0-9.\-]+(:\d+)?(/[^ \t\n\f\r<>\"']*)?"
_DOMAIN_PATTERN = r"https?://([A-Za-z0-9.\-]+)"


def extract_urls(df: DataFrame, col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document URL inventory: (id, urls array, domains array,
    n_urls) — source attribution / link-density filtering. One codegen
    projection; the pattern is lookaround-free so RE2 engines replay it
    identically."""
    c = F.coalesce(F.col(col), F.lit(""))
    urls = F.regexp_extract_all(c, F.lit(_URL_PATTERN), F.lit(0))
    domains = F.array_distinct(
        F.transform(urls,
                    lambda u: F.lower(F.regexp_extract(u, _DOMAIN_PATTERN,
                                                       1))))
    return df.select(F.col(id_col), urls.alias("urls"),
                     domains.alias("domains"),
                     F.size(urls).cast("int").alias("n_urls"))


def compression_ratio(df: DataFrame, col: str = "text",
                      id_col: str = "doc_id",
                      level: int = 6) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    CCNet/Dolma-style repetitiveness signal: highly repetitive or
    boilerplate text compresses far below ~0.4, natural prose sits
    higher. Arrow-batched (zlib is C; the per-doc call is the kernel,
    like the codecs) — no SQL oracle exists for zlib, so the gate is
    pytest on constructed low/high-entropy docs."""
    import zlib

    def gen(batches):
        for pdf in batches:
            texts = pdf[col].fillna("")
            raws = [t.encode("utf-8") for t in texts]
            ratios = [len(zlib.compress(b, level)) / max(len(b), 1)
                      for b in raws]
            yield pd.DataFrame({id_col: pdf[id_col],
                                "raw_bytes": [len(b) for b in raws],
                                "compression_ratio": ratios})

    # id field keeps its REAL type (string/int/long ids all work)
    from tsv_utils_spark.operators.dedup import _field_ddl

    return df.select(id_col, col).mapInPandas(
        gen, schema=f"{_field_ddl(df, id_col)}, raw_bytes long, "
                    f"compression_ratio double")


_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _check_keep(keep, reserved: set, op: str) -> tuple:
    """Validate a quality operator's keep= passthrough: reject the
    natural bare-string misuse (it would iterate per character) and
    names that collide with the operator's own output columns (silent
    duplicate columns break the next select with an ambiguous-
    reference error far from the cause)."""
    if isinstance(keep, str):
        raise TypeError(f"{op}: keep must be a tuple/list of column "
                        f"names, got the bare string {keep!r} — write "
                        f"keep=({keep!r},)")
    keep = tuple(keep)
    clash = [k for k in keep if k in reserved]
    if clash:
        raise ValueError(f"{op}: keep names {clash} collide with the "
                         f"operator's output columns")
    return keep


def gopher_quality(df: DataFrame, col: str = "text",
                   id_col: str = "doc_id",
                   keep: tuple = ()) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    "Scaling Language Models", App. A1.1) plus its repetition rules'
    line-level pair — the standard cheap pre-filter of LLM data
    pipelines, here as ONE pure-Catalyst projection (zero Python,
    single pass):

    - 50 <= word_count <= 100,000
    - 3 <= mean_word_length <= 10
    - symbol-to-word ratio ('#' and ellipsis) <= 0.1
    - <= 90% of lines start with a bullet; <= 30% end with ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 distinct stop words of {the,be,to,of,and,that,have,with}
    - duplicate-line fraction <= 0.30; duplicate-line character
      fraction <= 0.20

    Returns (id, *keep, metrics..., gopher_pass); ``keep`` names input
    columns passed through unchanged, so quality stages CHAIN into one
    scan (e.g. c4_quality(gopher_quality(d, keep=("lang", "text"))))
    instead of self-joining on the id. Fraction columns are raw
    int/int IEEE divisions (bit-identical across engines — the oracle
    replays them in DuckDB list comprehensions).
    """
    keep = _check_keep(keep, {
        "n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
        "n_stopwords", "bullet_frac", "ellipsis_end_frac",
        "dup_line_frac", "dup_char_frac", "gopher_pass", id_col},
        "gopher_quality")
    c = F.coalesce(F.col(col), F.lit(""))
    t = F.trim(c)
    words = F.split(t, "[ \t\n\f\r]+")
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(words))
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    sum_word_len = F.aggregate(
        F.transform(words, F.length),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    mean_wl = sum_word_len.cast("double") / nw
    n_hash = F.length(F.regexp_replace(c, "[^#]", ""))
    n_ell = (F.length(F.regexp_replace(c, "[^…]", ""))
             + (F.length(c) - F.length(F.replace(c, F.lit("..."),
                                                 F.lit("")))) / F.lit(3))
    symbol_ratio = (n_hash + n_ell).cast("double") / nw
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = alpha_words.cast("double") / nw
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    n_stops = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)), stops))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"^[•‣▪*-]"))).cast("double") \
        / n_lines
    ell_end_frac = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))).cast("double") \
        / n_lines
    dup_line_frac = (F.lit(1.0)
                     - F.size(F.array_distinct(lines)).cast("double")
                     / n_lines)
    line_chars = F.aggregate(F.transform(lines, F.length),
                             F.lit(0).cast("long"), lambda a, x: a + x)
    uniq_chars = F.aggregate(
        F.transform(F.array_distinct(lines), F.length),
        F.lit(0).cast("long"), lambda a, x: a + x)
    dup_char_frac = (line_chars - uniq_chars).cast("double") \
        / F.greatest(line_chars, F.lit(1)).cast("double")
    gopher_pass = ((n_words >= 50) & (n_words <= 100_000)
                   & (mean_wl >= 3.0) & (mean_wl <= 10.0)
                   & (symbol_ratio <= 0.1)
                   & (bullet_frac <= 0.9) & (ell_end_frac <= 0.3)
                   & (alpha_frac >= 0.8) & (n_stops >= 2)
                   & (dup_line_frac <= 0.3) & (dup_char_frac <= 0.2))
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        n_stops.alias("n_stopwords"),
        bullet_frac.alias("bullet_frac"),
        ell_end_frac.alias("ellipsis_end_frac"),
        dup_line_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_char_frac"),
        gopher_pass.alias("gopher_pass"))


def top_ngram_stats(df: DataFrame, col: str = "text",
                    id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher's n-gram repetition metric, distributed: the fraction of a
    document's characters covered by its most frequent word n-gram
    (count x gram chars / doc chars, clipped to 1.0 — the standard
    simplification that public pipelines apply, since exact positional
    coverage of overlapping repeats needs per-occurrence spans).

    Plan: explode grams -> per-(doc, gram) count (map-side combine) ->
    per-doc max over (count, gram len, gram) struct — deterministic
    tie-break, two shuffles, no Python. Returns
    (id, top_gram, top_n, top_char_frac).

    NB: the gram construction here intentionally DIFFERS from
    dedup._shingle_expr's: a doc with fewer than n tokens has NO n-gram
    (empty array -> frac 0), whereas signatures need a whole-doc
    fallback shingle. Keep both tokenizers on the shared whitespace
    class [ \\t\\n\\f\\r]+ (RE2-portable) if either changes."""
    c = F.coalesce(F.col(col), F.lit(""))
    t = F.trim(F.lower(c))
    toks = F.split(t, "[ \t\n\f\r]+")
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")) \
             .otherwise(F.transform(
                 F.sequence(F.lit(0), F.size(toks) - n),
                 lambda i: F.array_join(F.slice(toks, i + 1, n), " ")))
    base = df.select(F.col(id_col), F.length(c).alias("__chars"),
                     F.explode_outer(grams).alias("__g"))
    counts = base.groupBy(id_col, "__chars", "__g") \
                 .agg(F.count(F.lit(1)).alias("__n"))
    pick = F.max(F.when(F.col("__g").isNotNull(),
                        F.struct(F.col("__n"),
                                 F.length("__g").alias("__l"),
                                 F.col("__g")))).alias("__top")
    top = counts.groupBy(id_col, "__chars").agg(pick)
    frac = F.least(
        F.lit(1.0),
        F.coalesce(F.col("__top.__n") * F.col("__top.__l"), F.lit(0))
         .cast("double")
        / F.greatest("__chars", F.lit(1)).cast("double"))
    return top.select(
        F.col(id_col),
        F.col("__top.__g").alias("top_gram"),
        F.coalesce(F.col("__top.__n"), F.lit(0)).cast("int").alias("top_n"),
        frac.alias("top_char_frac"))


def analyze(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text profile: all metrics in a single projection.

    The projection is regex/md5-heavy, so a parallelism-starved scan
    (single-row-group parquet) would run it on 1-2 cores; one cheap
    round-robin exchange first puts the expensive expressions on every
    core (measured 7.4 s -> 1.0 s on a 50k-doc one-row-group file at
    local[32]; no-op when the scan is already parallel)."""
    from tsv_utils_spark.functions.parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    return df.select(
        id_col,
        token_count(col).alias("n_tokens"),
        bpe_ish_token_count(col).alias("n_pieces"),
        punct_count(col).alias("n_punct"),
        upper_ratio(col).alias("upper_ratio"),
        stopword_ratio(col).alias("stopword_ratio"),
        quality_score(col).alias("quality"),
        lang_id(col).alias("lang_guess"),
        fingerprint(col).alias("fingerprint"),
    )


def remove_boilerplate_lines(df: DataFrame, col: str = "text",
                             id_col: str = "doc_id",
                             min_docs: int = 3,
                             keep_empty_lines: bool = True) -> DataFrame:
    """C4-style boilerplate line removal: drop every line whose
    normalized form (lower + trim) appears in >= ``min_docs`` DISTINCT
    documents (navigation chrome, cookie banners, license headers),
    then reassemble each document from its surviving lines in original
    order. Returns (id_col, text) with the cleaned text.

    Scale shape: explode to lines (narrow), ONE count-distinct shuffle
    on the normalized line, anti-join (AQE may broadcast the hot-line
    set — it is tiny by construction), one groupBy(id) to reassemble.
    The full text column never shuffles twice.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(col), F.lit("")), "\n"))
         .alias("__pos", "__line"))
    norm = F.lower(F.trim(F.col("__line")))
    tagged = lines.withColumn("__norm", norm)
    hot = (tagged.where(F.col("__norm") != "")
                 .groupBy("__norm")
                 .agg(F.countDistinct(id_col).alias("__nd"))
                 .where(F.col("__nd") >= min_docs)
                 .select("__norm"))
    survivors = tagged.join(hot, "__norm", "left_anti")
    if not keep_empty_lines:
        survivors = survivors.where(F.col("__norm") != "")
    rebuilt = (survivors.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("__pos"), F.col("__line")))),
                       lambda s: s["__line"]),
                   "\n").alias(col)))
    # docs whose every line was boilerplate drop out of the groupBy —
    # restore them with empty text so the row set is stable
    return df.select(id_col).join(rebuilt, id_col, "left") \
        .select(id_col, F.coalesce(F.col(col), F.lit("")).alias(col))


def token_frequency_stats(df: DataFrame, col: str = "text",
                          id_col: str = "doc_id",
                          top_k: int = 1000) -> DataFrame:
    """Corpus-frequency quality signals per document, integer-exact:

    - ``n_tokens``      — whitespace tokens;
    - ``sum_token_freq``— sum over the doc's tokens of each token's
      CORPUS occurrence count (a long; high = common/boilerplate-ish
      wording, low = rare/unique wording);
    - ``mean_token_freq`` — sum_token_freq / n_tokens (ONE final IEEE
      divide of two exact integers — bit-identical across engines);
    - ``oov_frac``      — fraction of tokens outside the corpus top-K
      vocabulary (by count desc, token asc) — the vocab-coverage signal
      used when filtering to a tokenizer's effective vocabulary.

    Scale shape: one explode + ONE token-count shuffle builds the
    vocab; the top-K set is broadcast; per-doc aggregation is a single
    groupBy(id). All comparisons are on integers until the final
    divides.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.coalesce(F.col(col),
                                                    F.lit("")))),
                          "[ \t\n\f\r]+")).alias("__tok")) \
        .where(F.col("__tok") != "")
    vocab = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    topk = (vocab.orderBy(F.col("__cnt").desc(), F.col("__tok").asc())
                 .limit(top_k)
                 .select("__tok", F.lit(1).alias("__in_topk")))
    scored = (toks.join(vocab, "__tok")
                  .join(F.broadcast(topk), "__tok", "left"))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__cnt").alias("sum_token_freq"),
        F.sum(F.when(F.col("__in_topk").isNull(), 1)
               .otherwise(0)).alias("__n_oov"))
    out = per_doc.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("sum_token_freq").cast("long").alias("sum_token_freq"),
        (F.col("sum_token_freq").cast("double")
         / F.col("n_tokens").cast("double")).alias("mean_token_freq"),
        (F.col("__n_oov").cast("double")
         / F.col("n_tokens").cast("double")).alias("oov_frac"))
    # empty/whitespace-only docs have no token rows — restore with zeros
    return df.select(id_col).join(out, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce(F.col("sum_token_freq"),
                   F.lit(0).cast("long")).alias("sum_token_freq"),
        F.col("mean_token_freq"),
        F.col("oov_frac"))


def c4_quality(df: DataFrame, col: str = "text",
               id_col: str = "doc_id",
               min_words_per_line: int = 5,
               min_sentences: int = 3,
               keep: tuple = ()) -> DataFrame:
    """The published C4 cleaning rules (Raffel et al. 2020, §2.2) as ONE
    pure-Catalyst projection — the other standard cheap pre-filter next
    to :func:`gopher_quality`:

    - keep only lines that end in terminal punctuation (``.!?"”``);
    - keep only lines with >= ``min_words_per_line`` words;
    - drop lines containing the word "javascript" (case-insensitive);
    - drop pages with fewer than ``min_sentences`` sentences AFTER the
      line filter;
    - drop pages containing "lorem ipsum" (case-insensitive);
    - drop pages containing a curly brace ``{``.

    (C4 also applies an external bad-words list — supply it upstream as
    a tsv-filter regex; it is a data file, not an operator.)

    Returns (id, *keep, n_lines, n_lines_kept, frac_lines_kept,
    n_sentences, has_lorem_ipsum, has_curly_brace, clean_text,
    c4_pass); ``keep`` passes input columns through so quality stages
    chain into one scan. Fractions
    are single int/int IEEE divides (bit-identical across engines — the
    oracle replays them in DuckDB list comprehensions).
    """
    keep = _check_keep(keep, {
        "n_lines", "n_lines_kept", "frac_lines_kept", "n_sentences",
        "has_lorem_ipsum", "has_curly_brace", "clean_text", "c4_pass",
        id_col}, "c4_quality")
    c = F.coalesce(F.col(col), F.lit(""))
    lines = F.split(c, "\n")

    def line_kept(ln):
        t = F.trim(ln)
        return (t.rlike('[.!?"”]$')
                & (F.size(F.split(t, "[ \t\n\f\r]+"))
                   >= min_words_per_line)
                & ~F.lower(ln).contains("javascript"))

    kept = F.filter(lines, line_kept)
    clean = F.array_join(kept, "\n")
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    # sentences of the CLEANED page: spans between terminal-punctuation
    # runs that carry at least one letter/digit (C4 applies its
    # >=3-sentence rule post-filter). Requiring \p{L}/\p{N} — not just
    # non-blank — keeps a closing quote after terminal punctuation
    # ('."') from counting as an extra sentence
    n_sent = F.size(F.filter(F.split(clean, "[.!?]+"),
                             lambda s: s.rlike(r"[\p{L}\p{N}]")))
    lorem = F.lower(c).contains("lorem ipsum")
    brace = c.contains("{")
    c4_pass = (n_sent >= min_sentences) & ~lorem & ~brace
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        n_lines.cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_lines_kept"),
        (n_kept.cast("double")
         / F.greatest(n_lines, F.lit(1)).cast("double"))
        .alias("frac_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_curly_brace"),
        clean.alias("clean_text"),
        c4_pass.alias("c4_pass"))


def chunk_documents(df: DataFrame, col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Context-window chunking: split each document's whitespace tokens
    into overlapping windows of ``max_tokens`` with ``overlap`` tokens
    carried between consecutive chunks (stride = max_tokens - overlap)
    — the standard prep for embedding or LM training over long
    documents. Chunk starts are 0, stride, 2*stride, ...; the number of
    chunks is 1 + ceil(max(n_tokens - max_tokens, 0) / stride), so the
    last chunk always reaches the final token and no start lies beyond
    the text. Empty/blank documents produce zero chunks.

    Returns (id_col, chunk_idx, n_chunk_tokens, chunk_text) — one pure
    Catalyst projection + explode; no shuffle at all (chunking
    parallelizes with the scan).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got "
                         f"overlap={overlap} max_tokens={max_tokens}")
    stride = max_tokens - overlap
    # trim over the FULL whitespace class (F.trim strips only spaces:
    # a '\n'-only doc would otherwise yield a phantom ['',''] chunk,
    # and leading/trailing tabs/newlines would add empty tokens that
    # shift every chunk boundary)
    t = F.regexp_replace(F.coalesce(F.col(col), F.lit("")),
                         r"^[ \t\n\f\r]+|[ \t\n\f\r]+$", "")
    toks = F.split(t, "[ \t\n\f\r]+")
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(toks))
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        (F.lit(1) + F.floor((F.greatest(n - max_tokens, F.lit(0))
                             + F.lit(stride - 1))
                            / F.lit(stride))).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("idx"),
            F.slice(toks, i * stride + 1, max_tokens).alias("__t")))
    base = df.select(
        F.col(id_col),
        F.explode(F.when(n_chunks > 0, chunks)
                   .otherwise(F.array().cast(
                       "array<struct<idx:int,__t:array<string>>>")))
         .alias("__c"))
    return base.select(
        F.col(id_col),
        F.col("__c.idx").alias("chunk_idx"),
        F.size("__c.__t").alias("n_chunk_tokens"),
        F.array_join("__c.__t", " ").alias("chunk_text"))


def flag_bad_words(df: DataFrame, words, col: str = "text",
                   flag_col: str = "has_bad_word") -> DataFrame:
    """The C4 bad-words page rule ("removed any page containing a word
    on the blocklist") as a flag column. The list itself is data the
    caller supplies (the published pipelines use externally maintained
    lists); matching semantics here are C4's:

    - single entries match at WORD BOUNDARIES, C4's ``\\b word \\b``
      regex semantics: the entry must appear as a maximal run of word
      characters ([a-z0-9_]), so 'darn.', '(darn)' and 'darn-ish'
      all flag for 'darn' (punctuation and hyphens are boundaries,
      exactly as C4's regex treats them) while 'darned' and
      'classroom' (for 'ass') do not;
    - multi-word entries match with boundaries on both ends and
      whitespace collapsed, so reflowed phrases still match.

    Pure Catalyst: single entries become one literal array probed with
    ``arrays_overlap`` (hash-set lookup JVM-side) against the doc's
    distinct word-character runs; phrase entries fold into boundary-
    anchored ``rlike`` checks over the whitespace-collapsed text. Both
    stay inside the scan's projection — no shuffle, no Python. List
    size is bounded by plan size (fine for the published lists, ~2k
    entries); for million-entry lists use a broadcast join on exploded
    tokens instead.
    """
    import re as _re

    words = [w.lower() for w in words]
    tokens = [w for w in words if not any(c.isspace() for c in w)]
    phrases = [w for w in words if any(c.isspace() for c in w)]
    low = F.lower(F.coalesce(F.col(col), F.lit("")))
    checks = []
    if tokens:
        # maximal [a-z0-9_] runs == the \b-delimited words of the
        # lowercased text (RE2-portable: a split, not a lookaround)
        toks = F.array_distinct(F.split(low, "[^a-z0-9_]+"))
        checks.append(F.arrays_overlap(
            toks, F.array(*[F.lit(w) for w in tokens])))
    if phrases:
        collapsed = F.regexp_replace(low, "[ \t\n\f\r]+", " ")
        for p in phrases:
            pat = (r"(^|[^a-z0-9_])"
                   + _re.escape(" ".join(p.split()))
                   + r"($|[^a-z0-9_])")
            checks.append(collapsed.rlike(pat))
    flag = checks[0] if checks else F.lit(False)
    for c in checks[1:]:
        flag = flag | c
    return df.withColumn(flag_col, flag)
