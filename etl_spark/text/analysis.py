"""Text analysis for training-data pipelines — language ID, quality
scoring, token counting, document fingerprinting — all as native
column expressions (JVM, whole-stage codegen; zero Python in the hot
path). Operates on the ``documents`` table (doc_id, text, lang,
source, n_chars) but every function takes a Column and composes.

These extend the reference's scalar-function layer (SURVEY.md §2.9)
with the ops a 100 TB document pipeline needs; the reference's own
text ops are name normalization (lib/catalog/owid/catalog/utils.py:17-26)
and checksum hashing (etl/files.py:51-80) — both mirrored here
(fingerprint == normalize + sha256).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs, single digits, single symbols
# (GPT-2-style pre-tokenizer shape, ASCII-only so Java/RE2 semantics agree).
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

PUNCT = ".,!?;:"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]

# tiny marker-word profiles for heuristic language ID (n-gram/stopword
# heuristic; deterministic, dependency-free)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" la ", " el ", " que "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " les ", " est "],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty-string safe)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (regexp_extract_all — one codegen
    scan; the cheap proxy for tokenizer cost at corpus scale)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)).cast("long")


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring via length arithmetic —
    identical semantics in any engine (no regex), codegen-friendly."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def quality_features(df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None) -> DataFrame:
    """Per-document quality features: length, token stats, punctuation
    ratio, stopword ratio, and a composite keep/drop flag — the
    Gopher/C4-style rule family, one projection pass."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct_n = sum((_count_occurrences(t, ch) for ch in PUNCT), F.lit(0))
    stop_n = sum(
        (_count_occurrences(F.concat(F.lit(" "), F.lower(t), F.lit(" ")), f" {w} ") for w in STOPWORDS),
        F.lit(0),
    )
    out = df.select(
        *(id_cols or [c for c in df.columns if c != text_col]),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 6).alias("mean_token_len"),
        F.round(punct_n / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_n / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("mean_token_len") >= 2)
        & (F.col("mean_token_len") <= 15)
        & (F.col("stopword_ratio") > 0)
    )
    return out.withColumn("quality_keep", keep)


def repetition_features(
    df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
) -> DataFrame:
    """Gopher-style repetition signals: duplicate word-bigram fraction
    and duplicate line fraction (1 - distinct/total). High values mark
    boilerplate / template text the quality filter should drop. One
    projection, arrays built per row — nothing shuffles."""
    t = F.col(text_col)
    sh = word_shingles(t, 2)
    lines = F.filter(F.split(t, r"\n"), lambda x: F.length(F.trim(x)) > 0)

    def dup_ratio(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0,
            F.round(1 - F.size(F.array_distinct(arr)) / n, 6),
        ).otherwise(F.lit(0.0))

    return df.select(
        *(id_cols or [c for c in df.columns if c != text_col]),
        F.size(sh).cast("long").alias("n_2grams"),
        dup_ratio(sh).alias("dup_2gram_ratio"),
        F.size(lines).cast("long").alias("n_lines"),
        dup_ratio(lines).alias("dup_line_ratio"),
    )


def langid(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-substring counts with a
    fixed precedence order for ties; 'und' when no marker hits.
    Pure column arithmetic — at 100 TB this stays in codegen."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum((_count_occurrences(padded, m) for m in markers), F.lit(0))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed: earlier languages in LANG_MARKERS win ties
    for lang in reversed(list(scores)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: lowercase, strip non-alnum,
    collapse whitespace, sha256 — the reference's checksum_str
    (etl/files.py:78-80) over a normalized form; dedup key for
    near-identical-after-formatting documents."""
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.sha2(norm, 256)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>); empty when < n tokens.

    Built by folding zip_with over j-shifted slices of the token
    array: each zip_with evaluates its array inputs once per ROW and
    combines elementwise (an index-transform with element_at instead
    re-evaluates the tokenizer per element — O(tokens^2), measured
    10x+ slower). zip_with pads the shorter side with null and
    concat(null) is null, so entries past the last full shingle fall
    out in the final filter."""
    toks = tokens(F.lower(text))
    k = F.size(toks)
    sh = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(k - j, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.filter(sh, lambda x: x.isNotNull())


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document -> (id, term, tf, tfidf,
    rank). tfidf = tf * ln(N / df), rounded to ``round_to`` decimals
    BEFORE ranking (ties broken by term asc) so the ranking is stable
    across engines/libms.

    Plan shape for 100 TB: one tokenize+explode scan -> (doc, term)
    counts (map-side combinable); df is an aggregate of that SAME
    (doc, term) table, not a second text scan; N rides in as a 1-row
    broadcast cross join; top-k is a per-doc window that Catalyst
    executes as WindowGroupLimit. The shuffles carry (doc_id, term,
    count) — never the document payload."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.countDistinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.floor(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df"))
                * F.lit(10.0 ** round_to) + F.lit(0.5)
            ) / F.lit(10.0 ** round_to),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )
