"""Line-level dedup, contamination screening, PII redaction, source
mixing — corpus-cleaning ops (training-data family, per the brief)."""

from pyspark.sql import functions as F

from etl_spark.ops.sample import mix_sources
from etl_spark.text.contamination import contamination, word_shingles
from etl_spark.text.lines import (
    boilerplate_lines,
    split_lines,
    strip_boilerplate,
    word_chunk_lines,
)
from etl_spark.text.redact import PII_PATTERNS, redact

HEADER = "Copyright 2024 Example Corp\nLicensed under Apache-2.0"


def _docs(spark):
    rows = [
        (0, f"{HEADER}\nalpha beta\ngamma"),
        (1, f"{HEADER}\ndelta\nepsilon zeta"),
        (2, f"{HEADER}\nalpha beta\neta"),
        (3, "totally unique\ndocument three"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_found(spark):
    lines = split_lines(_docs(spark), "doc_id", "text")
    b = boilerplate_lines(lines, "doc_id", min_docs=3)
    # both header lines occur in docs 0,1,2; 'alpha beta' only in 0,2
    assert b.count() == 2
    b2 = boilerplate_lines(lines, "doc_id", min_docs=2)
    assert b2.count() == 3


def test_strip_boilerplate_preserves_order(spark):
    out = strip_boilerplate(_docs(spark), "doc_id", "text", min_docs=3)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["text"] == "alpha beta\ngamma"
    assert got[0]["n_lines"] == 4 and got[0]["n_removed"] == 2
    assert got[1]["text"] == "delta\nepsilon zeta"
    assert got[3]["text"] == "totally unique\ndocument three"
    assert got[3]["n_removed"] == 0


def test_word_chunk_segmentation(spark):
    df = spark.createDataFrame([(0, "a b c d e f g h i j")], "doc_id long, text string")
    chunks = word_chunk_lines(df, "doc_id", "text", n_words=4)
    got = [r["line"] for r in chunks.orderBy("pos").collect()]
    assert got == ["a b c d", "e f g h", "i j"]
    # chunk-mode strip round-trips through the same segmentation
    out = strip_boilerplate(df, "doc_id", "text", min_docs=2, n_words=4)
    assert out.first()["text"] == "a b c d e f g h i j"


def test_contamination_detects_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris obviously")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "prefix words what is the capital of france paris obviously suffix"),
            (1, "completely unrelated text about spark shuffles and joins here"),
            (2, "what is the capital of france paris obviously"),  # verbatim
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_contaminated_ngrams"] for r in
           contamination(corpus, bench, "doc_id", "text", n=5).collect()}
    assert 2 in got and 0 in got and 1 not in got
    # the verbatim copy shares every benchmark shingle
    n_bench = word_shingles(bench, "doc_id", "text", n=5).select("shingle_key").distinct().count()
    assert got[2] == n_bench
    assert got[0] >= n_bench  # superstring: all benchmark shingles + boundary ones it also shares


def test_contamination_short_doc(spark):
    bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    corpus = spark.createDataFrame([(0, "tiny doc"), (1, "other")], "doc_id long, text string")
    got = {r["doc_id"] for r in contamination(corpus, bench, "doc_id", "text", n=8).collect()}
    assert got == {0}


def test_redact_patterns(spark):
    df = spark.createDataFrame(
        [
            (0, "mail alice@example.com or 10.0.0.1 acct 123456789 key sk-abcdef123456 ok"),
            (1, "clean text, short number 123 stays"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in redact(df, "text").collect()}
    assert out[0]["text"] == "mail [email] or [ipv4] acct [digits] key [secret] ok"
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_digits"], out[0]["n_secret"]) == (1, 1, 1, 1)
    assert out[1]["text"] == "clean text, short number 123 stays"
    assert out[1]["n_digits"] == 0
    # counts are taken on the ORIGINAL text: the email's digits never
    # leak into the digit-run count (word-boundary + order contract)
    assert set(PII_PATTERNS) == {"email", "ipv4", "secret", "digits"}


def test_mix_sources_replication_and_stability(spark):
    rows = [(i, "a" if i < 100 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, src string")
    out = mix_sources(df, "k", "src", {"a": 2.5, "b": 0.25}, salt="s1")
    by_src = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert 200 <= by_src["a"] <= 300 and by_src["a"] > 230  # 2 full + ~half
    assert 10 <= by_src["b"] <= 45
    # every 'a' key appears at least twice (integer part is exact)
    mins = out.filter(F.col("src") == "a").groupBy("k").count().agg(F.min("count")).first()[0]
    assert mins == 2 or mins == 3
    # deterministic: identical rerun, and membership stable under growth
    out2 = mix_sources(df, "k", "src", {"a": 2.5, "b": 0.25}, salt="s1")
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0
    grown = spark.createDataFrame(rows + [(1000 + i, "b") for i in range(50)], "k long, src string")
    out3 = mix_sources(grown, "k", "src", {"a": 2.5, "b": 0.25}, salt="s1")
    old_b = {r["k"] for r in out.filter(F.col("src") == "b").select("k").distinct().collect()}
    new_b = {r["k"] for r in out3.filter((F.col("src") == "b") & (F.col("k") < 200)).select("k").distinct().collect()}
    assert old_b == new_b
    # unmentioned sources are dropped
    assert mix_sources(df, "k", "src", {"a": 1.0}, salt="s1").filter(F.col("src") == "b").count() == 0


def test_pack_greedy_assignment(spark):
    from etl_spark.text.pack import pack_greedy, pack_stats

    rows = [(0, "s", 60), (1, "s", 50), (2, "s", 10), (3, "s", 100), (4, "t", 120)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_greedy(df, "doc_id", "n_tok", 100, "source").collect()}
    # source s cumsum starts: 0, 60, 110, 120 -> packs 0,0,1,1
    assert got[0] == (0, 0) and got[1] == (0, 60)
    assert got[2] == (1, 10) and got[3] == (1, 20)
    assert got[4] == (0, 0)  # independent per source
    stats = {(r["source"], r["pack_id"]): (r["n_docs"], r["tokens_started"])
             for r in pack_stats(df, "doc_id", "n_tok", 100, "source").collect()}
    assert stats[("s", 0)] == (2, 110) and stats[("s", 1)] == (2, 110)
    assert stats[("t", 0)] == (1, 120)


def test_pack_greedy_duplicate_ids_deterministic(spark):
    """Duplicate ids within a part must NOT be window-frame peers: the
    default RANGE frame would hand each tied doc a running total that
    already includes the other's tokens (both offsets nonzero, answer
    depending on arrival order). The ROWS frame + full-row tiebreak
    packs them sequentially and identically on every run."""
    from etl_spark.text.pack import pack_greedy

    rows = [(1, "s", 60), (1, "s", 70), (2, "s", 30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    outs = []
    for _ in range(3):
        got = sorted(
            (r["n_tok"], r["pack_id"], r["pack_offset"])
            for r in pack_greedy(df.repartition(4), "doc_id", "n_tok", 100, "source").collect()
        )
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    # sequential packing: exactly one of the tied docs starts at offset 0,
    # the other starts where the first ended; total started tokens = 160
    starts = {(p, o) for _, p, o in outs[0]}
    assert (0, 0) in starts
    offsets = sorted(o + p * 100 for _, p, o in outs[0])
    assert offsets in ([0, 60, 130], [0, 70, 130])


def test_stratified_sample_exact_n_and_stable(spark):
    from etl_spark.ops.sample import stratified_sample

    rows = [(i, "g1" if i < 50 else "g2") for i in range(60)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = stratified_sample(df, "k", "g", 7, salt="x")
    by_g = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert by_g == {"g1": 7, "g2": 7}
    # undersized group: keeps everything
    assert stratified_sample(df, "k", "g", 100, salt="x").count() == 60
    # deterministic + unchanged groups keep their selection when a NEW
    # group appears
    sel1 = {r["k"] for r in out.filter(F.col("g") == "g1").collect()}
    grown = spark.createDataFrame(rows + [(100 + i, "g3") for i in range(5)], "k long, g string")
    out2 = stratified_sample(grown, "k", "g", 7, salt="x")
    assert {r["k"] for r in out2.filter(F.col("g") == "g1").collect()} == sel1


def test_xxhash_scale_paths_equal_md5_results(spark):
    """The production xxhash64 identity paths produce the SAME
    results as the oracle-verified md5 paths (only key representation
    differs)."""
    from etl_spark.text.contamination import contamination

    docs = _docs(spark)
    a = strip_boilerplate(docs, "doc_id", "text", min_docs=3)
    b = strip_boilerplate(docs, "doc_id", "text", min_docs=3, use_xxhash=True)
    ra = {(r["doc_id"], r["n_removed"], r["text"]) for r in a.collect()}
    rb = {(r["doc_id"], r["n_removed"], r["text"]) for r in b.collect()}
    assert ra == rb

    bench = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    ca = {(r["doc_id"], r["n_contaminated_ngrams"])
          for r in contamination(corpus, bench, "doc_id", "text", n=3).collect()}
    cb = {(r["doc_id"], r["n_contaminated_ngrams"])
          for r in contamination(corpus, bench, "doc_id", "text", n=3, use_xxhash=True).collect()}
    assert ca == cb and ca
