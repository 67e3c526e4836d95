"""Text-analysis, dedup and similarity-search tests.

Oracles computed independently in Python (hashlib / set arithmetic /
numpy) — never through the Spark expressions under test.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etl_spark.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    simhash_md5,
)
from etl_spark.dedup.simhash import hamming64, simhash_neardup_pairs
from etl_spark.sim import brute_force_topk, lsh_topk
from etl_spark.text import (
    bpe_token_count,
    fingerprint,
    langid,
    quality_features,
    token_count,
    word_shingles,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different words entirely here now"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "tiny"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_word_shingles(spark, docs):
    got = {r["doc_id"]: r["s"] for r in
           docs.select("doc_id", word_shingles(F.col("text"), 3).alias("s")).collect()}
    words = DOCS[0][1].split()
    expect = [" ".join(words[i:i + 3]) for i in range(len(words) - 2)]
    assert got[0] == expect
    assert got[4] == []  # fewer than n tokens


def test_token_counts(spark, docs):
    got = docs.select("doc_id", token_count(F.col("text")).alias("n"),
                      bpe_token_count(F.col("text")).alias("b")).collect()
    by_id = {r["doc_id"]: (r["n"], r["b"]) for r in got}
    assert by_id[0] == (9, 9)
    assert by_id[4] == (1, 1)


def test_exact_dedup(spark, docs):
    groups = exact_dup_groups(docs)
    sha0 = hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    by_sha = {r["text_sha256"]: (r["keep_id"], r["n_dups"]) for r in groups.collect()}
    assert by_sha[sha0] == (0, 2)
    kept = exact_dedup(docs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 4]


def test_minhash_identical_docs_same_signature(spark, docs):
    sig = {r["doc_id"]: r["sig"] for r in minhash_signature(docs, k=4).collect()}
    assert sig[0] == sig[3]
    assert sig[0] != sig[2]
    assert 4 not in sig  # too short to shingle


def test_lsh_finds_exact_and_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             lsh_candidate_pairs(docs, k=8, bands=4).collect()}
    assert (0, 3) in pairs  # identical docs always collide in every band
    assert (0, 2) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, pairs).collect()}
    assert got[(0, 3)] == 1.0
    assert got[(0, 2)] == 0.0
    # doc0 vs doc1: 7 shingles each, 6 shared -> 6/8
    assert got[(0, 1)] == round(6 / 8, 6)


def test_simhash_properties(spark, docs):
    for expr in (simhash64(F.col("text")), simhash_md5(F.col("text"), 16)):
        sig = {r["doc_id"]: r["s"] for r in docs.select("doc_id", expr.alias("s")).collect()}
        assert sig[0] == sig[3]  # identical docs
        assert sig[0] != sig[2]  # unrelated docs
    near = docs.select(
        simhash64(F.col("text")).alias("a")
    ).crossJoin(docs.select(simhash64(F.col("text")).alias("b")))
    h = near.select(hamming64(F.col("a"), F.col("b")).alias("h")).agg(F.min("h")).first()[0]
    assert h == 0


def test_simhash_md5_reference_value(spark):
    """Pin the md5-simhash to an independently computed value."""
    text = "alpha beta gamma"
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(simhash_md5(F.col("text"), 16).alias("s")).first()["s"]
    votes = [0] * 16
    for tok in text.split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)
        for b in range(16):
            votes[b] += 1 if (h >> b) & 1 else -1
    expect = sum(1 << b for b in range(16) if votes[b] > 0)
    assert got == expect


def test_simhash_neardup_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_neardup_pairs(docs, max_hamming=3).collect()}
    assert (0, 3) in pairs
    assert (0, 2) not in pairs


VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [1.0, 0.0, 0.0]),
]


@pytest.fixture()
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_cosine_and_neardup(spark, vecs):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           embedding_neardup_pairs(vecs, pairs, threshold=-2.0).collect()}
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
    assert out[(0, 3)] == 1.0
    assert out[(0, 2)] == 0.0
    assert abs(out[(0, 1)] - cos(VECS[0][1], VECS[1][1])) < 1e-6
    near = embedding_neardup_pairs(vecs, pairs, threshold=0.95)
    assert {(r["id_a"], r["id_b"]) for r in near.collect()} == {(0, 1), (0, 3)}


def test_brute_force_topk(spark, vecs):
    out = brute_force_topk(vecs.filter("vec_id = 0"), vecs, k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in out.orderBy("rank").collect()]
    assert got == [(3, 1), (1, 2)]


def test_brute_force_topk_guard_fires(spark, vecs):
    """The O(QxN) recall oracle refuses to run past max_pairs so it
    cannot be reached by accident at scale; max_pairs=None forces."""
    import pytest

    with pytest.raises(ValueError, match="max_pairs"):
        brute_force_topk(vecs, vecs, k=2, max_pairs=3)
    # explicit override still runs
    assert brute_force_topk(vecs, vecs, k=1, max_pairs=None).count() > 0


def test_lsh_topk_subset_of_brute(spark, vecs):
    """LSH results are always true neighbors (scored exactly); the
    identical vector must be found (same bucket by construction)."""
    out = lsh_topk(vecs.filter("vec_id = 0"), vecs, k=2, n_planes=4)
    got = {r["neighbor_id"] for r in out.collect()}
    assert 3 in got


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat with a hat and a bat today ok")], "doc_id long, text string"
    )
    r = quality_features(df, "text", id_cols=["doc_id"]).first()
    assert r["n_tokens"] == 14
    assert r["stopword_ratio"] > 0
    assert r["quality_keep"] is True
    short = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    assert quality_features(short, "text", id_cols=["doc_id"]).first()["quality_keep"] is False


def test_langid(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of the house"),
            (1, "la casa el perro que corre la calle"),
            (2, "der hund und die katze und der vogel"),
            (3, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["l"] for r in df.select("doc_id", langid(F.col("text")).alias("l")).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "HELLO ... WORLD")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[0] == fps[1] == fps[2]
    assert fps[0] == hashlib.sha256(b"hello world").hexdigest()


def test_star_edges_linear_in_cluster_size(spark):
    """A pathological duplicate cluster (5k near-identical docs) emits
    O(cluster) star edges — the all-pairs form would emit ~12.5M pairs
    before distinct()."""
    from etl_spark.dedup.cascade import lsh_star_edges, star_edges

    n = 5000
    rows = [(i, "the same boilerplate text repeated for every mirror page copy") for i in range(n)]
    rows += [(n + i, f"unique document number {i} with its own words entirely {i * 7}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = lsh_star_edges(df, k=8, bands=4, use_xxhash=True)
    cnt = edges.count()
    # every cluster member points at the min id: exactly n-1 edges for
    # the big cluster; the templated "unique" docs may add a few more
    # (they share words) — the bound that matters is LINEAR, not n²/2
    assert edges.filter("rep_id = 0").count() == n - 1
    assert cnt < n + 50, cnt

    # generic star_edges: one bucket of 1000 ids -> 999 edges
    keys = spark.createDataFrame([("b", i) for i in range(1000)], "band_key string, doc_id long")
    assert star_edges(keys).count() == 999


def test_dedup_cascade_exact_then_near(spark):
    """Cascade contract: byte-identical copies collapse in the exact
    stage (the LSH stage never sees them), near-identical survivors
    cluster via star edges + union-by-min, and every input row maps to
    its cluster representative."""
    from etl_spark.dedup.cascade import dedup_cascade

    exact_copies = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(100)]
    near_a = [(200, "alpha beta gamma delta epsilon zeta eta theta iota")]
    distinct = [(300, "completely different words nothing shared here at all"),
                (301, "another disjoint document with separate vocabulary tokens")]
    df = spark.createDataFrame(exact_copies + near_a + distinct, "doc_id long, text string")
    out = {r["doc_id"]: r["keep_id"] for r in dedup_cascade(df, use_xxhash=True).collect()}
    assert len(out) == 103  # every input row is mapped
    # all 100 exact copies share one representative (the min id, 0)
    assert {out[i] for i in range(100)} == {0}
    # the near-duplicate joins the same cluster (8 of its 9 shingles match)
    assert out[200] == 0
    # distinct docs survive as their own representatives
    assert out[300] == 300 and out[301] == 301


def test_union_by_min_chains(spark):
    """Components propagate across chained buckets: a-b and b-c edges
    put all three in component min(a)."""
    from etl_spark.dedup.cascade import union_by_min

    edges = spark.createDataFrame([(1, 5), (5, 9), (20, 21)], "rep_id long, member_id long")
    got = {r["id"]: r["component"] for r in union_by_min(edges).collect()}
    assert got == {1: 1, 5: 1, 9: 1, 20: 20, 21: 20}


def test_lsh_topk_recall_and_equivalence(spark):
    """Deterministic-plane LSH ANN: (a) with zero planes it degrades to
    exactly brute force (single bucket = cross join), (b) with 4 planes
    + multiprobe its recall beats the fraction of the corpus it scores
    (i.e. the buckets are informative, not random subsampling)."""
    from pyspark.sql import functions as F

    from etl_spark.sim.ann import brute_force_topk, hyperplane_signs, lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)
    dim = len(e.select("embedding").first()[0])

    bf = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(qs, e, k=5).collect()}
    eq = {(r.query_id, r.rank): r.neighbor_id
          for r in lsh_topk(qs, e, k=5, n_planes=0, dim=dim).collect()}
    assert bf == eq  # zero planes == exact

    approx = {(r.query_id, r.neighbor_id)
              for r in lsh_topk(qs, e, k=5, n_planes=4, dim=dim).collect()}
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(qs, e, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    # 5 of 16 buckets probed ~= 31% of the corpus scored; recall must
    # beat that baseline (deterministic: fixed planes + fixed data)
    assert recall > 0.33, recall

    # planes are reproducible and ±1-valued
    p1, p2 = hyperplane_signs(4, dim), hyperplane_signs(4, dim)
    assert p1 == p2 and all(s in (1.0, -1.0) for row in p1 for s in row)


def test_simhash64_frame_matches_expression(spark, docs):
    """The exploded-aggregate production form is bit-identical to the
    per-row expression form, including zero-token docs (sig 0)."""
    from etl_spark.dedup.simhash import simhash64_frame

    with_empty = docs.union(
        spark.createDataFrame([(99, "   ")], "doc_id long, text string")
    )
    expr = {r["doc_id"]: r["s"] for r in
            with_empty.select("doc_id", simhash64(F.col("text")).alias("s")).collect()}
    frame = {r["doc_id"]: r["sig"] for r in simhash64_frame(with_empty).collect()}
    assert expr == frame
    assert frame[99] == 0


def test_repetition_features(spark):
    from etl_spark.text.analysis import repetition_features

    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),            # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            (1, "x y z"),                  # all distinct
            (2, "line\nline\nother"),      # duplicate line
            (3, ""),                       # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_features(df, "text", id_cols=["doc_id"]).collect()}
    assert got[0]["n_2grams"] == 5 and abs(got[0]["dup_2gram_ratio"] - (1 - 2 / 5)) < 1e-6
    assert got[1]["dup_2gram_ratio"] == 0.0
    assert got[2]["n_lines"] == 3 and abs(got[2]["dup_line_ratio"] - (1 - 2 / 3)) < 1e-6
    assert got[3]["n_2grams"] == 0 and got[3]["dup_2gram_ratio"] == 0.0


def test_ivf_topk_recall_and_degenerate_exactness(spark):
    """IVF ANN: with n_cells=1 every vector is in one cell, so IVF
    degrades to exact brute force; with 8 cells / 2 probes recall must
    beat the ~2/8 scored-fraction baseline on fixed data."""
    from pyspark.sql import functions as F

    from etl_spark.sim.ann import brute_force_topk, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)

    bf = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(qs, e, k=5).collect()}
    eq = {(r.query_id, r.rank): r.neighbor_id
          for r in ivf_topk(qs, e, k=5, n_cells=1, n_probe=1).collect()}
    assert bf == eq

    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(qs, e, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(qs, e, k=5, n_cells=8, n_probe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.25, recall  # scored fraction ~= 2/8
