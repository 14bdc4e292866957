"""Quality gates for engine-hash ops (no DuckDB oracle): MinHash-LSH,
SimHash, and LSH-bucketed ANN are validated against exact ground truth
computed inside Spark itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blarify_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from blarify_spark.operators.similarity import ann_cosine_topk, ann_lsh_topk
from tests.conftest import SF_DIR, SF_DIR_MEDIUM

# sf0.001 keeps the O(n^2)/self-join ground truths cheap.


def test_minhash_lsh_vs_exact_jaccard(spark):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    # verified LSH pairs report the same exact jaccard
    for pair, j in lsh.items():
        assert pair in exact
        assert abs(j - exact[pair]) < 1e-9
    # high-similarity pairs must not be missed by blocking
    strong = {p for p, j in exact.items() if j >= 0.8}
    missed = strong - set(lsh)
    assert not missed, f"LSH missed strong pairs: {missed}"


def test_simhash_banding_is_exact_for_hamming_3(spark):
    """4 bands x 8 bits: any pair with hamming <= 3 leaves >= 1 band
    untouched (pigeonhole), so banding must find EXACTLY the brute-force
    hamming<=3 pairs."""
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup_simhash(spark, SF_DIR).collect()
    }
    # brute force over all pairs (sf0.001 is small)
    from blarify_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    from blarify_spark.operators import dedup as D

    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)

    def _vote_fn(j: int):
        return lambda acc, tok: acc + F.when(
            F.shiftright(F.xxhash64(tok), j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    sim = F.lit(0).cast("long")
    for j in range(D.SIMHASH_BITS):
        vote = F.aggregate(toks, F.lit(0), _vote_fn(j))
        sim = sim + F.when(vote > 0, F.lit(1 << j)).otherwise(0)
    hashes = docs.select("doc_id", sim.alias("h"))
    a = hashes.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("ha"))
    b = hashes.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_ann_lsh_recall_vs_brute_force(spark):
    brute = [r["vec_id"] for r in ann_cosine_topk(spark, SF_DIR).collect()]
    approx = [r["vec_id"] for r in ann_lsh_topk(spark, SF_DIR).collect()]
    assert brute  # baseline returns results
    overlap = len(set(brute) & set(approx))
    # multiprobe LSH at this tiny dim/scale: expect meaningful recall
    assert overlap >= 3, f"recall too low: {overlap}/10 ({approx} vs {brute})"


def test_ngram_jaccard_parity_on_irregular_whitespace(spark, tmp_path):
    """Round-2 latent risk: Spark shingles filtered empty tokens while the
    DuckDB oracle shingled raw string_split (including empties) — green
    only because the testdata is single-spaced. Pin parity on documents
    with doubled/leading/trailing spaces."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import oracle_sql

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        ("d1", base, "s1", len(base)),
        ("d2", base.replace(" ", "  "), "s1", len(base) + 7),  # doubled
        ("d3", "  " + base + "  ", "s1", len(base) + 4),  # lead/trail
        ("d4", base + " iota", "s1", len(base) + 5),  # near-dup
        ("d5", "one  two", "s2", 8),  # <3 tokens after filtering
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "source", "n_chars"]
    )
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (a, b): j
        for a, b, j in con.execute(
            oracle_sql()["dedup_ngram_jaccard"]
        ).fetchall()
    }
    con.close()
    # whitespace-only variants are identical shingle sets -> jaccard 1.0
    assert got[("d1", "d2")] == 1.0 and got[("d1", "d3")] == 1.0
    assert set(got) == set(want)
    for pair in got:
        assert abs(got[pair] - want[pair]) < 1e-9, pair


def test_prefix_jaccard_matches_local_bruteforce_and_prunes(spark):
    from blarify_spark.operators.dedup import (
        PREFIX_JACCARD_MIN,
        dedup_prefix_jaccard,
    )
    from blarify_spark.sources.tables import load_tables

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_prefix_jaccard(spark, SF_DIR_MEDIUM).collect()
    }

    docs = load_tables(spark, SF_DIR_MEDIUM, ["documents"])["documents"].collect()
    sets = {}
    for r in docs:
        w = [t for t in r["text"].split(" ") if t]
        if len(w) >= 3:
            sets[r["doc_id"]] = {
                " ".join(w[i : i + 3]) for i in range(len(w) - 2)
            }
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= PREFIX_JACCARD_MIN:
                expected[(a, b)] = j
    assert got == expected
    assert got, "no near-dup pairs at threshold — fixture regression"


def test_simhash_empty_token_docs_hash_to_zero(spark, tmp_path):
    """r6 rewrite risk: vote sums now come from an explode+aggregate that
    produces NO row for a doc with zero tokens; the left join must
    reinstate it with the HOF form's empty-array result (all votes 0 ->
    simhash 0), so two token-less docs pair at hamming 0."""
    import pandas as pd

    rows = [
        ("e1", "   ", "s1", 3),  # whitespace-only -> zero tokens
        ("e2", "", "s1", 0),  # empty -> zero tokens
        ("e3", "alpha beta gamma delta", "s1", 22),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source", "n_chars"])
    pdf.to_parquet(f"{tmp_path}/documents.parquet")

    from blarify_spark.operators.dedup import dedup_simhash

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup_simhash(spark, str(tmp_path)).collect()
    }
    assert got.get(("e1", "e2")) == 0
