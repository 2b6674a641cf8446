"""Deduplication operators: exact, token-set Jaccard, MinHash+LSH, SimHash.

Scale design (10^12 documents):
- **exact**: md5 hash-groupBy — one shuffle on a 32-byte key, AQE
  handles residual skew. Never shuffles document text.
- **jaccard_pairs**: exact all-pairs similarity *within candidate
  buckets only* (or on a bounded subset) — the verification stage after
  LSH; the token explode is linear, the pair join runs per-bucket.
- **minhash_lsh**: shingle -> K minhashes -> B bands; candidate pairs
  come from banded bucket joins so cost is output-bound, not O(n^2).
  Hash functions are fixed-coefficient universal hashes (no RNG) so
  replays are deterministic.
- **simhash**: 64-bit signature via per-token hash bit-voting,
  Hamming-ball candidates by 4x16-bit block join (any dup within
  Hamming distance <= 3 shares at least one exact block).

All built-in column expressions / higher-order functions — no Python in
the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Fixed odd 61-bit constants for the universal hash family
# h_i(x) = ((a_i * x + b_i) mod M); deterministic across runs.
_M = (1 << 61) - 1
# 31-bit domain for coefficients and rehash inputs: a*h stays < 2^62,
# no signed-long overflow inside the JVM expression.
_M31 = (1 << 31) - 1


def _hash_coeffs(k: int):
    # Multiplicative-congruential constants from the golden-ratio family.
    a = [(2654435761 * (2 * i + 1)) % _M31 or 1 for i in range(k)]
    b = [(40503 * (i * i + i + 1)) % _M31 for i in range(k)]
    return a, b


def exact_dups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_sig, n_copies, canonical_id): hash-groupBy exact
    dedup; canonical = min doc_id per signature."""
    sig = df.select("doc_id", F.md5(F.col(text_col)).alias("text_sig"))
    groups = sig.groupBy("text_sig").agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("canonical_id"),
    )
    return (
        sig.join(groups, "text_sig")
        .select("doc_id", "text_sig", "n_copies", "canonical_id")
    )


def token_sets(df: DataFrame, text_col: str = "text") -> DataFrame:
    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    return df.select("doc_id", toks.alias("toks"))


def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  threshold: float = 0.8,
                  max_doc_id: int | None = None) -> DataFrame:
    """Exact token-set Jaccard pairs >= threshold.

    All-pairs via token inverted index (explode + self-join on token,
    groupBy pair). ``max_doc_id`` bounds the subset for oracle-checked
    runs; at full scale this runs *after* LSH bucketing on candidate
    pairs only. Returns exact integer (intersection, union) so the
    result is bit-stable across engines.
    """
    base = df
    if max_doc_id is not None:
        base = base.filter(F.col("doc_id") < max_doc_id)
    ts = token_sets(base, text_col)
    sizes = ts.select("doc_id", F.size("toks").alias("sz"))
    inv = ts.select("doc_id", F.explode("toks").alias("tok"))
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), on="tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("n_union", F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        .filter(F.col("n_inter") >= F.lit(threshold) * F.col("n_union"))
        .select("doc_a", "doc_b",
                F.col("n_inter").cast("long"),
                F.col("n_union").cast("long"))
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (higher-order
    functions; no UDF)."""
    base = df.select(
        "doc_id", F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
    parts = " , ' ', ".join(f"_toks[i + {j} - 1]" for j in range(n))
    sh = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 0)),"
        f" i -> concat({parts}))")
    return base.select("doc_id", F.array_distinct(sh).alias("shingles"))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       num_hashes: int = 32, shingle_n: int = 3) -> DataFrame:
    """K minhash values per doc: shingle -> xxhash64 -> K universal
    rehashes -> min per hash. Fully vectorized via aggregate() over the
    shingle array."""
    a, b = _hash_coeffs(num_hashes)
    sh = shingles(df, text_col, shingle_n)
    base_h = F.transform(
        F.col("shingles"), lambda s: F.abs(F.xxhash64(s)) % F.lit(_M31))

    def _rehash(ai: int, bi: int):
        # Single-parameter lambda: a second parameter would be bound to
        # the element index by transform()'s lambda protocol.
        return lambda h: (h * F.lit(ai) + F.lit(bi)) % F.lit(_M)

    cols = [
        F.array_min(F.transform(base_h, _rehash(a[i], b[i]))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.select("doc_id", *cols)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      num_hashes: int = 32, bands: int = 8,
                      shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs from banded LSH over minhash signatures.

    bands * rows_per_band == num_hashes. Candidates are pairs sharing at
    least one band bucket; downstream exact verification uses
    ``jaccard_pairs`` on the candidates. The band-bucket join keys are
    md5(band values) so bucket cardinality stays bounded.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, num_hashes, shingle_n)
    band_rows = None
    for band in range(bands):
        cols = [F.col(f"mh_{band * rows_per_band + r}")
                for r in range(rows_per_band)]
        bucket = F.md5(F.concat_ws("_", *[c.cast("string") for c in cols]))
        one = sig.select(
            "doc_id", F.lit(band).alias("band"), bucket.alias("bucket"))
        band_rows = one if band_rows is None else band_rows.unionByName(one)
    pairs = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over distinct tokens: per-bit weighted vote via
    aggregate() — each token's xxhash64 contributes +1/-1 per bit."""
    ts = token_sets(df, text_col).select(
        "doc_id", F.transform(F.col("toks"), lambda t: F.xxhash64(t)).alias("_th"))
    bit_exprs = []
    for bit in range(64):
        vote = (
            f"aggregate(_th, 0L, (acc, h) ->"
            f" acc + if(getbit(h, {bit}) = 1, 1L, -1L))")
        # shiftleft + bitwise OR (not +): bit 63 is the sign bit of a
        # signed long, addition would overflow.
        bit_exprs.append(f"if(({vote}) > 0, shiftleft(1L, {bit}), 0L)")
    sig = F.expr(" | ".join(bit_exprs))
    return ts.select("doc_id", sig.alias("simhash"))


def simhash_candidates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Near-dup candidates within Hamming distance 3 of each other:
    4x16-bit block join (pigeonhole: <=3 differing bits leave one of 4
    blocks identical), then exact popcount filter."""
    sh = simhash(df, text_col)
    blocks = None
    for blk in range(4):
        b = sh.select(
            "doc_id", "simhash", F.lit(blk).alias("blk"),
            F.shiftrightunsigned(F.col("simhash"), blk * 16)
            .bitwiseAND(F.lit(0xFFFF)).alias("blk_val"))
        blocks = b if blocks is None else blocks.unionByName(b)
    cand = (
        blocks.alias("a").join(blocks.alias("b"), on=["blk", "blk_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("a.simhash").alias("sig_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("b.simhash").alias("sig_b"))
        .distinct()
    )
    xor = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    hamming = F.bit_count(xor)
    return cand.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= 3)
