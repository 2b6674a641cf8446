"""Similarity search over embedding columns (array<float>).

- ``ann_topk_bruteforce``: exact cosine top-k — broadcast the (small)
  query set against the full corpus; the dot product is a JVM-side
  ``aggregate(zip_with(...))`` so no Python runs per row. This is the
  correctness baseline.
- ``ann_topk_lsh``: random-hyperplane LSH bucketing as the scale path —
  hyperplanes are deterministic (hash-derived), candidates restricted to
  same-bucket (plus Hamming-1 neighbor buckets via multi-probe), then
  exact re-rank. At 10^12 rows the bucket join replaces the full cross
  product; recall tunes with bits/probes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as _F  # noqa: F401


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_topk_bruteforce(df: DataFrame, queries: DataFrame, k: int = 5,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small enough to broadcast (it is, by
    construction: queries are the user's probe set, not the corpus).
    Returns (query_id, rank, neighbor_id, sim_e6) — similarity scaled
    to micro-units as int for cross-engine stability.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int"), "neighbor_id",
            F.floor(F.col("sim") * 1e6).cast("long").alias("sim_e6"))
    )


def ann_topk_ivf(df: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 64, n_planes_coarse: int = 3,
                 nprobe: int = 2) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer built from
    LSH-bucket centroids (deterministic — no k-means RNG), inverted
    lists keyed by nearest centroid, queries probe the ``nprobe``
    nearest cells and exact-rerank within them.

    Scale path: the centroid table is tiny (2^n_planes_coarse rows) and
    broadcast everywhere; the corpus partitions by cell, so a query
    touches ``nprobe`` cells instead of the full corpus.
    """
    import pyspark.sql.functions as F

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes_coarse).alias("bucket"))

    # Centroids: per-dimension means of each coarse LSH bucket, rounded
    # to 6 decimals so the value is reproducible across engines (the
    # raw avg's last ulp depends on summation order; the SQL oracle
    # computes round(avg(...), 6) too).
    cent_rows = (
        base.select("bucket", F.posexplode(
            F.transform(F.col("vec"), lambda x: x.cast("double"))))
        .groupBy("bucket", "pos").agg(F.round(F.avg("col"), 6).alias("v"))
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("bucket", F.col("pv.v").alias("centroid"))
        .collect()
    )
    centroids = [(int(r["bucket"]), list(r["centroid"])) for r in cent_rows]

    def dist2_to(c_vals):
        arr = F.array([F.lit(float(v)) for v in c_vals])
        return F.aggregate(
            F.zip_with(F.col("vec"), arr,
                       lambda x, c: (x.cast("double") - c)
                       * (x.cast("double") - c)),
            F.lit(0.0), lambda acc, v: acc + v)

    dists = F.array(*[
        F.struct(dist2_to(c).alias("d"), F.lit(b).alias("cell"))
        for b, c in centroids])
    assigned = base.withColumn(
        "cell", F.array_min(dists).getField("cell"))

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec"))
    q_cells = (
        q.withColumn(
            "probe_cells",
            F.slice(
                F.transform(F.array_sort(dists), lambda s: s["cell"]),
                1, nprobe))
        .select("query_id", F.col("vec").alias("q_vec"),
                F.explode("probe_cells").alias("cell"))
    )

    scored = (
        assigned.join(F.broadcast(q_cells),
                      (assigned["cell"] == q_cells["cell"])
                      & (F.col("vid") != F.col("query_id")))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("vec")))
        .select("query_id", F.col("vid").alias("neighbor_id"), "sim")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"), "neighbor_id",
                F.floor(F.col("sim") * 1e6).cast("long").alias("sim_e6"))
    )


_N_PLANES_DEFAULT = 8


def _plane_coeff(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    integer hash of (plane, dim) mapped to the unit interval. No RNG —
    replays and cross-run joins stay stable."""
    h = (plane * 1_000_003 + dim * 7919 + 12345) * 2654435761 % (1 << 32)
    return (h / (1 << 31)) - 1.0


def lsh_bucket(vec_col, dim: int, n_planes: int = _N_PLANES_DEFAULT):
    """Sign-of-projection bucket id (0 .. 2^n_planes-1) as a column."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array([F.lit(_plane_coeff(p, d)) for d in range(dim)]),
                lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding",
                    dim: int = 64,
                    n_planes: int = _N_PLANES_DEFAULT,
                    out_col: str = "lsh_bucket") -> DataFrame:
    """Materialize the hyperplane bucket id onto the embedding table.

    The bucket expression costs O(n_planes x dim) JVM work per row;
    for a corpus queried repeatedly (ANN serving, periodic dedup
    sweeps) compute it ONCE, persist it with the embeddings
    (``pipeline.write_bucketed(..., bucket_col=out_col)`` makes the
    self-join shuffle-free too), and let :func:`ann_topk_lsh` /
    :func:`embedding_near_dups` pick the column up from the scan.
    The stored ids are only valid for the same (dim, n_planes) —
    the hyperplanes are deterministic in those parameters."""
    return df.withColumn(
        out_col, lsh_bucket(F.col(vec_col), dim, n_planes))


def _corpus_bucket(df: DataFrame, vec_col: str, dim: int,
                   n_planes: int, bucket_col: str | None):
    """The corpus-side bucket column: a pre-materialized column when
    present (by name, or auto-detected as ``lsh_bucket``), else the
    inline projection."""
    if bucket_col is None and "lsh_bucket" in df.columns:
        bucket_col = "lsh_bucket"
    if bucket_col is not None:
        return F.col(bucket_col).cast("long")
    return lsh_bucket(F.col(vec_col), dim, n_planes)


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding", dim: int = 64,
                        n_planes: int = _N_PLANES_DEFAULT,
                        max_bucket_size: int | None = None,
                        bucket_col: str | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from the
    hyperplane-LSH bucket self-join (plus Hamming-1 neighbor buckets so
    a pair straddling one plane's boundary is still seen), verified by
    exact cosine >= threshold. Never all-pairs: cost is bound by bucket
    collisions, the same scale shape as the MinHash text path.

    ``max_bucket_size`` drops degenerate buckets (e.g. the all-zero
    embedding bucket at corpus scale) from the join key — same guard
    as :func:`~..dedup.minhash_lsh_pairs`. With the cap, per-probe
    match fan-out is <= cap, so output is bound by
    rows * (n_planes + 1) * cap instead of quadratic in the hottest
    bucket.

    Returns (vec_a, vec_b, sim_e6) with sim floored to micro-units for
    cross-engine stability. With a pre-materialized bucket column
    (``bucket_col``, or an ``lsh_bucket`` column auto-detected on the
    input — see :func:`with_lsh_bucket`) the per-row hyperplane
    projection is skipped entirely and the bucket rides the scan."""
    from pyspark import StorageLevel

    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        _corpus_bucket(df, vec_col, dim, n_planes, bucket_col)
        .alias("bucket")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    probes = base.select(
        "vid", "vec",
        F.explode(F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
              for p in range(n_planes)])).alias("probe"))
    if max_bucket_size is not None:
        ok = (base.groupBy("bucket")
              .agg(F.count("*").alias("_n"))
              .filter(F.col("_n") <= max_bucket_size)
              .drop("_n"))
        base = base.join(ok, "bucket")
        probes = probes.join(
            ok.withColumnRenamed("bucket", "probe"), "probe")
    # the multiprobe join yields each pair up to n_planes+1 times;
    # dedup on the ID PAIR ONLY (8+8 bytes through the distinct's
    # shuffle) and re-join the persisted vectors for the verify —
    # shuffling the 64-float arrays through distinct costs ~8x the
    # bytes for nothing
    cand = (
        probes.alias("a")
        .join(base.alias("b"), F.col("a.probe") == F.col("b.bucket"))
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(F.col("a.vid").alias("vec_a"),
                F.col("b.vid").alias("vec_b"))
        .distinct()
    )
    va = base.select(F.col("vid").alias("vec_a"),
                     F.col("vec").alias("va"))
    vb = base.select(F.col("vid").alias("vec_b"),
                     F.col("vec").alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        cand.join(va, "vec_a").join(vb, "vec_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b",
                F.floor(F.col("sim") * 1e6).cast("long").alias("sim_e6"))
    )


def ann_topk_lsh(df: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 64, n_planes: int = _N_PLANES_DEFAULT,
                 multiprobe: bool = True,
                 bucket_col: str | None = None) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's
    bucket (or any Hamming-1 neighbor bucket when ``multiprobe``), then
    exact cosine re-rank within candidates. The corpus side never
    shuffles (queries broadcast); with a pre-materialized bucket
    column (``bucket_col`` / auto-detected ``lsh_bucket`` — see
    :func:`with_lsh_bucket`) the corpus scan reads the stored id
    instead of re-projecting n_planes x dim per row on every query
    batch. Query-side buckets are always computed (the probe set is
    tiny)."""
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        _corpus_bucket(df, vec_col, dim, n_planes, bucket_col)
        .alias("bucket"))
    probe_buckets = F.array(
        *([F.col("q_bucket")] + [
            F.col("q_bucket").bitwiseXOR(F.lit(1 << p))
            for p in range(n_planes)
        ] if multiprobe else [F.col("q_bucket")]))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("q_bucket"),
    ).withColumn("probe", F.explode(probe_buckets))
    scored = (
        c.join(F.broadcast(q),
               (F.col("bucket") == F.col("probe"))
               & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "neighbor_id", "sim").distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"), "neighbor_id",
                F.floor(F.col("sim") * 1e6).cast("long").alias("sim_e6"))
    )
