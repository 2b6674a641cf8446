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

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as _F  # noqa: F401

#: Corpus-size gate (optimizer estimate, bytes) under which the exact
#: cosine verify of :func:`embedding_near_dups` runs as a numpy
#: broadcast-gather instead of shipping both vectors through the pair
#: join. At corpus scale the estimate exceeds this and the JVM join
#: path runs unchanged; env-overridable for other deployments.
EMB_BCAST_MAX_BYTES = int(os.environ.get(
    "SPARK_GRAFT_EMB_BCAST_MAX_BYTES", str(64 * 1024 * 1024)))

#: Floor below which the broadcast-gather verify is not worth its
#: fixed setup (one driver collect + broadcast + an extra job):
#: measured interleaved at a 2k-vector corpus (~150k candidates) the
#: JVM fold wins by ~0.13 s, while at 20k vectors (~15.2M candidates)
#: the gather wins 2.3x — candidate count grows ~quadratically with
#: corpus rows, so a small size floor routes only the corpora where
#: the verify dominates.
EMB_BCAST_MIN_BYTES = int(os.environ.get(
    "SPARK_GRAFT_EMB_BCAST_MIN_BYTES", str(2 * 1024 * 1024)))


def _dot(a, b):
    """Left-fold dot product over the full arrays (zip_with + aggregate).

    Round-6 note (negative result, kept for the record): a fully
    unrolled ``a[0]*b[0] + ... + a[63]*b[63]`` codegen expression was
    measured SLOWER than this interpreted fold. One 64-term tree
    compiles to a >8 KB-bytecode method that HotSpot refuses to JIT
    (DontCompileHugeMethods), so it runs in the bytecode interpreter;
    8 such trees in one projection (lsh_bucket) additionally blew
    janino's 64 KB method limit outright, and wrapping the fold as a
    CASE-WHEN fallback branch disqualified whole stages from codegen.
    Measured on 2M cached pairs: unrolled 23 s vs this fold 4.4 s.
    The round-6 wins here are structural instead: norms computed once
    per vector (not per pair) and the superfluous pair-``distinct``
    exchanges removed (see embedding_near_dups)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the exact :func:`_dot` fold over named columns.

    Emitting the fold as ONE parsed expression instead of the
    Column-API lambda plumbing cuts ~25 ms of py4j round trips per
    fold at DataFrame-construction time (the same driver-side cost
    class as lsh_bucket's literal arrays — see its docstring); the
    analyzed expression, and therefore every result bit, is
    identical."""
    return (f"aggregate(zip_with({_ident(a)}, {_ident(b)}, "
            "(x, y) -> cast(x as double) * cast(y as double)), "
            "cast(0.0 as double), (acc, v) -> acc + v)")


def _norm_sql(a: str) -> str:
    """SQL text of the exact :func:`_norm` (sqrt of the _dot fold)."""
    return f"sqrt({_dot_sql(a, a)})"


def ann_topk_bruteforce(df: DataFrame, queries: DataFrame, k: int = 5,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small enough to broadcast (it is, by
    construction: queries are the user's probe set, not the corpus).
    Returns (query_id, rank, neighbor_id, sim_e6) — similarity scaled
    to micro-units as int for cross-engine stability.

    Round 6: each side's norm is computed ONCE per vector below the
    broadcast join — the corpus norm was previously re-derived inside
    cosine() for every (query, corpus) pair, |Q| times the needed
    work — so the per-pair cost drops from 3 fold evaluations to 1.
    sqrt(dot(v,v)) is the same expression either way: bit-identical.
    """
    from .partitioning import spread_input

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        F.expr(_norm_sql(vec_col)).alias("q_nrm"))
    c = spread_input(df, [id_col, vec_col]).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        F.expr(_norm_sql(vec_col)).alias("c_nrm"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.expr(_dot_sql("q_vec", "c_vec") + " / (q_nrm * c_nrm)"))
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
        lsh_bucket(vec_col, dim, n_planes_coarse).alias("bucket"))

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
    """Sign-of-projection bucket id (0 .. 2^n_planes-1) as a column.

    Stays the aggregate(zip_with(...)) fold at EXECUTION time: the
    round-6 unrolled rewrite (8 planes x 64 terms in one projection)
    exceeded janino's 64 KB method limit, fell back to interpreting a
    512-node tree and benched 3-6x SLOWER (see _dot). For corpora
    queried repeatedly the real fix is :func:`with_lsh_bucket`:
    materialize the id once and read it from the scan.

    CONSTRUCTION, however, was the hidden cost (round 6, late):
    building this expression through the Column API issues ~70 py4j
    round trips per plane (64 ``F.lit`` coefficient literals plus the
    lambda plumbing) — measured 0.56 s of driver-side Python per call,
    more than the query's whole execution at bench scale, and
    ``ann_topk_lsh`` pays it twice per invocation. When the vector is
    identified by NAME the same expression is emitted as ONE SQL
    string (1.3 ms, 400x cheaper): coefficient literals ride as
    ``CAST('<repr>' AS DOUBLE)`` — repr() round-trips doubles exactly
    and the string-to-double cast constant-folds to the identical
    Literal — and the fold text ``(x, w) -> cast(x as double) * w``
    resolves to the same analyzed expression as the Column-API
    lambdas, so the bucket ids are bit-identical (verified: 0
    mismatches over 20k x 8 plane signs, and the plan is unchanged).
    Pass a column NAME to get the fast path; Column inputs keep the
    legacy construction."""
    if isinstance(vec_col, str):
        ident = "`" + vec_col.replace("`", "``") + "`"
        parts = []
        for p in range(n_planes):
            arr = "array(" + ",".join(
                f"CAST('{_plane_coeff(p, d)!r}' AS DOUBLE)"
                for d in range(dim)) + ")"
            proj = (f"aggregate(zip_with({ident}, {arr}, "
                    "(x, w) -> cast(x as double) * w), "
                    "cast(0.0 as double), (acc, v) -> acc + v)")
            parts.append(
                f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
        return F.expr("CAST(0 AS BIGINT) + " + " + ".join(parts))
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
        out_col, lsh_bucket(vec_col, dim, n_planes))


def _corpus_bucket(df: DataFrame, vec_col: str, dim: int,
                   n_planes: int, bucket_col: str | None):
    """The corpus-side bucket column: a pre-materialized column when
    present (by name, or auto-detected as ``lsh_bucket``), else the
    inline projection."""
    if bucket_col is None and "lsh_bucket" in df.columns:
        bucket_col = "lsh_bucket"
    if bucket_col is not None:
        return F.col(bucket_col).cast("long")
    return lsh_bucket(vec_col, dim, n_planes)


_I64MAX = (1 << 63) - 1
_I64MIN = -(1 << 63)


def _verify_pairs_bcast(cand: DataFrame, base: DataFrame,
                        threshold: float):
    """Exact-cosine verify of candidate pairs via a numpy
    broadcast-gather, bit-identical to the JVM join + ``_dot`` fold.

    The JVM formulation ships BOTH 64-float vectors through the pair
    join for every candidate (15.2M pairs x ~540 B at the benchmark's
    20k-vector scale) and then runs one interpreted ``aggregate``
    lambda per element per pair. Guide §8's rule — decide with small
    rows, move big rows once — applies: the pair join only needs ids,
    and the whole vector table is a few MB. So: broadcast
    (ids, vectors, norms) once, send ONLY the 16-byte id pairs across
    the Arrow boundary, and gather + fold in numpy with the exact
    left-fold order (``acc += A[:, i] * B[:, i]`` per position over
    float64 casts — the same IEEE ops the JVM fold performs, verified
    output-identical on 262,801 pairs). Measured at that scale:
    4.5-4.9 s (JVM join+fold) -> 2.4-3.1 s.

    Returns None when any exactness precondition fails — the caller
    then uses the JVM path:
    - corpus estimate outside [:data:`EMB_BCAST_MIN_BYTES`,
      :data:`EMB_BCAST_MAX_BYTES`) (scale gate above, fixed-setup
      amortization floor below),
    - non-long ids (output column type must match the join's),
    - NULL/duplicate ids, NULL vectors/elements, ragged lengths
      (the JVM fold's zip_with NULL semantics are row-specific there).

    Semantics replicated from the JVM path (measured on this Spark,
    ANSI mode): sim NULL is impossible here (gate excludes NULLs),
    sim NaN is KEPT with sim_e6 = 0 (Spark orders NaN above any
    threshold and floor-casts it to 0), +/-inf saturate the long cast,
    a zero norm product raises (ANSI division by zero), and a pair
    whose id was cap-filtered out of ``base`` is dropped exactly like
    the inner join dropped it (membership check after searchsorted).
    """
    import numpy as np

    from pyspark.sql.types import LongType

    from .partitioning import _estimated_bytes

    spark = base.sparkSession
    est = _estimated_bytes(base)
    if est is None or not (EMB_BCAST_MIN_BYTES <= est < EMB_BCAST_MAX_BYTES):
        return None
    schema = dict((f.name, f.dataType) for f in base.schema.fields)
    if not isinstance(schema["vid"], LongType):
        return None
    try:
        tbl = base.select("vid", "vec", "nrm").toArrow()
    except Exception:
        return None
    import pyarrow as pa
    import pyarrow.compute as pc

    vid = tbl["vid"].combine_chunks()
    vec = tbl["vec"].combine_chunks()
    nrm = tbl["nrm"].combine_chunks()
    n = len(tbl)
    if n == 0 or vid.null_count or vec.null_count or nrm.null_count:
        return None
    flat = vec.flatten()
    if flat.null_count:
        return None
    lens = pc.list_value_length(vec).to_numpy()
    if lens.min() != lens.max():
        return None
    dim = int(lens[0])
    ids = vid.to_numpy()
    if np.unique(ids).size != ids.size:
        return None
    order = np.argsort(ids)
    ids = ids[order]
    V = flat.to_numpy().reshape(n, dim)[order]
    norms = nrm.to_numpy()[order].astype(np.float64)
    bc = spark.sparkContext.broadcast((ids, V, norms))
    thr = float(threshold)

    def verify(it):
        import numpy as np
        import pyarrow as pa

        ids_, V_, nrm_ = bc.value
        Vd = V_.astype(np.float64)
        hi = len(ids_) - 1
        for batch in it:
            nrows = batch.num_rows
            if nrows == 0:
                continue
            a = batch.column("vec_a").to_numpy(zero_copy_only=False)
            b = batch.column("vec_b").to_numpy(zero_copy_only=False)
            ia = np.clip(np.searchsorted(ids_, a), 0, hi)
            ib = np.clip(np.searchsorted(ids_, b), 0, hi)
            # inner-join semantics: drop pairs whose id is not in the
            # (possibly cap-filtered) base table
            member = (ids_[ia] == a) & (ids_[ib] == b)
            if not member.all():
                a, b = a[member], b[member]
                ia, ib = ia[member], ib[member]
                nrows = a.size
                if nrows == 0:
                    continue
            A, B = Vd[ia], Vd[ib]
            acc = np.zeros(nrows, dtype=np.float64)
            for i in range(A.shape[1]):  # exact left-fold order
                acc += A[:, i] * B[:, i]
            denom = nrm_[ia] * nrm_[ib]
            if (denom == 0).any():
                raise ArithmeticError(
                    "[DIVIDE_BY_ZERO] Division by zero (zero-norm "
                    "embedding in a candidate pair)")
            with np.errstate(all="ignore"):
                sim = acc / denom
                keep = (sim >= thr) | np.isnan(sim)
                f = np.floor(sim * 1e6)
            f = np.where(np.isnan(f), 0.0, np.clip(f, _I64MIN, _I64MAX))
            e6 = f.astype(np.int64)
            idx = np.nonzero(keep)[0]
            yield pa.record_batch({
                "vec_a": pa.array(a[idx], type=pa.int64()),
                "vec_b": pa.array(b[idx], type=pa.int64()),
                "sim_e6": pa.array(e6[idx], type=pa.int64()),
            })

    return cand.mapInArrow(verify, "vec_a long, vec_b long, sim_e6 long")


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

    from .partitioning import spread_input

    # spread the (one-row-group) corpus scan BEFORE the bucket/norm
    # projection and the fused probe-join pipeline: with the pair
    # .distinct() gone this query is one map-side pipeline whose
    # parallelism is the scan's — a single-row-group parquet file
    # would run it on one task (guide 2.5)
    df = spread_input(df)
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        _corpus_bucket(df, vec_col, dim, n_planes, bucket_col)
        .alias("bucket"),
        # norm computed ONCE per vector at persist time — the verify
        # stage previously re-derived both norms for every candidate
        # pair (3 fold evaluations per pair; now 1)
        F.expr(_norm_sql(vec_col)).alias("nrm")) \
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
    # No pair-dedup needed (round 6): the multiprobe join emits each
    # ORDERED pair at most once — a's probe list {bucket ^ m : m in
    # {0, 1<<0..1<<(n_planes-1)}} has pairwise-distinct values, so
    # bucket_b appears in it at most once (exactly when
    # bucket_a XOR bucket_b is 0 or a single probed bit), and the
    # strict vid-order filter then keeps exactly one orientation of
    # each unordered pair. The .distinct() this replaces was the ONLY
    # Exchange in the query (15.2M pair rows shuffled at sf1.0, for a
    # provably-already-unique set); without it the whole query is one
    # fused broadcast-join pipeline. tests/test_r06_codegen_equiv.py
    # asserts the no-duplicate property on a Hamming-0/1/2 fixture.
    cand = (
        probes.alias("a")
        .join(base.alias("b"), F.col("a.probe") == F.col("b.bucket"))
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(F.col("a.vid").alias("vec_a"),
                F.col("b.vid").alias("vec_b"))
    )
    # Small-corpus verify: numpy broadcast-gather over id-only pair
    # rows (bit-identical fold; see _verify_pairs_bcast). Falls through
    # to the JVM join + fold — the unchanged corpus-scale path — when
    # the size gate or any exactness precondition fails.
    fast = _verify_pairs_bcast(cand, base, threshold)
    if fast is not None:
        return fast
    va = base.select(F.col("vid").alias("vec_a"),
                     F.col("vec").alias("va"), F.col("nrm").alias("na"))
    vb = base.select(F.col("vid").alias("vec_b"),
                     F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    sim = F.expr(_dot_sql("va", "vb") + " / (na * nb)")
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
    from .partitioning import spread_input

    df = spread_input(df)
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        _corpus_bucket(df, vec_col, dim, n_planes, bucket_col)
        .alias("bucket"),
        F.expr(_norm_sql(vec_col)).alias("c_nrm"))
    probe_buckets = F.array(
        *([F.col("q_bucket")] + [
            F.col("q_bucket").bitwiseXOR(F.lit(1 << p))
            for p in range(n_planes)
        ] if multiprobe else [F.col("q_bucket")]))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        lsh_bucket(vec_col, dim, n_planes).alias("q_bucket"),
        F.expr(_norm_sql(vec_col)).alias("q_nrm"),
    ).withColumn("probe", F.explode(probe_buckets))
    # no distinct needed (round 6): a query's probe list
    # {q_bucket ^ m} has pairwise-distinct values, so each corpus row
    # matches a given query at most once — (query_id, neighbor_id)
    # rows are already unique (same argument as embedding_near_dups)
    scored = (
        c.join(F.broadcast(q),
               (F.col("bucket") == F.col("probe"))
               & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn(
            "sim",
            F.expr(_dot_sql("q_vec", "c_vec") + " / (q_nrm * c_nrm)"))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"), "neighbor_id",
                F.floor(F.col("sim") * 1e6).cast("long").alias("sim_e6"))
    )
