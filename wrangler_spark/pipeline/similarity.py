"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — a cross join bounded by
broadcasting the (small) query set, with the dot product as a native
F.zip_with/F.aggregate expression (JVM-side, codegen'd; no UDF).

Scale paths: (a) LSH-bucketed ANN — random-hyperplane signatures
restrict candidates to matching buckets, turning the n×q cross join
into an equality join on (table, bucket), the same banding trick as
MinHash; needs no training pass. (b) IVF — a k-means coarse quantizer
(DataFrame-native Lloyd's iteration) partitions the corpus into
inverted lists and queries probe their n_probe nearest lists; same
equality-join shape, trained, better candidate selectivity on
clustered corpora.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set against the corpus,
    rank within each query. Returns (q_id, vec_id, cos_sim, rank)."""
    from pyspark.sql.window import Window

    q = F.broadcast(queries.select(F.col(q_id_col), F.col(q_vec_col)))
    scored = df.crossJoin(q).select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_similarity_expr(
            F.col(vec_col).cast("array<double>"), F.col(q_vec_col).cast("array<double>")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG; no numpy RNG
    state, reproducible across executors since computed on the driver)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            # Box–Muller-free: uniform in [-1, 1) is fine for LSH planes
            v.append((state / float(1 << 62)) - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signature_expr(vec_col, planes: list[list[float]]):
    """Bit-pack sign(vec·plane) into a long — one bucket id per row."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(vec_col.cast("array<double>"), plane)
        bits.append(F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _multi_table_sig(vec_col, dim: int, n_planes: int, n_tables: int, seed: int, stride: int):
    """array<struct<__t, __bucket>> — every hash table's bucket id in ONE
    projection. Exploding this (rows × n_tables, two small ints wide)
    and joining once on (__t, __bucket) replaces the per-table
    join-then-union chain: n_tables joins collapse to one equality
    join, and each vector is scanned/dotted in a single pass."""
    entries = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=seed + stride * t)
        entries.append(
            F.struct(
                F.lit(t).alias("__t"),
                lsh_signature_expr(vec_col, planes).alias("__bucket"),
            )
        )
    return F.array(*entries)


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing an LSH bucket
    with the query in ANY of n_tables independent hash tables; exact
    cosine re-rank on the candidate set only. All tables hash in one
    pass and meet in one (table, bucket) equality join."""
    from pyspark.sql.window import Window

    corpus_t = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(_multi_table_sig(F.col(vec_col), dim, n_planes, n_tables, seed, 97)).alias("__tb"),
    ).select(id_col, vec_col, "__tb.__t", "__tb.__bucket")
    query_t = queries.select(
        F.col(q_id_col),
        F.col(q_vec_col),
        F.explode(_multi_table_sig(F.col(q_vec_col), dim, n_planes, n_tables, seed, 97)).alias("__tb"),
    ).select(q_id_col, q_vec_col, "__tb.__t", "__tb.__bucket")
    cand = corpus_t.join(F.broadcast(query_t), on=["__t", "__bucket"]).select(
        q_id_col, id_col, vec_col, q_vec_col
    )
    cand = cand.dropDuplicates([q_id_col, id_col])
    scored = cand.select(
        q_id_col,
        id_col,
        cosine_similarity_expr(
            F.col(vec_col).cast("array<double>"), F.col(q_vec_col).cast("array<double>")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _nearest_centroid_expr(vec_col, centroids: list[list[float]]):
    """(cluster_id, sq_dist) of the nearest centroid — an array_min over
    literal (dist, idx) structs; pure Column math, broadcast-free (the
    centroids ride in the plan as literals, k × dim doubles)."""
    entries = []
    for i, cvec in enumerate(centroids):
        c = F.array(*[F.lit(float(x)) for x in cvec])
        d = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        entries.append(F.struct(d.alias("dist"), F.lit(i).alias("cid")))
    return F.array_min(F.array(*entries))


def kmeans_centroids(
    df: DataFrame,
    dim: int,
    k: int = 16,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Coarse k-means quantizer for IVF: Lloyd's iteration expressed as
    DataFrame ops. Seeding is deterministic (the k rows with the
    smallest xxhash64(id) — a data-derived sample needing no RNG state);
    each iteration is one assignment pass (nearest-centroid argmin over
    literal centroids) plus a groupBy mean (dim per-component sums —
    a k-row collect per iteration, the only driver transfer).

    Scale shape: every pass is a single scan + one k-group aggregate;
    no pairwise joins, no per-row Python. Float-sum reduction order
    makes centroids bit-nondeterministic across cluster layouts (like
    every distributed k-means); consumers assert recall floors, not
    exact equality."""
    seeds = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(n_iter):
        assigned = df.select(
            F.col(vec_col),
            _nearest_centroid_expr(F.col(vec_col), centroids)["cid"].alias("__cid"),
        )
        sums = assigned.groupBy("__cid").agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}") for i in range(dim)],
        )
        rows = sums.collect()  # ≤ k rows
        for r in rows:
            n = r["__n"]
            if n:
                centroids[r["__cid"]] = [r[f"s{i}"] / n for i in range(dim)]
    return centroids


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 3,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: a k-means coarse quantizer partitions the
    corpus into inverted lists; each query probes its n_probe nearest
    centroids and exact-cosine re-ranks only those lists — the trained
    alternative to hyperplane LSH (same join shape: equality on the
    list id; candidate volume ≈ n_probe/n_centroids of the corpus).
    Pass `centroids` to reuse a trained quantizer across query batches
    (at 100 TB the train pass runs once and the assignment column is
    materialized with the table)."""
    from pyspark.sql.window import Window

    if centroids is None:
        centroids = kmeans_centroids(df, dim, n_centroids, n_iter, vec_col, id_col)
    corpus = df.select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_centroid_expr(F.col(vec_col), centroids)["cid"].alias("__cid"),
    )
    # per-query n_probe nearest lists: sort the literal (dist, cid)
    # structs and slice — no shuffle, queries are small
    q_entries = []
    for i, cvec in enumerate(centroids):
        c = F.array(*[F.lit(float(x)) for x in cvec])
        d = F.aggregate(
            F.zip_with(F.col(q_vec_col).cast("array<double>"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        q_entries.append(F.struct(d.alias("dist"), F.lit(i).alias("cid")))
    probe = F.slice(F.array_sort(F.array(*q_entries)), 1, n_probe)
    q = queries.select(
        F.col(q_id_col),
        F.col(q_vec_col),
        F.explode(F.transform(probe, lambda s: s["cid"])).alias("__cid"),
    )
    cand = corpus.join(F.broadcast(q), on="__cid").select(
        q_id_col, id_col, vec_col, q_vec_col
    )
    scored = cand.select(
        q_id_col,
        id_col,
        cosine_similarity_expr(
            F.col(vec_col).cast("array<double>"), F.col(q_vec_col).cast("array<double>")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 14,
    n_tables: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH self-join candidates,
    exact cosine verify ≥ threshold. Returns (id_a, id_b, cos_sim).

    Bucket-size bound (the 100 TB guard): near-identical embeddings —
    the very thing this pass hunts — all land in the SAME bucket in
    every table (sub-bucketing by more planes cannot split them: their
    signs agree everywhere), and a clone group of m vectors contains m²
    true pairs. Buckets larger than `max_bucket` therefore emit STAR
    candidates only (member ↔ bucket min-id): every clone is still
    connected to its canonical representative and verified by exact
    cosine, but candidate volume stays O(m). Buckets ≤ max_bucket keep
    exact all-pairs candidates. max_bucket=0 disables the guard."""
    from wrangler_spark.pipeline.dedup import _bucket_pairs

    banded = df.select(
        F.col(id_col),
        F.explode(_multi_table_sig(F.col(vec_col), dim, n_planes, n_tables, seed, 31)).alias("__tb"),
    ).select(id_col, "__tb.__t", "__tb.__bucket")
    cand = _bucket_pairs(banded, id_col, ["__t", "__bucket"], max_bucket)
    # re-attach vectors for the exact verify (id-keyed joins; the pair
    # stream is bounded by the star guard, so this never amplifies)
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_sim",
            cosine_similarity_expr(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
