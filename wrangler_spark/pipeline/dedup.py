"""Deduplication operators over a documents table.

All operators take/return DataFrames and are built from native Column
expressions (shingling, hashing, LSH banding are all `F.*` — zero
Python UDFs), so every stage is whole-stage-codegen'd and the only
shuffles are the semantically required groupBys/joins.

Scale notes:
- exact dedup = hash groupBy → one shuffle on a 64-bit key, AQE
  coalesced; keeps min(id) as the canonical survivor (deterministic).
- MinHash+LSH: per-row signature is a narrow map (explode shingles →
  groupBy doc → array of min-hashes); banding turns O(n²) similarity
  into equality joins on (band, band-hash) — the classic scale path.
- SimHash: 64-bit signature via per-token hash bit-votes; near-dup =
  equal 16-bit chunks (4-chunk banding ≙ Hamming distance ≤ 3 catch).
- embedding cosine near-dup: see similarity.py (bucketed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per exact text value; hash-groupBy, single shuffle."""
    h = F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    return (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min_by(F.struct(*[F.col(c) for c in df.columns]), F.col(id_col)).alias("__r"))
        .select("__r.*")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(hash, n_dups, min_id) per duplicated text — the audit view."""
    h = F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    return (
        df.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("min_id"))
        .filter(F.col("n_dups") > 1)
    )


def _affine_family(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) constants for the affine min-hash family
    h_i = a_i·h + b_i over one base xxhash64 (64-bit wrapping arithmetic
    — the standard universal-hashing construction). Fixed seed so
    signatures are reproducible across sessions."""
    import random

    rnd = random.Random(0x5EED5EED)
    fam = []
    for _ in range(num_hashes):
        a = rnd.getrandbits(62) | 1  # odd multiplier, fits signed 64-bit
        b = rnd.getrandbits(62)
        fam.append((a, b))
    return fam


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig array<long>[num_hashes]) — per-shingle affine hash family.

    Pure Column math, explode-free and single-hash: each shingle is
    xxhash64'd ONCE (a transform over the shingle array), and the
    num_hashes family members derive from that one 64-bit value by
    affine mixing a_i·h + b_i (wrapping long arithmetic) inside the
    fold. The previous shape evaluated num_hashes seeded xxhash64 calls
    per shingle — 32-64× the string-hashing work for the same LSH
    behavior; this was the slowest bench query (9.6 s at sf0.1).
    """
    max_long = (1 << 63) - 1
    fam = _affine_family(num_hashes)
    k = shingle_k
    # String work is ONCE PER TOKEN: hash each token, then a shingle's
    # hash is a rolling polynomial over k consecutive token hashes —
    # pure long multiply-adds, no per-shingle string slicing/joining
    # (the old array_join(slice(...)) shingle builder dominated the
    # query at 5-7 s/5k docs; token-hash combination is ~10× cheaper).
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
    # MATERIALIZE the token-hash array as a column before the shingle
    # builder touches it: element_at() on a bare transform() expression
    # re-evaluates the whole transform per access in the interpreted
    # higher-order-function path — k accesses per shingle made the
    # shingle stage O(tokens²) per doc (measured 1.5 s → 0.27 s at
    # sf0.1 for the full signature job, round 4).
    df = df.withColumn("__wr_th", F.transform(toks, lambda t: F.xxhash64(t)))
    th = F.col("__wr_th")
    n = F.size(th)
    C = F.lit(0x00000100000001B3)  # FNV-ish odd multiplier, wraps in long

    def _comb(i):
        h = F.element_at(th, i + 1)
        for j in range(1, k):
            h = h * C + F.element_at(th, i + j + 1)
        return h

    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    whole = F.aggregate(th, F.lit(0).cast("long"), lambda acc, t: acc * C + t)
    hs = F.when(n >= k, F.transform(idx, _comb)).otherwise(F.array(whole))
    # fold elementwise minimum of the affine-mixed hash vector; `h` is a
    # lambda variable (long), so each family member costs one multiply-add.
    # The (a, b) constants ride as ONE literal array-of-structs and the
    # mixing is a transform over it — the generated code loops over the
    # family instead of unrolling num_hashes expressions, which cut the
    # cold (codegen-inclusive) time ~3× at num_hashes=32.
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in fam])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in fam])
    consts = F.arrays_zip(a_arr.alias("a"), b_arr.alias("b"))
    sig = F.aggregate(
        hs,
        F.array(*[F.lit(max_long).cast("long") for _ in range(num_hashes)]),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(consts, lambda p: h * p["a"] + p["b"]),
            lambda x, y: F.least(x, y),
        ),
    )
    return df.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band
    bucket. Returns (id_a, id_b) distinct pairs, id_a < id_b.

    Bucket-size bound (the 100 TB guard): a bucket of m near-identical
    docs — exactly what a dedup pass exists to find — contains m² TRUE
    pairs, so no sub-bucketing can shrink it without losing real output.
    Buckets larger than `max_bucket` therefore emit STAR pairs only
    (every member paired with the bucket's min-id canonical doc): each
    clone group stays fully represented (connected through its
    canonical), but the join output is O(m) instead of O(m²). Small
    buckets keep exact all-pairs semantics. max_bucket=0 disables the
    guard (small corpora / oracle checks)."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = _banded(sigs, id_col, num_hashes, bands)
    return _bucket_pairs(banded, id_col, ["band", "bucket"], max_bucket)


def _bucket_pairs(
    banded: DataFrame, id_col: str, bucket_cols: list[str], max_bucket: int
) -> DataFrame:
    """(id_a, id_b) pairs from bucket co-membership with the star-pair
    guard: buckets ≤ max_bucket self-join exhaustively; larger buckets
    emit (min_id, member) pairs only — linear in bucket size."""
    if not max_bucket:
        a, b = banded.alias("a"), banded.alias("b")
        cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        for c in bucket_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        return (
            a.join(b, cond)
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .distinct()
        )
    from pyspark.sql.window import Window

    # window stats over the bucket partition (one pass — no agg+join
    # back, which would recompute the upstream signature fold twice)
    wdw = Window.partitionBy(*bucket_cols)
    tagged = banded.withColumn("__n", F.count(F.lit(1)).over(wdw)).withColumn(
        "__min", F.min(id_col).over(wdw)
    )
    small = tagged.filter(F.col("__n") <= max_bucket)
    a, b = small.alias("a"), small.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    full = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    star = (
        tagged.filter((F.col("__n") > max_bucket) & (F.col(id_col) > F.col("__min")))
        .select(F.col("__min").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return full.unionByName(star).distinct()


def _banded(sigs: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    rows = num_hashes // bands
    return sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[F.col("sig").getItem(b * rows + r).cast("string") for r in range(rows)],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Drop near-duplicates: within each LSH band bucket keep only the
    min-id document (single-pass connected-component approximation).

    Deliberately NOT pair-based: a bucket of n near-identical docs would
    produce n² candidate pairs; the per-bucket min-id aggregation keeps
    it O(n) — the shape that survives a corpus where 30% of documents are
    boilerplate clones. Full transitive closure would iterate this.

    The per-bucket min is a window function (min over the unordered
    (band, bucket) partition), NOT a groupBy + join back: the banded
    stream is consumed ONCE, so the expensive signature fold runs once.
    The previous agg+join shape recomputed signatures for each consumer
    (no exchange sits between the fold and the fan-out) — measured 2×
    the signature cost, 3.2-5.3 s → 2.4-2.9 s at sf0.1. The window's
    internal sort is over (id, band, bucket) triples only — tiny rows,
    bounded by the bucket-hash shuffle that is required anyway."""
    from pyspark.sql.window import Window

    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = _banded(sigs, id_col, num_hashes, bands)
    w = Window.partitionBy("band", "bucket")
    losers = (
        banded.withColumn("__keep", F.min(id_col).over(w))
        .filter(F.col(id_col) > F.col("__keep"))
        .select(id_col)
        .distinct()
    )
    return df.join(losers, on=id_col, how="left_anti")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: sum(+1/-1 bit votes of token hashes).

    Built from explode + groupBy-sum over (id, bit) then bit-assembly —
    two shuffles bounded by tokens and ids respectively.
    """
    toks = F.explode(
        F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
    ).alias("tok")
    tok_df = df.select(F.col(id_col), toks)
    tok_df = tok_df.withColumn("h", F.xxhash64("tok"))
    # static unroll over bit positions (bits is a compile-time constant);
    # one groupBy(id) with `bits` partial sums — a single shuffle
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    bitsum = tok_df.groupBy(id_col).agg(*bit_votes)
    sig_expr = None
    for b in range(bits):
        # bit 63 is the sign bit of a 64-bit long (two's complement)
        weight = (1 << b) if b < 63 else -(1 << 63)
        term = F.when(F.col(f"s{b}") > 0, F.lit(weight).cast("long")).otherwise(F.lit(0).cast("long"))
        sig_expr = term if sig_expr is None else sig_expr + term
    return bitsum.select(F.col(id_col), sig_expr.alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunks: int = 4,
    max_bucket: int = 1000,
    log_dropped: bool = False,
) -> DataFrame:
    """Near-dup candidates: equal 16-bit chunk of the 64-bit simhash in
    the same chunk position (catches Hamming distance ≤ chunks-1).

    Bucket-size bound (the 100 TB guard): a degenerate chunk value
    shared by m docs (e.g. the all-zeros chunk of short/boilerplate
    docs) would otherwise make the self-join emit m² pairs. Buckets
    larger than `max_bucket` are SUB-BUCKETED by the adjacent chunk's
    bits (membership then requires matching 2 chunks ≙ Hamming ≤
    chunks-2 within those buckets — a recall trade, not a silent drop),
    and any bucket still larger than `max_bucket` after sub-bucketing
    is dropped. `log_dropped=True` prints the dropped-bucket mass (one
    extra tiny agg job) — no silent truncation."""
    sig = simhash(df, text_col, id_col)
    width = 64 // chunks
    chunked = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                        # adjacent chunk (wrapping) — the sub-bucket key
                        F.shiftright(F.col("simhash"), ((c + 1) % chunks) * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("nxt"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select(id_col, "cv.chunk", "cv.val", "cv.nxt")
    bsz = chunked.groupBy("chunk", "val").agg(F.count(F.lit(1)).alias("__n"))
    chunked = chunked.join(bsz, on=["chunk", "val"]).withColumn(
        "sub", F.when(F.col("__n") > max_bucket, F.col("nxt")).otherwise(F.lit(0))
    )
    sub_sz = chunked.groupBy("chunk", "val", "sub").agg(F.count(F.lit(1)).alias("__m"))
    if log_dropped:
        dropped = (
            sub_sz.filter(F.col("__m") > max_bucket)
            .agg(F.count(F.lit(1)).alias("buckets"), F.sum("__m").alias("rows"))
            .first()
        )
        if dropped["buckets"]:
            import warnings

            warnings.warn(
                f"simhash_candidates: dropped {dropped['buckets']} degenerate "
                f"bucket(s) covering {dropped['rows']} doc-chunk rows "
                f"(> max_bucket={max_bucket} after sub-bucketing)"
            )
    kept = (
        chunked.join(sub_sz, on=["chunk", "val", "sub"])
        .filter(F.col("__m") <= max_bucket)
        .select(id_col, "chunk", "val", "sub")
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_gram_df: int = 0,
    log_dropped: bool = False,
) -> DataFrame:
    """n-gram Jaccard over candidate pairs that share ≥1 n-gram.

    explode n-grams → self-equality-join on gram → count shared grams
    per pair → |A∩B| / (|A|+|B|-|A∩B|). The gram join IS the candidate
    filter (no n² pass).

    `max_gram_df` (the 100 TB guard): a gram appearing in m documents
    contributes m² join rows — one boilerplate trigram shared by 10^5
    docs would alone emit 10^10 pairs. With max_gram_df > 0, grams whose
    document frequency exceeds the cap are removed BEFORE the self-join
    (the standard stopword-gram cutoff); per-doc sizes are computed over
    the kept grams, so the output equals exact Jaccard over the reduced
    gram sets — and EXACT Jaccard for any pair sharing no hot gram.
    `log_dropped=True` prints how many grams/occurrences were cut (one
    tiny extra agg job) — no silent truncation. max_gram_df=0 keeps the
    exact all-grams semantics (small corpora / oracle checks)."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.when(
        cnt >= n, F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    ).otherwise(F.array(F.array_join(toks, " ")))
    g = df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram"))
    if max_gram_df:
        gdf = g.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
        if log_dropped:
            dropped = (
                gdf.filter(F.col("__df") > max_gram_df)
                .agg(F.count(F.lit(1)).alias("grams"), F.sum("__df").alias("occurrences"))
                .first()
            )
            if dropped["grams"]:
                import warnings

                warnings.warn(
                    f"ngram_jaccard_pairs: dropped {dropped['grams']} hot gram(s) "
                    f"({dropped['occurrences']} occurrences) with document "
                    f"frequency > {max_gram_df}"
                )
        g = g.join(gdf.filter(F.col("__df") <= max_gram_df).select("gram"), on="gram")
    sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = g.alias("a"), g.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------ decontamination

def word_ngram_hashes(text_col, n: int = 13):
    """Distinct xxhash64 of each word n-gram (lowercased, punctuation
    stripped) — the unit of benchmark-decontamination overlap. Docs
    shorter than n tokens have no n-grams."""
    toks = F.filter(
        F.split(
            F.lower(F.trim(F.regexp_replace(text_col, r"[^\w\s']", " "))), r"\s+"
        ),
        lambda t: t != "",
    )
    k = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(k - n + 1, F.lit(0)))
    return F.when(k >= n, F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))))
    )).otherwise(F.array().cast("array<bigint>"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    bench_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Flag corpus documents sharing any word n-gram with a benchmark
    set — the standard eval-decontamination pass (GPT-3 appendix C /
    The Pile §6.3 use 13-grams). Scale shape: the benchmark's distinct
    n-gram hashes BROADCAST (eval sets are tiny next to a 100 TB
    corpus), the corpus explodes per-partition and semi-joins map-side,
    so the only shuffle is the per-doc hit dedup on id_col.

    Returns the corpus with a boolean `contaminated` column.
    """
    bench_h = (
        benchmark.select(F.explode(word_ngram_hashes(F.col(bench_col), n)).alias("h"))
        .distinct()
    )
    doc_h = corpus.select(
        F.col(id_col), F.explode(word_ngram_hashes(F.col(text_col), n)).alias("h")
    )
    hits = (
        doc_h.join(F.broadcast(bench_h), "h", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return corpus.join(hits, id_col, "left").na.fill({"contaminated": False})


# ------------------------------------------------------ dup clustering
def dup_clusters(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected duplicate-pair graph —
    the step between pair emission (minhash/simhash/jaccard/embedding)
    and canonical-document selection: every member of a transitive
    duplicate cluster gets `cluster` = the minimum member id, so
    "keep one per cluster" is a single `filter(id == cluster)`.

    Algorithm: hash-min label propagation. Each round every vertex
    takes the min of its own label and its neighbors' labels — one
    equality join + one min-agg per round, converging in O(graph
    diameter) rounds. Near-dup graphs are star-shaped (clones connect
    through their canonical member, and `_bucket_pairs`' star guard
    emits exactly that shape for oversized buckets), so 2-4 rounds
    converge in practice; `max_iter` bounds pathological chains.
    Convergence is DETECTED (an any-label-improved probe per round),
    never assumed — hitting max_iter without converging raises rather
    than returning a silently-wrong partition.

    Scale shape: state is one (vertex, label) row per vertex; each
    round shuffles edges once on dst and vertices once on the groupBy.
    `localCheckpoint` truncates the growing lineage each round (the
    standard Spark iterative-algorithm pattern — without it round k
    replans k joins deep).

    `vertices` (optional, one `id_col` per row): include pairless
    documents as singleton clusters (cluster = own id).
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("u").alias("id")).distinct().withColumn(
        "lbl", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("v"), F.col("lbl").alias("nlbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("nlbl").alias("cand"))
        )
        nxt = (
            labels.join(nbr_min.select(F.col("u").alias("id"), "cand"), "id", "left")
            .select(
                "id",
                F.col("lbl").alias("old"),
                F.least("lbl", F.coalesce("cand", "lbl")).alias("lbl"),
            )
        ).localCheckpoint(eager=True)
        improved = nxt.filter(F.col("lbl") < F.col("old")).limit(1).count()
        labels = nxt.select("id", "lbl")
        if improved == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dup_clusters: not converged after {max_iter} rounds — the "
            "pair graph has a longer path than expected; raise max_iter "
            "(or pre-contract chains with an exact-dup pass)"
        )
    out = labels.select(F.col("id").alias(id_col), F.col("lbl").alias("cluster"))
    if vertices is not None:
        singles = vertices.select(id_col).join(
            out.select(id_col), on=id_col, how="left_anti"
        )
        out = out.unionByName(
            singles.withColumn("cluster", F.col(id_col))
        )
    return out


# --------------------------------------------------- incremental dedup
def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """The persistable LSH index: one (id, band, bucket) row per doc per
    band. Write it out once (parquet, partitioned/bucketed by (band,
    bucket) for co-located probes) and incremental ingestion never
    re-reads corpus TEXT again — the 100 TB dedup story is "signature
    the corpus once, probe each new batch against the index", not
    "re-shingle 100 TB per batch"."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    return _banded(sigs, id_col, num_hashes, bands)


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup candidates for an incremental batch against an existing
    `minhash_index`, WITHOUT touching corpus text. Returns
    (pairs, new_index_rows):

    - pairs: (id_a, id_b), id_a < id_b — every candidate involving at
      least one NEW doc: new↔corpus (an equality join of the new batch's
      band hashes against the index — the index side is only probed at
      the new batch's (band, bucket) keys, so cost scales with the
      BATCH, not the corpus) and new↔new (bucket co-membership within
      the batch, star-guarded like the full pass). Corpus↔corpus pairs
      are deliberately absent — they were emitted when those docs were
      ingested (same hash family, same banding → same buckets forever).
    - new_index_rows: append to the index (same schema) to ingest the
      batch; `index.unionByName(new_index_rows)` IS the updated index.

    Parameters must match the ones the index was built with — the
    affine hash family is deterministic in `num_hashes`, so equal
    parameters give bit-identical signatures across batches."""
    new_idx = minhash_index(new_docs, text_col, id_col, num_hashes, bands, shingle_k)
    new_idx = new_idx.localCheckpoint(eager=True)  # one signature pass, two consumers

    def _cross_all(idx_side):
        return (
            new_idx.alias("n")
            .join(
                idx_side.alias("c"),
                (F.col("n.band") == F.col("c.band"))
                & (F.col("n.bucket") == F.col("c.bucket")),
            )
            .select(
                F.least(F.col(f"n.{id_col}"), F.col(f"c.{id_col}")).alias("id_a"),
                F.greatest(F.col(f"n.{id_col}"), F.col(f"c.{id_col}")).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )

    if max_bucket:
        # the star guard, index-side: a hot corpus bucket (m members)
        # joined against a hot new batch (n members) would emit n·m
        # pairs; instead pair each new doc with the bucket's min-id
        # canonical member only — the clone group stays connected
        # through it (same rationale as _bucket_pairs), output O(n).
        stats = index.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__n"), F.min(id_col).alias("__min")
        )
        nb = new_idx.join(stats, ["band", "bucket"])
        star = (
            nb.filter(F.col("__n") > max_bucket)
            .select(
                F.least(F.col(id_col), F.col("__min")).alias("id_a"),
                F.greatest(F.col(id_col), F.col("__min")).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )
        small = index.join(
            stats.filter(F.col("__n") <= max_bucket).select("band", "bucket"),
            ["band", "bucket"],
        )
        cross = _cross_all(small).unionByName(star)
    else:
        cross = _cross_all(index)
    within = _bucket_pairs(new_idx, id_col, ["band", "bucket"], max_bucket)
    return cross.unionByName(within).distinct(), new_idx


def keep_best_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    score: Column | str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-document selection — the retention step after
    clustering: keep exactly ONE document per duplicate cluster, the
    one maximizing `score` (a Column/SQL expression over the document
    row, e.g. `quality_score_expr(F.col("text"))`), ties broken by the
    smaller id so the choice is deterministic. Documents absent from
    `clusters` are treated as singletons and always kept.

    Scale shape: one broadcast-able join to attach cluster labels
    (clusters carries two ids per row — skinny), then a single
    max_by-style (cluster → struct(score, -id)) aggregation over a
    (cluster, score, id) projection + an id semi-join back, so the
    payload crosses one shuffle keyed by cluster and the winner
    re-attach is AQE-broadcastable. The common pretraining-pipeline
    alternative (a row_number window over the full payload) sorts
    every payload column; this sorts nothing.

    reference: no equivalent (the reference is transform-only); the
    behavioral model is the canonical-doc selection step in public
    dedup pipelines (e.g. the "keep longest/highest-quality member"
    policy in SlimPajama/FineWeb-style minhash dedup).
    """
    sc = score if isinstance(score, Column) else F.expr(str(score))
    labeled = docs.join(
        clusters.select(id_col, "cluster"), on=id_col, how="left"
    ).withColumn("__cl", F.coalesce(F.col("cluster"), F.col(id_col))).drop("cluster")
    proj = labeled.select(id_col, "__cl", sc.cast("double").alias("__score"))
    # deterministic argmax: max over (score, -id) structs — map-side
    # combining, no window sort, no payload in the agg buffer
    winners = (
        proj.groupBy("__cl")
        .agg(F.max(F.struct(F.col("__score"), (-F.col(id_col)).alias("__nid"))).alias("__w"))
        .select((-F.col("__w.__nid")).alias(id_col))
    )
    return labeled.join(winners, on=id_col, how="left_semi").drop("__cl")
