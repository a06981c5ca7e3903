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

from pyspark.sql import DataFrame
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


def _shingles(text_col: str, k: int = 5):
    """Word k-shingles as an array<string> (lowercased, whitespace tokens)."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))).otherwise(
        F.array(F.array_join(toks, " "))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig array<long>[num_hashes]) — min over per-shingle seeded xxhash64.

    Pure Column math: explode-free! signatures computed with
    F.transform + F.array_min over the shingle array per row (narrow,
    no shuffle at all).
    """
    max_long = (1 << 63) - 1
    sh = _shingles(text_col, shingle_k)
    # one pass over the shingle array: fold elementwise minimum of the
    # per-shingle seeded-hash vector. The shingle expression appears ONCE
    # in the plan (vs once per hash function), which matters: shingling is
    # O(words·k) string work per row.
    sig = F.aggregate(
        sh,
        F.array(*[F.lit(max_long).cast("long") for _ in range(num_hashes)]),
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)]),
            lambda a, b: F.least(a, b),
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
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band
    bucket. Returns (id_a, id_b, band-agnostic distinct pairs), id_a < id_b."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = _banded(sigs, id_col, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


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
    boilerplate clones. Full transitive closure would iterate this."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = _banded(sigs, id_col, num_hashes, bands)
    mins = banded.groupBy("band", "bucket").agg(F.min(id_col).alias("__keep"))
    losers = (
        banded.join(mins, on=["band", "bucket"])
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
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", chunks: int = 4
) -> DataFrame:
    """Near-dup candidates: equal 16-bit chunk of the 64-bit simhash in
    the same chunk position (catches Hamming distance ≤ chunks-1)."""
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
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select(id_col, "cv.chunk", "cv.val")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
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
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share ≥1 n-gram.

    explode n-grams → self-equality-join on gram → count shared grams
    per pair → |A∩B| / (|A|+|B|-|A∩B|). The gram join IS the candidate
    filter (no n² pass); hot grams are capped implicitly by distinct().
    """
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.when(
        cnt >= n, F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    ).otherwise(F.array(F.array_join(toks, " ")))
    g = df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram"))
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
