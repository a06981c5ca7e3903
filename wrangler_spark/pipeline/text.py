"""Text analysis for training-data curation.

language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex pieces),
and rolling-hash document fingerprinting — all native Column
expressions (regexp + array math), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny high-frequency stopword sets per language — enough signal for a
# coarse n-gram/stopword language heuristic (not a trained model)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "no", "es", "por", "una", "para"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(F.regexp_replace(col, r"[^\w\s']", " "))), r"\s+")


def lang_id_expr(text_col: Column) -> Column:
    """Best-guess language code by stopword hit-rate; 'unknown' when no
    language scores."""
    toks = _tokens(text_col)
    scores = []
    for lang, words in _STOPWORDS.items():
        hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("unknown"))


def token_count_expr(text_col: Column, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' or 'bpe' (BPE-ish regex pieces: word
    chunks ≤4 chars count 1, longer words count ceil(len/4); numbers and
    punctuation count per char — a deterministic proxy for a real BPE)."""
    if mode == "whitespace":
        s = F.trim(text_col)
        return F.when(F.length(s) == 0, 0).otherwise(F.size(F.split(s, r"\s+")))
    pieces = F.split(F.coalesce(text_col, F.lit("")), r"\s+")
    per_word = F.transform(
        pieces,
        lambda w: F.when(F.length(w) == 0, 0).otherwise(F.ceil(F.length(w) / 4.0).cast("int")),
    )
    return F.aggregate(per_word, F.lit(0), lambda acc, v: acc + v)


def quality_score_expr(text_col: Column) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio + stopword
    presence + punctuation sanity (mirrors common pretraining filters)."""
    s = F.coalesce(text_col, F.lit(""))
    n = F.length(s)
    n_alpha = F.length(F.regexp_replace(s, r"[^A-Za-zÀ-ÿ]", ""))
    n_punct = F.length(F.regexp_replace(s, r"[^.,;:!?]", ""))
    n_words = F.when(F.length(F.trim(s)) == 0, 0).otherwise(F.size(F.split(F.trim(s), r"\s+")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(_tokens(s)), F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
        )
    )
    len_score = F.when(n.between(50, 100_000), 1.0).when(n.between(20, 49), 0.5).otherwise(0.0)
    alpha_score = F.when(n > 0, n_alpha / n).otherwise(0.0)
    punct_score = F.when(n_words > 0, F.least(F.lit(1.0), 5.0 * n_punct / n_words)).otherwise(0.0)
    stop_score = F.least(F.lit(1.0), stop_hits / 3.0)
    return (0.3 * len_score + 0.3 * alpha_score + 0.2 * stop_score + 0.2 * punct_score).cast(
        "double"
    )


def repetition_stats_expr(text_col: Column) -> Column:
    """Gopher-style repetition / format signals as one struct column —
    the standard pretraining-corpus filters (Rae et al. 2021 §A1.1)
    that catch boilerplate and scraped-list pages:

      dup_line_frac   — 1 - distinct(non-empty lines)/lines
      bullet_frac     — fraction of lines starting with a bullet
                        (-, *, •) after leading whitespace
      ellipsis_frac   — fraction of lines ending with '...' or '…'
      symbol_word_ratio — (#, …, ...) occurrences per word

    Pure Column algebra over the split-lines array: no shuffle, no
    Python — the cost at 100 TB is the scan.
    """
    s = F.coalesce(text_col, F.lit(""))
    lines = F.filter(F.split(s, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(F.lit(0.0))
    bullets = F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    bullet_frac = F.when(n_lines > 0, F.size(bullets) / n_lines).otherwise(F.lit(0.0))
    ellipsis = F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    ellipsis_frac = F.when(n_lines > 0, F.size(ellipsis) / n_lines).otherwise(F.lit(0.0))
    n_words = F.when(F.length(F.trim(s)) == 0, 0).otherwise(
        F.size(F.split(F.trim(s), r"\s+"))
    )
    n_symbols = F.size(F.split(s, r"#|\.\.\.|…")) - 1
    symbol_word_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0))
    return F.struct(
        dup_line_frac.cast("double").alias("dup_line_frac"),
        bullet_frac.cast("double").alias("bullet_frac"),
        ellipsis_frac.cast("double").alias("ellipsis_frac"),
        symbol_word_ratio.cast("double").alias("symbol_word_ratio"),
    )


def fingerprint_expr(text_col: Column, window: int = 8, stride: int = 4) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over character
    windows (winnowing-lite) — stable under small appends, unlike a
    whole-document hash.

    Windows are sampled every `stride` characters from position 1: the
    sketch is a global min, and a longer text's stride positions are a
    superset of a prefix's, so append-monotonicity (fp(text||suffix) <=
    fp(text)) holds exactly as with stride 1 while hashing `stride`x
    fewer windows — the substring+hash per window is the whole cost of
    this expression at scale."""
    s = F.coalesce(text_col, F.lit(""))
    n = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)), F.lit(stride))
    hashes = F.transform(idx, lambda i: F.xxhash64(F.substring(s, i, window)))
    return F.array_min(hashes)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach lang_guess / n_tokens / n_tokens_bpe / quality / fingerprint."""
    c = F.col(text_col)
    return (
        df.withColumn("lang_guess", lang_id_expr(c))
        .withColumn("n_tokens", token_count_expr(c))
        .withColumn("n_tokens_bpe", token_count_expr(c, "bpe"))
        .withColumn("quality", quality_score_expr(c))
        .withColumn("fingerprint", fingerprint_expr(c))
    )


# PII patterns for in-text redaction — UNANCHORED variants of the
# semantic-profile battery (profile.py SEMANTIC_TYPES matches whole
# cells; redaction masks occurrences inside free text). Order matters:
# credit-card before phone so 16-digit groups don't half-match.
REDACT_PATTERNS: list[tuple[str, str]] = [
    ("credit_card", r"\b(?:\d[ -]?){13,16}\b"),
    ("ssn", r"\b\d{3}[- ]\d{2}[- ]\d{4}\b"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("us_phone", r"(\+?1[-. ])?(\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b((25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(25[0-5]|2[0-4]\d|1?\d?\d)\b"),
]


def redact_pii_expr(text_col: Column, kinds: list[str] | None = None) -> Column:
    """Mask PII occurrences inside free text with [TYPE] placeholders —
    the corpus-sanitization pass run before pretraining. A chain of
    regexp_replace Columns: JVM-side, codegen-fused, no shuffle."""
    out = F.coalesce(text_col, F.lit(""))
    selected = kinds or [k for k, _ in REDACT_PATTERNS]
    for kind, rx in REDACT_PATTERNS:
        if kind in selected:
            out = F.regexp_replace(out, rx, f"[{kind.upper()}]")
    return out


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-token-window chunks with overlap —
    the sequence-packing prep step before pretraining/embedding. One
    row per chunk: (id, chunk_idx, chunk_text, n_chunk_tokens).

    All JVM-side: tokens split once, chunk starts are a sequence with
    step (max_tokens - overlap), each chunk a slice+concat — the
    explode is the only row-multiplying op and it stays in-partition
    (no shuffle), so the cost at 100 TB is the scan plus output write.
    """
    if overlap >= max_tokens:
        raise ValueError("chunk_documents: overlap must be < max_tokens")
    step = max_tokens - overlap
    s = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.filter(F.split(s, r"\s+"), lambda t: t != "")
    k = F.size(toks)
    # starts: 1, 1+step, ... while start <= max(k - overlap, 1) so the
    # last chunk is never pure overlap of the previous one
    starts = F.sequence(F.lit(1), F.greatest(k - overlap, F.lit(1)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda st: F.struct(
            F.concat_ws(" ", F.slice(toks, st, max_tokens)).alias("chunk_text"),
            F.least(F.lit(max_tokens), k - st + 1).alias("n_chunk_tokens"),
        ),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(F.when(k > 0, chunks).otherwise(F.array())).alias(
            "chunk_idx", "c"
        ),
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").cast("int").alias("n_chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_chunk_tokens",
    id_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
    shards: int = 256,
) -> DataFrame:
    """Assign chunks to fixed-token training sequences (sequence
    packing): within a shard, walk chunks in (doc, chunk) order and
    open a new pack whenever the running total would exceed `budget` —
    exact greedy fill, so no pack ever exceeds budget (a chunk larger
    than budget gets a pack of its own).

    Scale shape: packing is SHARD-LOCAL (hash of doc id -> shard), the
    standard pack-within-shards layout — greedy fill is inherently
    sequential, so it runs per shard in one Arrow batch stream
    (applyInPandas); size `shards` so a shard's chunk metadata fits an
    executor. Returns the input plus (shard, pack_id, pack_pos).
    """
    import pandas as pd  # noqa: F401 (applyInPandas annotations)
    from pyspark.sql import types as T

    d0, d1 = id_cols
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("shard", T.IntegerType()),
            T.StructField("pack_id", T.IntegerType()),
            T.StructField("pack_pos", T.IntegerType()),
        ]
    )
    with_shard = df.withColumn(
        "__shard", (F.abs(F.xxhash64(F.col(d0))) % shards).cast("int")
    )

    def pack(pdf):
        pdf = pdf.sort_values([d0, d1]).reset_index(drop=True)
        pack_ids, positions = [], []
        cur_pack, cur_tokens, cur_pos = 0, 0, 0
        for t in pdf[token_col]:
            t = min(int(t), budget)
            if cur_tokens + t > budget and cur_tokens > 0:
                cur_pack += 1
                cur_tokens, cur_pos = 0, 0
            pack_ids.append(cur_pack)
            positions.append(cur_pos)
            cur_tokens += t
            cur_pos += 1
        res = pdf.copy()
        res["shard"] = res["__shard"]
        res["pack_id"] = pack_ids
        res["pack_pos"] = positions
        return res.drop(columns=["__shard"])

    return with_shard.groupBy("__shard").applyInPandas(pack, out_schema)
