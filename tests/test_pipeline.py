import pytest
from pyspark.sql import functions as F

from wrangler_spark.pipeline.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from wrangler_spark.pipeline.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_topk,
)
from wrangler_spark.pipeline.text import analyze
from wrangler_spark.pipeline.multimodal import extract_features, frame_sample, synthesize_media


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base, "src0"),
        (1, base, "src1"),                       # exact dup of 0
        (2, base + " extra", "src2"),            # near dup of 0
        (3, "completely different text about spark query engines and shuffles", "src3"),
        (4, "der schnelle braune fuchs springt und das ist ein deutscher satz mit der die und", "src4"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 2, 3, 4]  # doc 1 removed (exact dup, min id survives)


def test_exact_dup_groups(spark, docs):
    g = exact_dup_groups(docs).collect()
    assert len(g) == 1 and g[0]["n_dups"] == 2 and g[0]["min_id"] == 0


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, num_hashes=32, bands=16).collect()}
    assert (0, 1) in pairs  # exact dups always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught
    assert (0, 3) not in pairs  # unrelated text does not


def test_minhash_dedup(spark, docs):
    out = sorted(r["doc_id"] for r in minhash_dedup(docs, num_hashes=32, bands=16).collect())
    assert 0 in out and 1 not in out
    assert 3 in out and 4 in out


def test_simhash_near_dups_close(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    mask = (1 << 64) - 1
    ham01 = bin((sigs[0] ^ sigs[1]) & mask).count("1")
    ham03 = bin((sigs[0] ^ sigs[3]) & mask).count("1")
    assert ham01 == 0  # identical text → identical simhash
    assert ham03 > 10  # unrelated text far apart
    cands = {(r["id_a"], r["id_b"]) for r in simhash_candidates(docs).collect()}
    assert (0, 1) in cands


def test_ngram_jaccard(spark, docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    d = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert d[(0, 1)] == 1.0
    assert (0, 3) not in d


@pytest.fixture(scope="module")
def embeddings(spark):
    import math

    rows = []
    for i in range(40):
        base = [math.sin(i * 0.7 + j) for j in range(8)]
        rows.append((i, [float(x) for x in base]))
    # vec 40 = near-exact copy of vec 0
    rows.append((40, [x * 1.001 for x in rows[0][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = brute_force_topk(embeddings, q, k=3).orderBy("rank").collect()
    assert top[0]["vec_id"] == 0 and top[0]["rank"] == 1
    assert top[1]["vec_id"] == 40  # the near-copy ranks second


def test_lsh_topk_contains_near_copy(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = lsh_topk(embeddings, q, dim=8, k=3, n_planes=8, n_tables=4).collect()
    got = {r["vec_id"] for r in top}
    assert 0 in got and 40 in got  # self + near-copy in the same buckets


def test_embedding_neardup(spark, embeddings):
    pairs = embedding_neardup_pairs(embeddings, dim=8, threshold=0.999, n_planes=8, n_tables=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 40) in got


def test_text_analyze(spark, docs):
    out = {r["doc_id"]: r for r in analyze(docs).collect()}
    assert out[0]["lang_guess"] == "en"
    assert out[4]["lang_guess"] == "de"
    assert out[0]["n_tokens"] == 14
    assert out[0]["n_tokens_bpe"] >= out[0]["n_tokens"]
    assert 0.0 <= out[0]["quality"] <= 1.0
    assert out[0]["fingerprint"] == out[1]["fingerprint"]  # same text
    assert out[0]["fingerprint"] != out[3]["fingerprint"]


def test_multimodal_features(spark):
    media = synthesize_media(spark, 30)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same input → same features
    again = extract_features(synthesize_media(spark, 30), fake=True).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_multimodal_decode_stub_raises(spark):
    media = synthesize_media(spark, 3)
    with pytest.raises(Exception):
        extract_features(media, fake=False).collect()


def test_frame_sample(spark):
    media = synthesize_media(spark, 12)
    frames = frame_sample(media, every_n=5)
    vid = frames.filter(F.col("kind") == "video").groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in vid)


def test_ngram_jaccard_hot_gram_cap(spark):
    """Skew guard: 1k near-identical docs sharing hot grams. The df-cap
    removes the hot grams before the self-join (bounded candidate rows),
    and pairs NOT involving hot grams keep their exact Jaccard."""
    rows = [(i, f"common boilerplate header text unique{i} tail{i} end{i}") for i in range(1000)]
    rows += [(2000, "alpha beta gamma delta epsilon zeta"),
             (2001, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(df, n=3, threshold=0.5, max_gram_df=50)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    # the clone flood shares only capped grams -> no pair survives from it
    assert not any(a < 1000 and b < 1000 for (a, b) in got)
    # the clean pair is exact: grams(2000)={abc,bcd,cde,dez}, same for 2001
    # with last gram differing: inter=3, union=5 -> 0.6
    assert got[(2000, 2001)] == pytest.approx(0.6)

    # candidate join input is bounded: each kept gram has df <= cap
    uncapped_on_clean = ngram_jaccard_pairs(
        df.filter("doc_id >= 2000"), n=3, threshold=0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in uncapped_on_clean} == {(2000, 2001)}


def test_simhash_candidates_degenerate_bucket_cap(spark):
    """A flood of identical short docs lands in one simhash bucket; the
    cap sub-buckets/drops it so the pair join stays bounded, while a
    normal-sized near-dup pair is still found."""
    rows = [(i, "same tiny doc repeated everywhere") for i in range(300)]
    rows += [(1000, "a genuinely distinctive document about catalyst optimizer internals"),
             (1001, "a genuinely distinctive document about catalyst optimizer internals plus")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_candidates(df, max_bucket=50)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # identical docs have identical simhash -> identical sub-bucket too;
    # the still-oversized bucket is dropped, so no flood pairs
    assert not any(a < 300 and b < 300 for (a, b) in got)
    assert (1000, 1001) in got


def test_minhash_affine_family_same_lsh_behavior(spark, docs):
    """The single-hash affine family preserves LSH behavior (exact dups
    collide in every band; unrelated docs don't collide)."""
    from wrangler_spark.pipeline.dedup import minhash_signatures

    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, num_hashes=32).collect()}
    assert sigs[0] == sigs[1]          # identical text -> identical signature
    assert sigs[0] != sigs[3]
    # near dup shares most minima
    agree = sum(1 for a, b in zip(sigs[0], sigs[2]) if a == b)
    assert agree >= 20


def test_embedding_neardup_recall_vs_exact(spark):
    """LSH near-dup path: every returned pair is exact-verified, and
    recall vs the exact all-pairs oracle is high at these settings."""
    import math, random

    rnd = random.Random(7)
    dim = 16
    base = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(30)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, v))
        # near-dup: tiny perturbation
        rows.append((i * 2 + 1, [x + rnd.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    approx = embedding_neardup_pairs(df, dim=dim, threshold=0.98, n_planes=8, n_tables=8)
    got = {(r["id_a"], r["id_b"]) for r in approx.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    vecs = dict(rows)
    exact = {
        (i, j)
        for i in vecs for j in vecs if i < j and cos(vecs[i], vecs[j]) >= 0.98
    }
    assert got <= exact  # no false positives (exact verify step)
    assert len(exact) > 0
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall}"


def test_png_decode_roundtrip():
    """Real PNG decode: encode a known 2x2 RGB image (filter 0) and
    recover exact dimensions + intensity histogram."""
    from wrangler_spark.pipeline.multimodal import _decode_bytes, encode_png

    pix = {(0, 0): (0, 0, 0), (1, 0): (255, 255, 255),
           (0, 1): (32, 64, 96), (1, 1): (224, 192, 160)}
    png = encode_png(2, 2, lambda x, y: pix[(x, y)])
    w, h, nf, feat = _decode_bytes(png, "image", fake=False)
    assert (w, h, nf) == (2, 2, 1)
    # 12 channel bytes: three 0-31 (bin0: 0,0,0), 32 is bin1, 64 bin2,
    # 96 bin3, 160 bin5, 192 bin6, 224 bin7, three 255s bin7
    assert feat[0] == pytest.approx(3 / 12)
    assert feat[7] == pytest.approx(4 / 12)
    assert sum(feat) == pytest.approx(1.0)


def test_png_decode_filters():
    """Unfiltering correctness: zlib-recompress scanlines with Sub/Up/
    Average/Paeth filters and check the decoder recovers the pixels."""
    import struct, zlib
    from wrangler_spark.pipeline.multimodal import _decode_bytes, _PNG_SIG

    # 2x4 RGB image, one row per filter type 1..4
    rows = [bytes(range(6)), bytes(range(10, 16)), bytes(range(50, 56)), bytes(range(200, 206))]

    def _filt(ftype, line, prev, bpp=3):
        out = bytearray([ftype])
        for i, v in enumerate(line):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 1: pred = a
            elif ftype == 2: pred = b
            elif ftype == 3: pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((v - pred) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = bytes(6)
    for ftype, line in zip([1, 2, 3, 4], rows):
        raw += _filt(ftype, line, prev)
        prev = line

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    png = (_PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 4, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    w, h, nf, feat = _decode_bytes(png, "image", fake=False)
    assert (w, h) == (2, 4)
    # histogram reflects the original bytes, proving unfiltering worked
    exp = [0] * 8
    for line in rows:
        for v in line:
            exp[v >> 5] += 1
    assert feat == pytest.approx([e / 24 for e in exp])


def test_wav_decode():
    from wrangler_spark.pipeline.multimodal import _decode_bytes, encode_wav

    wav = encode_wav(120, lambda i: 1000 if i % 2 == 0 else -1000, rate=16000)
    w, h, nf, feat = _decode_bytes(wav, "audio", fake=False)
    assert (w, h, nf) == (16000, 1, 120)  # rate, channels, frames
    assert all(f == pytest.approx(1000 / 32768.0, abs=1e-6) for f in feat)


def test_real_media_extract_features(spark):
    """End-to-end: synthesized real PNG/WAV through mapInPandas with
    fake=False — the decoders, not the stub, produce the features."""
    from wrangler_spark.pipeline.multimodal import extract_features, synthesize_real_media

    ids = spark.range(20).select(F.col("id").alias("media_id"))
    feats = extract_features(synthesize_real_media(ids), fake=False)
    got = {r["media_id"]: r for r in feats.collect()}
    assert len(got) == 20
    for mid, r in got.items():
        if mid % 2 == 0:
            assert r["kind"] == "image"
            assert r["width"] == 4 + mid % 13 and r["height"] == 3 + mid % 7
            assert r["n_frames"] == 1
        else:
            assert r["kind"] == "audio"
            assert (r["width"], r["height"]) == (8000, 1)
            assert r["n_frames"] == 100 + mid % 50
        assert len(r["feature"]) == 8


# ---------------------------------------------------------------- round 3:
# star-pair guards on the bucket self-joins, quantified LSH recall, and
# the planted-invariant properties backing the driver oracles.

def test_minhash_lsh_pairs_star_guard(spark):
    """A clone army (the skew case the guard exists for): 1k identical
    docs form one bucket per band; with the star guard the pair output
    is linear (every clone ↔ the min-id canonical), not m²."""
    clones = [(i, "common boilerplate text repeated across the corpus many times over", f"s{i}")
              for i in range(1000)]
    other = [(5000, "a genuinely unique document about distributed joins", "u")]
    df = spark.createDataFrame(clones + other, "doc_id long, text string, source string")
    pairs = minhash_lsh_pairs(df, num_hashes=32, bands=8, max_bucket=50).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # linear star output: exactly (0, i) for every clone i — not 499500 pairs
    assert got == {(0, i) for i in range(1, 1000)}


def test_minhash_lsh_pairs_small_buckets_exact(spark, docs):
    """Buckets under the cap keep exhaustive all-pairs semantics: the
    guarded output equals the unguarded (max_bucket=0) output."""
    guarded = {(r["id_a"], r["id_b"])
               for r in minhash_lsh_pairs(docs, num_hashes=32, bands=16, max_bucket=100).collect()}
    exact = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_pairs(docs, num_hashes=32, bands=16, max_bucket=0).collect()}
    assert guarded == exact


def test_embedding_neardup_star_guard(spark):
    """500 near-identical embeddings (all signs agree → one bucket in
    every table, unsplittable by more planes): star guard keeps the
    candidate stream linear while every clone stays connected to the
    canonical vector and survives the exact cosine verify."""
    import math

    base = [math.sin(0.7 + j) for j in range(8)]
    rows = [(i, [float(x * (1.0 + 1e-5 * (i % 7))) for x in base]) for i in range(500)]
    rows.append((9000, [float(math.cos(3.1 * j) * (-1) ** j) for j in range(8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_neardup_pairs(
        df, dim=8, threshold=0.999, n_planes=8, n_tables=3, max_bucket=50
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, i) for i in range(1, 500)}


def test_lsh_topk_recall_floor(spark):
    """Quantified recall@5 vs the exact oracle on a seeded random
    corpus (near-orthogonal — the hard case), with the driver query's
    parameters (n_planes=4, n_tables=16): recall must clear 0.8."""
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r["q_id"], r["vec_id"]) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["q_id"], r["vec_id"])
              for r in lsh_topk(emb, q, dim=64, k=5, n_planes=4, n_tables=16).collect()}
    for qid in range(3):
        truth = {v for (qq, v) in exact if qq == qid}
        hit = truth & {v for (qq, v) in approx if qq == qid}
        assert len(hit) / len(truth) >= 0.8, f"recall@5 for q{qid} = {len(hit)/len(truth)}"


def test_fingerprint_append_monotone(spark, docs):
    """Winnowing containment (the driver oracle's invariant): appending
    a suffix preserves every original window, so the min-over-windows
    fingerprint can only decrease (texts ≥ one window wide)."""
    from wrangler_spark.pipeline.text import fingerprint_expr

    out = docs.select(
        "doc_id",
        fingerprint_expr(F.col("text")).alias("fp"),
        fingerprint_expr(F.concat(F.col("text"), F.lit(" zz-tail"))).alias("fp_app"),
        F.length("text").alias("n"),
    ).collect()
    for r in out:
        if r["n"] >= 8:
            assert r["fp_app"] <= r["fp"]


def test_simhash_permutation_invariant(spark, docs):
    """SimHash is a bag-of-tokens bit-vote sum → invariant under token
    permutation (the driver oracle's invariant)."""
    norm = F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " ")
    rev = docs.select("doc_id", F.array_join(F.reverse(norm), " ").alias("text"))
    s1 = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    s2 = {r["doc_id"]: r["simhash"] for r in simhash(rev).collect()}
    assert s1 == s2


def test_minhash_planted_copy_invariants(spark, docs):
    """Planted exact copies (the driver oracle's invariants): identical
    text ⇒ identical minhash signature, and the copy — sharing ALL band
    buckets with its smaller-id original — is always deduped."""
    from wrangler_spark.pipeline.dedup import minhash_signatures

    copies = docs.select(
        (F.col("doc_id") + F.lit(1000)).alias("doc_id"), "text", "source"
    )
    u = docs.unionByName(copies)
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(u, num_hashes=32).collect()}
    for i in range(5):
        assert sigs[i] == sigs[i + 1000]
    survivors = {r["doc_id"] for r in minhash_dedup(u, num_hashes=32, bands=8).collect()}
    assert all(i + 1000 not in survivors for i in range(5))


def test_ivf_topk_recall(spark):
    """IVF ANN (k-means coarse quantizer + inverted-list probe): on a
    clustered corpus, probing 2 of 8 lists must recover the exact
    top-5 with recall ≥ 0.8 per query (the true neighbors share the
    query's cluster by construction)."""
    import math
    import random

    from wrangler_spark.pipeline.similarity import ivf_topk

    rnd = random.Random(11)
    rows = []
    centers = [[math.sin(c * 1.3 + j) * 2 for j in range(16)] for c in range(5)]
    for i in range(400):
        c = centers[i % 5]
        rows.append((i, [float(x + rnd.uniform(-0.05, 0.05)) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r["q_id"], r["vec_id"]) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["q_id"], r["vec_id"])
              for r in ivf_topk(emb, q, dim=16, k=5, n_centroids=8, n_probe=2).collect()}
    for qid in range(3):
        truth = {v for (qq, v) in exact if qq == qid}
        hit = truth & {v for (qq, v) in approx if qq == qid}
        assert len(hit) / len(truth) >= 0.8, f"IVF recall@5 for q{qid} = {len(hit)/len(truth)}"


def test_ivf_reuse_trained_centroids(spark):
    """The trained quantizer is reusable across query batches (the
    100 TB shape: train once, assign once, probe many)."""
    import math

    from wrangler_spark.pipeline.similarity import ivf_topk, kmeans_centroids

    rows = [(i, [float(math.sin(i % 4 + j * 0.5)) for j in range(8)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids(emb, dim=8, k=4, n_iter=3)
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = ivf_topk(emb, q, dim=8, k=3, centroids=cents, n_probe=1).collect()
    assert top and {r["q_id"] for r in top} == {0}
    assert any(r["vec_id"] == 0 for r in top)  # self is in the probed list


def test_semantic_profile_basic_statistics(spark):
    """Reference statistics/BasicStatisticsTest.testMetaBasic shape:
    the finder battery classifies SSN / phone / zip / date / currency /
    URL cells and reports per-column match fractions."""
    from wrangler_spark.pipeline.profile import semantic_profile

    df = spark.createDataFrame(
        [("111-11-1111", "650-897-3839", "32826", "02/29/2000", "$1,234.56", "http://www.yahoo.com"),
         ("111-12-1111", "670-897-3839", "32826", "02/01/2011", "$56,789", "http://mars.io"),
         ("222", "670-897-3839", "32826", "9/14/2016", "", "http://mars.io")],
        "ssn string, phone string, zip string, dob string, amount string, site string",
    )
    out = {(r["column"], r["type"]): r for r in semantic_profile(df).collect()}
    assert out[("ssn", "ssn")]["matches"] == 2
    assert out[("phone", "us_phone")]["matches"] == 3
    assert out[("zip", "zip_code")]["frac"] == 1.0
    assert out[("dob", "date")]["matches"] == 3
    assert out[("amount", "currency")]["matches"] == 2
    assert out[("site", "url")]["frac"] == 1.0
    # non-string columns are skipped, empty battery result is typed
    df2 = spark.createDataFrame([(1,)], "x int")
    assert semantic_profile(df2).count() == 0


def test_repetition_stats_gopher_rules(spark):
    """Gopher repetition filters: duplicate lines, bullets, ellipses and
    symbol ratio detected; clean prose scores zero everywhere."""
    from wrangler_spark.pipeline.text import repetition_stats_expr

    from pyspark.sql import functions as F
    listy = "intro\nsame line\nsame line\n- a\n- b\n- c\nmore...\nend..."
    clean = "This is one honest paragraph of prose with no lists at all."
    df = spark.createDataFrame([(1, listy), (2, clean)], "id int, text string")
    out = {r["id"]: r for r in df.select(
        "id", repetition_stats_expr(F.col("text")).alias("st")).collect()}
    st1 = out[1]["st"]
    assert abs(st1["dup_line_frac"] - 1 / 8) < 1e-9      # 8 lines, 7 distinct
    assert abs(st1["bullet_frac"] - 3 / 8) < 1e-9
    assert abs(st1["ellipsis_frac"] - 2 / 8) < 1e-9
    assert st1["symbol_word_ratio"] > 0
    st2 = out[2]["st"]
    assert st2["dup_line_frac"] == 0.0 and st2["bullet_frac"] == 0.0
    assert st2["ellipsis_frac"] == 0.0 and st2["symbol_word_ratio"] == 0.0


def test_decontaminate_13gram(spark):
    """Benchmark decontamination: a doc sharing a 13-gram with the
    benchmark flags; unrelated and too-short docs do not."""
    from wrangler_spark.pipeline.dedup import decontaminate

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog while counting one two three four"),
         (2, "totally different content talking about query engines and shuffle partitions"),
         (3, "short doc")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog while counting one two three",)],
        "text string",
    )
    out = {r["doc_id"]: r["contaminated"] for r in decontaminate(corpus, bench).collect()}
    assert out == {1: True, 2: False, 3: False}
    # plan shape: the benchmark side broadcasts
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_chunk_documents_windows(spark):
    """Fixed-token chunking: 25 tokens at window 10 / overlap 3 yields
    starts 1,8,15,22; shorter docs one chunk; empty docs none."""
    from wrangler_spark.pipeline.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, text), (2, "short doc here"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, max_tokens=10, overlap=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 4
    assert by_doc[1][0]["chunk_text"].startswith("w0 ")
    assert by_doc[1][1]["chunk_text"].startswith("w7 ")
    assert by_doc[1][3]["n_chunk_tokens"] == 4
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 3
    assert 3 not in by_doc
    # every adjacent pair shares exactly `overlap` tokens
    t0 = by_doc[1][0]["chunk_text"].split()
    t1 = by_doc[1][1]["chunk_text"].split()
    assert t0[-3:] == t1[:3]


def test_chunk_documents_properties(spark):
    """Property (hypothesis): with overlap=0 the chunks partition the
    token stream exactly — concatenating chunk_texts in order
    reconstructs the tokenized document; with overlap>0 every token
    still appears and adjacent chunks share exactly `overlap` tokens."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from wrangler_spark.pipeline.text import chunk_documents

    word = st.text(alphabet="abcxyz01", min_size=1, max_size=6)

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(words=st.lists(word, min_size=1, max_size=60),
           max_tokens=st.integers(min_value=2, max_value=12),
           overlap=st.integers(min_value=0, max_value=5))
    def run(words, max_tokens, overlap):
        if overlap >= max_tokens:
            overlap = max_tokens - 1
        text = " ".join(words)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, max_tokens=max_tokens, overlap=overlap).collect(),
            key=lambda r: r["chunk_idx"],
        )
        toks = text.split()
        if overlap == 0:
            rebuilt = " ".join(r["chunk_text"] for r in rows).split()
            assert rebuilt == toks
        step = max_tokens - overlap
        for i, r in enumerate(rows):
            expect = toks[i * step: i * step + max_tokens]
            assert r["chunk_text"].split() == expect
            assert r["n_chunk_tokens"] == len(expect)

    run()


def test_redact_pii_idempotent(spark):
    """redact(redact(x)) == redact(x) — placeholders never re-match."""
    from pyspark.sql import functions as F

    from wrangler_spark.pipeline.text import redact_pii_expr

    txt = ("a 650-897-3839 b root@joltie.io c 111-11-1111 d "
           "4111 1111 1111 1111 e 10.0.0.1 f")
    df = spark.createDataFrame([(txt,)], "t string")
    once = df.select(redact_pii_expr(F.col("t")).alias("r"))
    twice = once.select(redact_pii_expr(F.col("r")).alias("r"))
    assert once.first()["r"] == twice.first()["r"]


def test_pack_sequences_greedy(spark):
    """Sequence packing: greedy per-shard fill never exceeds the
    budget, preserves (doc, chunk) order inside packs, and oversized
    chunks get their own pack."""
    from pyspark.sql import functions as F

    from wrangler_spark.pipeline.text import pack_sequences

    rows = [(1, i, t) for i, t in enumerate([300, 300, 300, 300, 600, 100])]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_chunk_tokens int")
    out = pack_sequences(df, budget=512, shards=1).orderBy("doc_id", "chunk_idx").collect()
    # greedy: [300], [300], ... budget 512 -> 300+300 > 512 so one per pack
    # until 600 (capped to 512, own pack), then 100 joins nothing after
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r)
    for pid, members in packs.items():
        total = sum(min(m["n_chunk_tokens"], 512) for m in members)
        assert total <= 512, (pid, total)
        assert [m["pack_pos"] for m in members] == list(range(len(members)))
    # order preserved globally within the shard
    flat = sorted(out, key=lambda r: (r["pack_id"], r["pack_pos"]))
    assert [r["chunk_idx"] for r in flat] == [0, 1, 2, 3, 4, 5]
    # a fuller mix packs tightly: 5x100 fits one 512 pack
    df2 = spark.createDataFrame(
        [(2, i, 100) for i in range(5)], "doc_id long, chunk_idx int, n_chunk_tokens int"
    )
    out2 = pack_sequences(df2, budget=512, shards=1).collect()
    assert {r["pack_id"] for r in out2} == {0}
    assert sorted(r["pack_pos"] for r in out2) == [0, 1, 2, 3, 4]


# ------------------------------------------------------ dup clustering
def test_dup_clusters_chain_and_star(spark):
    from wrangler_spark.pipeline.dedup import dup_clusters

    # chain 1-2-3-4 (diameter 3) + star 10-{11,12,13} + isolated pair
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}


def test_dup_clusters_singletons_via_vertices(spark):
    from wrangler_spark.pipeline.dedup import dup_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    verts = spark.createDataFrame([(1,), (2,), (7,), (9,)], "doc_id long")
    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(pairs, verts).collect()}
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_dup_clusters_transitive_through_jaccard(spark):
    """End-to-end: near-identical docs A≈B≈C must land in ONE cluster
    even when the (A, C) pair itself is below threshold — transitivity
    is the clustering's whole point."""
    from wrangler_spark.pipeline.dedup import dup_clusters, ngram_jaccard_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a quick brown fox jumps over the lazy cat today"),
        (4, "completely different text about spark and parquet files"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(pairs, docs).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4


def test_dup_clusters_max_iter_raises(spark):
    from wrangler_spark.pipeline.dedup import dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        dup_clusters(chain, max_iter=2)
    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(chain).collect()}
    assert set(got.values()) == {1}


# --------------------------------------------------- incremental dedup
def test_minhash_incremental_equals_full_pass(spark):
    """Index the corpus once, probe a new batch: pairs involving new
    docs must equal the full-corpus LSH pass restricted to those docs,
    and the returned index rows must make index-append = full rebuild."""
    from wrangler_spark.pipeline.dedup import (
        minhash_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    corpus_rows = [
        (1, base),
        (2, base + " extra"),
        (3, "completely unrelated text about parquet files and spark plans here"),
    ]
    new_rows = [
        (10, base + " indeed"),          # near-dup of 1/2 (cross pair)
        (11, base + " indeed!"),         # near-dup of 10 (within pair)
        (12, "another totally distinct document mentioning nothing similar at all"),
    ]
    kw = dict(num_hashes=64, bands=32, shingle_k=3)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    idx = minhash_index(corpus, **kw)

    pairs, new_idx = minhash_lsh_pairs_incremental(new, idx, **kw)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}

    full = minhash_lsh_pairs(corpus.union(new), **kw, max_bucket=1000)
    new_ids = {10, 11, 12}
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    assert got == want
    assert any(a in new_ids or b in new_ids for a, b in got)  # non-trivial

    # appended index == index built from scratch over corpus+new
    rebuilt = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in minhash_index(corpus.union(new), **kw).collect()
    }
    appended = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in idx.unionByName(new_idx).collect()
    }
    assert appended == rebuilt


def test_dup_clusters_property_random_graphs(spark):
    """Hypothesis: for ANY pair set, dup_clusters equals a plain-Python
    union-find over the same edges (singletons included via vertices)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from wrangler_spark.pipeline.dedup import dup_clusters

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 14), st.integers(0, 14)),
            min_size=0,
            max_size=20,
        )
    )
    def check(edges):
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(15))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in range(15)}

        verts = spark.createDataFrame([(v,) for v in range(15)], "doc_id long")
        if edges:
            pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        else:
            pairs = spark.createDataFrame([], "id_a long, id_b long")
        got = {
            r["doc_id"]: r["cluster"]
            for r in dup_clusters(pairs, verts, max_iter=40).collect()
        }
        assert got == want

    check()


def test_minhash_incremental_hot_bucket_star_guard(spark):
    """A corpus bucket larger than max_bucket pairs each new doc with
    the bucket's canonical min member ONLY — O(n) output — and the
    clone group still lands in one cluster through it."""
    from wrangler_spark.pipeline.dedup import (
        dup_clusters,
        minhash_index,
        minhash_lsh_pairs_incremental,
    )

    text = "identical boilerplate header repeated across the whole corpus again"
    corpus = spark.createDataFrame(
        [(i, text) for i in range(1, 9)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(100, text)], "doc_id long, text string")
    kw = dict(num_hashes=64, bands=32, shingle_k=3)
    idx = minhash_index(corpus, **kw)
    pairs, _ = minhash_lsh_pairs_incremental(new, idx, max_bucket=4, **kw)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 100)}  # star only: new doc <-> canonical member
    # clustering through the canonical connects the whole group
    full_pairs, _ = minhash_lsh_pairs_incremental(new, idx, max_bucket=0, **kw)
    all_pairs = pairs.unionByName(
        spark.createDataFrame(
            [(i, j) for i in range(1, 9) for j in range(i + 1, 9)],
            "id_a long, id_b long",
        )
    )
    cl = {r["doc_id"]: r["cluster"] for r in dup_clusters(all_pairs).collect()}
    assert len(set(cl.values())) == 1 and cl[100] == 1


def test_dedup_state_ingest_batch_equals_full_recompute(spark):
    """Round-5 (verdict task #3): the composed incremental mode —
    build_dedup_state once, ingest_batch per batch (persisted index
    probe + cluster-label carry-forward) — must produce the identical
    min-id cluster partition as a full recompute over corpus ∪ batch.
    Includes the hard case: a new doc BRIDGING two previously-separate
    corpus clusters, which must merge them."""
    from wrangler_spark.pipeline.corpus import build_dedup_state, ingest_batch
    from wrangler_spark.pipeline.dedup import dup_clusters, minhash_lsh_pairs

    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    b = "ships and the open sea with sailors charting stars for many long weeks"
    corpus_rows = [
        (1, a), (2, a + " extra"),              # cluster A
        (5, b), (6, b + " indeed"),             # cluster B
        (9, "a lone unrelated document about parquet footers and row groups"),
    ]
    # 10/11 extend A; 12 is new-new dup of 10; 20 bridges A and B
    new_rows = [
        (10, a + " indeed"), (11, a + " indeed"),
        (12, "completely fresh text that matches nothing else in this corpus"),
        (20, a + " " + b),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    kw = dict(num_hashes=64, bands=32, shingle_k=3)

    state = build_dedup_state(corpus, **kw)
    state2 = ingest_batch(state, new)
    inc = {r["doc_id"]: r["cluster"] for r in state2.clusters.collect()}

    alldocs = corpus.union(new)
    full = {
        r["doc_id"]: r["cluster"]
        for r in dup_clusters(
            minhash_lsh_pairs(alldocs, **kw), alldocs.select("doc_id")
        ).collect()
    }
    assert inc == full
    assert set(inc) == {1, 2, 5, 6, 9, 10, 11, 12, 20}
    # the bridge actually merged A and B (guards against a vacuous pass)
    assert inc[1] == inc[5] == inc[20] == 1
    assert inc[12] == 12 and inc[9] == 9
    # the updated index equals a from-scratch rebuild (append-only state)
    from wrangler_spark.pipeline.dedup import minhash_index

    assert {
        tuple(r) for r in state2.index.collect()
    } == {tuple(r) for r in minhash_index(alldocs, **kw).collect()}


# ---------------------------------------------------------------- round 5:
# real nearest-neighbor image resize (decode -> sample -> re-encode)


def test_resize_images_real_png_roundtrip():
    """Pure-Python resize: gradient PNG halved, decoded back — output is
    a valid PNG at target dims whose pixels equal the source at the
    nearest-neighbor mapped positions."""
    from wrangler_spark.pipeline.multimodal import (
        _decode_png_pixels, _encode_png_raw, encode_png, _PNG_CHANNELS,
    )

    src = encode_png(8, 6, lambda x, y: (x * 30, y * 40, (x + y) * 10))
    sw, sh, ctype, px = _decode_png_pixels(src)
    assert (sw, sh) == (8, 6)
    # simulate what resize_images does for one payload
    bpp = _PNG_CHANNELS[ctype]
    tw, th = 4, 3
    xs = [min(int(x * sw / tw), sw - 1) for x in range(tw)]
    ys = [min(int(y * sh / th), sh - 1) for y in range(th)]
    npx = bytearray()
    for sy in ys:
        for sx in xs:
            o = sy * sw * bpp + sx * bpp
            npx += px[o:o + bpp]
    out = _encode_png_raw(tw, th, ctype, bytes(npx))
    rw, rh, rctype, rpx = _decode_png_pixels(out)
    assert (rw, rh, rctype) == (tw, th, ctype)
    # nearest-neighbor: pixel (0,0) of output == source (0,0); (1,1) == source (2,2)
    assert rpx[:3] == px[:3]
    o_out = (1 * tw + 1) * bpp
    o_src = (2 * sw + 2) * bpp
    assert rpx[o_out:o_out + bpp] == px[o_src:o_src + bpp]


def test_resize_images_spark(spark):
    """resize_images over mapInPandas: every image payload comes back as
    a decodable PNG at the target size; audio passes through untouched;
    non-PNG images raise without fake=True."""
    import pytest
    from wrangler_spark.pipeline.multimodal import (
        extract_features, resize_images, synthesize_real_media,
    )

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    media = synthesize_real_media(ids)
    resized = resize_images(media, 5, 4)
    rows = {r["media_id"]: r for r in resized.collect()}
    assert len(rows) == 12
    audio_payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect() if r["kind"] == "audio"
    }
    for mid, r in rows.items():
        if mid % 2 == 0:
            assert r["resized"] and (r["width"], r["height"]) == (5, 4)
        else:
            assert not r["resized"] and r["width"] is None
            assert bytes(r["payload"]) == audio_payloads[mid]
    # the resized payloads are REAL PNGs: a second decode pass agrees
    feats = extract_features(resized.filter(F.col("kind") == "image"), fake=False)
    for r in feats.collect():
        assert (r["width"], r["height"]) == (5, 4)
    # non-PNG image payload without fake -> NotImplementedError
    bad = spark.createDataFrame(
        [(99, "image", bytearray(b"JPEGish"))], "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|resize for non-PNG"):
        resize_images(bad, 5, 4).collect()
    assert resize_images(bad, 5, 4, fake=True).first()["resized"] is False
