"""Multimodal column plumbing: image/audio/video as opaque binary.

Decode support (no image/audio libraries in this container, so the
decoders are pure-stdlib):

- PNG: REAL decode — signature + IHDR parse, zlib-inflate of IDAT,
  per-scanline unfiltering (filter types 0-4), then an 8-bin intensity
  histogram feature. Handles 8-bit grayscale/RGB/RGBA.
- WAV: REAL decode — RIFF/fmt/data chunk walk, 16-bit PCM sample parse,
  8-segment RMS feature.
- anything else: `fake=True` produces a deterministic stub (so the
  Spark-side plumbing — schema, Arrow batch shape, mapInPandas
  partitioning — stays testable for formats whose decoders would need
  PIL/pyav); `fake=False` raises NotImplementedError.

Dispatch is by magic bytes, so real PNG/WAV payloads decode for real
even when the stub fallback is enabled.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# bytes per pixel for 8-bit depth by PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png_pixels(payload: bytes):
    """Pure-stdlib PNG decode to raw pixels: IHDR parse, IDAT inflate,
    scanline unfilter (types 0 None / 1 Sub / 2 Up / 3 Average /
    4 Paeth). 8-bit, non-interlaced only. Returns (w, h, ctype, px)
    where px is h*w*bpp unfiltered bytes."""
    import struct
    import zlib

    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth} color={ctype} interlace={interlace})")
    # walk chunks, concatenate IDAT
    idat = bytearray()
    off = 8
    while off + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[off:off + 4])
        tag = payload[off + 4:off + 8]
        if tag == b"IDAT":
            idat += payload[off + 8:off + 8 + length]
        if tag == b"IEND":
            break
        off += 12 + length
    raw = zlib.decompress(bytes(idat))
    bpp = _PNG_CHANNELS[ctype]
    stride = w * bpp
    px = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        px[y * stride:(y + 1) * stride] = line
        prev = line
    return w, h, ctype, px


def _decode_png(payload: bytes):
    """PNG decode + 8-bin normalized intensity-histogram feature
    (decode itself in _decode_png_pixels)."""
    w, h, _ctype, px = _decode_png_pixels(payload)
    hist = [0] * 8
    for v in px:
        hist[v >> 5] += 1
    total = len(px) or 1
    feat = [cnt / total for cnt in hist]
    return w, h, 1, feat


def _decode_wav(payload: bytes):
    """Pure-stdlib WAV decode: RIFF chunk walk, 16-bit PCM samples,
    8-segment RMS feature. n_frames = sample frames in the data chunk."""
    import struct

    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    off = 12
    channels = rate = bits = None
    data = b""
    while off + 8 <= len(payload):
        tag = payload[off:off + 4]
        (length,) = struct.unpack("<I", payload[off + 4:off + 8])
        body = payload[off + 8:off + 8 + length]
        if tag == b"fmt ":
            _fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        off += 8 + length + (length & 1)
    if channels is None or bits != 16:
        raise ValueError(f"unsupported WAV (bits={bits})")
    n_samples = len(data) // 2
    samples = struct.unpack(f"<{n_samples}h", data[: n_samples * 2])
    n_frames = n_samples // channels
    # 8-segment RMS, normalized to [0, 1]
    feat = []
    seg = max(1, n_samples // 8)
    for s in range(8):
        chunk = samples[s * seg:(s + 1) * seg]
        if chunk:
            rms = (sum(x * x for x in chunk) / len(chunk)) ** 0.5 / 32768.0
        else:
            rms = 0.0
        feat.append(rms)
    # width=sample rate, height=channels: the schema's spatial slots
    # carry the audio geometry (documented contract)
    return int(rate), int(channels), int(n_frames), feat


def _decode_bytes(payload: bytes, kind: str, fake: bool):
    """Magic-byte dispatch: real PNG/WAV decoders first; other formats
    fall back to the deterministic stub (fake=True) or raise."""
    h = payload if payload is not None else b""
    if h[:8] == _PNG_SIG:
        return _decode_png(h)
    if h[:4] == b"RIFF" and h[8:12] == b"WAVE":
        return _decode_wav(h)
    if not fake:
        raise NotImplementedError(
            "media decode for this format requires image/audio libs not "
            "present in this container (PNG and WAV decode natively) — "
            "pass fake=True for the deterministic stub"
        )
    # deterministic fake: dimensions + an 8-dim feature derived from bytes
    w = 16 + (len(h) % 64)
    ht = 16 + ((len(h) * 7) % 64)
    frames = 1 if kind == "image" else 1 + (len(h) % 30)
    feat = [float((sum(h[i::8]) % 1000) / 1000.0) if h else 0.0 for i in range(8)]
    return w, ht, frames, feat


def extract_features(df: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    The UDF signature/batching is production-shaped: iterator of
    pandas DataFrames in, iterator out, so one Python worker streams
    whole Arrow batches (never per-row Python)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [],
                "height": [],
                "n_frames": [],
                "feature": [],
            }
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                w, h, nf, feat = _decode_bytes(
                    bytes(payload) if payload is not None else b"", kind, fake
                )
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 5, fake: bool = True) -> DataFrame:
    """Video frame sampling: 1→N rows (media_id, frame_idx). The decode
    is the same stub; the explode shape matches a real frame extractor."""
    feats = extract_features(df, fake=fake)
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return feats.select("media_id", "kind", F.explode(idx).alias("frame_idx"))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BooleanType()),
    ]
)


def _encode_png_raw(width: int, height: int, ctype: int, px: bytes) -> bytes:
    """Re-encode unfiltered pixel bytes (any supported color type) as a
    valid 8-bit PNG, filter 0 per scanline."""
    import struct
    import zlib

    bpp = _PNG_CHANNELS[ctype]
    stride = width * bpp

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += px[y * stride:(y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Nearest-neighbor image resize over Arrow batches (mapInPandas).

    REAL for 8-bit non-interlaced PNG payloads: pure-stdlib decode
    (_decode_png_pixels) → nearest-neighbor sample → PNG re-encode,
    so the output payload is itself a decodable PNG at the target
    dimensions (round-trip pinned in tests). Other image formats need
    codecs not present in this container: they raise
    NotImplementedError unless fake=True, which passes the payload
    through and stamps the target dims (the documented stub shape).
    Non-image kinds pass through untouched (resized=false, null dims).

    Scale shape: map-local (no shuffle, no driver collect); memory is
    bounded by Arrow batch size × decoded pixel buffer. The reference
    has no media plane — this extends SURVEY.md §6's multimodal
    columns per the large-scale-training-pipeline requirement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": [],
                "width": [],
                "height": [],
                "resized": [],
            }
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                if kind != "image":
                    out["payload"].append(b)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["resized"].append(False)
                    continue
                if b[:8] == _PNG_SIG:
                    sw, sh, ctype, px = _decode_png_pixels(b)
                    bpp = _PNG_CHANNELS[ctype]
                    sstride = sw * bpp
                    xs = [min(int(x * sw / width), sw - 1) for x in range(width)]
                    ys = [min(int(y * sh / height), sh - 1) for y in range(height)]
                    npx = bytearray(width * height * bpp)
                    pos = 0
                    for sy in ys:
                        row = sy * sstride
                        for sx in xs:
                            o = row + sx * bpp
                            npx[pos:pos + bpp] = px[o:o + bpp]
                            pos += bpp
                    out["payload"].append(_encode_png_raw(width, height, ctype, bytes(npx)))
                    out["width"].append(width)
                    out["height"].append(height)
                    out["resized"].append(True)
                elif fake:
                    out["payload"].append(b)
                    out["width"].append(width)
                    out["height"].append(height)
                    out["resized"].append(False)
                else:
                    raise NotImplementedError(
                        "resize for non-PNG images requires image libs not "
                        "present in this container — pass fake=True for the "
                        "pass-through stub"
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZE_SCHEMA)


def encode_png(width: int, height: int, pixel_fn) -> bytes:
    """Minimal PNG encoder (RGB, 8-bit, filter 0) — test fixtures and
    the real-decode driver query. pixel_fn(x, y) -> (r, g, b)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0
        for x in range(width):
            raw += bytes(pixel_fn(x, y))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_wav(n_frames: int, sample_fn, rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal 16-bit PCM WAV encoder. sample_fn(i) -> int16."""
    import struct

    data = struct.pack(
        f"<{n_frames * channels}h",
        *[sample_fn(i) for i in range(n_frames * channels)],
    )
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synthesize_real_media(ids_df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Real PNG/WAV payloads, deterministic per id: even ids become an
    RGB PNG of width 4+id%13 × height 3+id%7, odd ids a mono 16-bit WAV
    with 100+id%50 frames at 8 kHz. mapInPandas so payload construction
    is Arrow-batched like a production media loader."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "mime": [], "payload": [], "meta": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 2 == 0:
                    w, h = 4 + mid % 13, 3 + mid % 7
                    payload = encode_png(
                        w, h, lambda x, y: ((x * 3 + mid) % 256, (y * 5) % 256, (x + y) % 256)
                    )
                    rows["kind"].append("image")
                    rows["mime"].append("image/png")
                else:
                    nf = 100 + mid % 50
                    payload = encode_wav(nf, lambda i: ((i * 773 + mid * 131) % 2048) - 1024)
                    rows["kind"].append("audio")
                    rows["mime"].append("audio/wav")
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["meta"].append({"synth": "real"})
            yield pd.DataFrame(rows)

    return ids_df.select(F.col(id_col)).mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload from sha2)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.unhex(F.sha2(F.concat(F.lit(seed), F.col("id")), 256))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        payload.alias("payload"),
        F.create_map(F.lit("seed"), F.lit(str(seed))).alias("meta"),
    )
