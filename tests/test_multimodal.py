"""Multimodal plumbing tests: Arrow-batch decode path, stub gating,
frame sampling shapes."""

from __future__ import annotations

import pytest

from mapreduce6240project_spark.operators.multimodal import (
    decode_and_featurize,
    documents_as_media,
    frame_sample,
    media_metadata,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load_table(spark, SF, "documents")).cache()


def test_metadata_pass_never_decodes(media):
    meta = media_metadata(media)
    rows = meta.limit(5).collect()
    assert {c for c in meta.columns} == {"media_id", "kind", "n_bytes", "payload_md5"}
    assert all(r.n_bytes > 0 and len(r.payload_md5) == 32 for r in rows)


def test_decode_stub_batch_path(media):
    out = decode_and_featurize(media)
    assert out.count() == media.count()
    r = out.filter("media_id = 0").first()
    assert r.feat_dim == 64 and r.n_bytes > 0
    # deterministic fake decode: mean of payload bytes
    payload = media.filter("media_id = 0").first().payload
    assert abs(r.feat_mean - round(sum(payload) / len(payload), 4)) < 1e-9


def test_real_decoder_nulls_unrecognized_blobs(media):
    # text blobs are not PPM/WAVE: the real path must yield NULL
    # features for every row (drop-not-abort), never raise
    out = decode_and_featurize(media, decode_stub=False)
    rows = out.limit(20).collect()
    assert rows and all(r.feat_mean is None and r.feat_dim is None for r in rows)


# ---------------------------------------------------------------------------
# real stdlib codecs: golden byte fixtures (hand-written, byte-exact)
# ---------------------------------------------------------------------------

# 2x1 P6 with a header comment: pixels (10, 20, 30), (40, 50, 60)
GOLDEN_PPM = b"P6\n# golden fixture\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
# mono 8 kHz PCM-16 with samples 1000, -2000, 300, -4
import struct as _struct

_WAV_DATA = _struct.pack("<4h", 1000, -2000, 300, -4)
GOLDEN_WAV = (
    b"RIFF"
    + _struct.pack("<I", 36 + len(_WAV_DATA))
    + b"WAVE"
    + b"fmt "
    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data"
    + _struct.pack("<I", len(_WAV_DATA))
    + _WAV_DATA
)


def test_parse_ppm_golden_bytes():
    from mapreduce6240project_spark.operators.multimodal import parse_ppm

    w, h, pix = parse_ppm(GOLDEN_PPM)
    assert (w, h) == (2, 1)
    assert pix == bytes([10, 20, 30, 40, 50, 60])
    for bad in (
        b"P5\n2 1\n255\n" + bytes(6),          # wrong magic
        GOLDEN_PPM[:-1],                        # truncated raster
        b"P6\n2 1\n65535\n" + bytes(12),        # 2-byte maxval unsupported
        b"P6\nx 1\n255\n" + bytes(6),           # non-numeric width
    ):
        with pytest.raises(ValueError):
            parse_ppm(bad)


def test_parse_wav_golden_bytes():
    from mapreduce6240project_spark.operators.multimodal import parse_wav

    ch, rate, samples = parse_wav(GOLDEN_WAV)
    assert (ch, rate) == (1, 8000)
    assert samples == [1000, -2000, 300, -4]
    with pytest.raises(ValueError):
        parse_wav(GOLDEN_WAV[:20])  # truncated chunk walk
    with pytest.raises(ValueError):
        parse_wav(b"RIFF" + b"\x00" * 20)  # not WAVE


def test_real_decode_end_to_end_on_golden_blobs(spark):
    # byte-exact features through the full Arrow path: PPM mean of
    # (10+20+30+40+50+60)/6 = 35.0; WAV mean of (1000-2000+300-4)/4
    rows = spark.createDataFrame(
        [(1, "unknown", bytearray(GOLDEN_PPM)), (2, "unknown", bytearray(GOLDEN_WAV))],
        "media_id long, kind string, payload binary",
    )
    out = {r.media_id: r for r in
           decode_and_featurize(rows, decode_stub=False).collect()}
    assert out[1].kind == "image" and out[1].feat_dim == 6
    assert out[1].feat_mean == 35.0
    assert out[1].n_bytes == len(GOLDEN_PPM)
    assert out[2].kind == "audio" and out[2].feat_dim == 4
    assert out[2].feat_mean == (1000 - 2000 + 300 - 4) / 4
    assert out[2].n_bytes == len(GOLDEN_WAV)


def test_synth_golden_media_roundtrips_formula(spark):
    # builder (struct.pack) and parsers (grammar walk) are independent
    # code paths; the formula is the source of truth for both
    from mapreduce6240project_spark.operators.multimodal import (
        golden_ppm_payload,
        golden_wav_payload,
        parse_ppm,
        parse_wav,
        synth_golden_media,
    )

    ids = spark.createDataFrame([(0,), (1,), (6,), (7,)], "doc_id long")
    blobs = {r.media_id: bytes(r.payload)
             for r in synth_golden_media(ids).collect()}
    assert blobs[6] == golden_ppm_payload(6)
    assert blobs[7] == golden_wav_payload(7)
    w, h, pix = parse_ppm(blobs[0])
    assert (w, h) == (8, 8) and len(pix) == 192
    assert list(pix[:4]) == [0 % 256, 7 % 256, 14 % 256, 21 % 256]
    _ch, _rate, samples = parse_wav(blobs[1])
    assert len(samples) == 96
    assert samples[0] == ((13) % 65536) - 32768


def test_frame_sample_row_explosion(media):
    frames = frame_sample(media, every_n_bytes=64)
    n_media = media.count()
    assert frames.count() >= n_media  # at least one frame per blob
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in per)


def test_frame_sample_digests_each_offset(media):
    # the digest must cover the bytes AT the frame offset, not block 0:
    # a multi-frame blob with non-repeating content has distinct digests
    from pyspark.sql import functions as F

    frames = frame_sample(media, every_n_bytes=64).cache()
    multi = (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("frame_digest").alias("nd"),
        )
        .filter("n >= 2")
        .collect()
    )
    assert multi, "fixture should contain blobs longer than one frame"
    assert all(r["nd"] >= 2 for r in multi)


def test_resize_payload_sizing(media):
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.operators.multimodal import resize

    out = resize(media, out_w=8, out_h=4).cache()
    assert out.count() == media.count()  # one row per blob
    # every payload is exactly out_w*out_h bytes, including empty inputs
    assert out.filter(F.octet_length("payload") != 32).count() == 0
    # deterministic: same input -> byte-identical output
    a = {r.media_id: bytes(r.payload) for r in out.limit(20).collect()}
    b = {
        r.media_id: bytes(r.payload)
        for r in resize(media, out_w=8, out_h=4).limit(20).collect()
    }
    for k in a:
        assert a[k] == b[k]


def test_resize_real_path_nearest_neighbor(spark, media):
    from mapreduce6240project_spark.operators.multimodal import (
        golden_ppm_payload,
        parse_ppm,
        resize,
    )

    # real resize of the 8x8 golden PPM to 2x2: nearest-neighbor picks
    # source pixels (0,0), (4,0), (0,4), (4,4) -- compute expected from
    # the formula and compare byte-exactly
    rows = spark.createDataFrame(
        [(6, "unknown", bytearray(golden_ppm_payload(6)))],
        "media_id long, kind string, payload binary",
    )
    out = resize(rows, out_w=2, out_h=2, decode_stub=False).first()
    w, h, pix = parse_ppm(bytes(out.payload))
    assert (w, h) == (2, 2)
    src_w, src_h, src = parse_ppm(golden_ppm_payload(6))
    expect = b"".join(
        src[((sy * src_w + sx) * 3) : ((sy * src_w + sx) * 3) + 3]
        for sy in (0, 4)
        for sx in (0, 4)
    )
    assert pix == expect
    assert out.n_bytes == len(bytes(out.payload))

    # non-PPM blobs yield NULL payloads, never abort
    bad = resize(media, decode_stub=False).limit(5).collect()
    assert bad and all(r.payload is None and r.n_bytes is None for r in bad)
