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


def test_real_decoder_is_clearly_stubbed(media):
    with pytest.raises(Exception) as ei:
        decode_and_featurize(media, decode_stub=False).count()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    ) or "real media decoding" in str(ei.value)


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


def test_resize_real_path_is_stubbed(media):
    from mapreduce6240project_spark.operators.multimodal import resize

    with pytest.raises(Exception) as ei:
        resize(media, decode_stub=False).count()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
