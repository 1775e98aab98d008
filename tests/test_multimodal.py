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
