"""Connector gating: optional formats must fail with a clear message in
this jar-less environment, not an obscure classpath stack."""

from __future__ import annotations

import pytest

from mapreduce6240project_spark.sources.connectors import (
    lakehouse_available,
    read_lakehouse,
    write_lakehouse,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_lakehouse_probe_and_gate(spark):
    for fmt in ("delta", "iceberg", "hudi"):
        assert lakehouse_available(spark, fmt) is False  # jars not shipped
        with pytest.raises(NotImplementedError, match=fmt):
            write_lakehouse(load_table(spark, SF, "region"), "/tmp/x", fmt=fmt)
        with pytest.raises(NotImplementedError, match=fmt):
            read_lakehouse(spark, "/tmp/x", fmt=fmt)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown lakehouse format"):
        lakehouse_available(spark, "orcish")
