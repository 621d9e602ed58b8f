"""Golden-file tests for the CSV<->JSON converter (sources/convert.py) —
mirrors the reference's csv2json golden tests (run CLI, compare output
files; common/tests/test_csv2json.py:28-74) including the UTF-8 case and
the fatal arity-mismatch path."""

import json
import os

import pytest

from ccdb_data_pipeline_spark.sources.convert import (
    FieldArityError,
    json_array,
    read_csv,
    read_ndjson,
    write_csv,
    write_ndjson,
)

CSV_TEXT = "\n".join(
    [
        "Complaint ID,Product Name,What Happened",
        "1001,loans,simple row",
        "1002,cards,ünïcødé Ḋäta — 测试文本",
        '1003,deposits,"quoted, with comma"',
        "",
    ]
)
FIELDS = ["complaint_id", "product", "narrative"]


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(CSV_TEXT, encoding="utf-8")
    return str(p)


def test_read_csv_header_passthrough(spark, csv_path):
    df = read_csv(spark, csv_path)
    assert df.columns == ["Complaint ID", "Product Name", "What Happened"]
    assert df.count() == 3


def test_field_override_and_ndjson_roundtrip(spark, tmp_path, csv_path):
    df = read_csv(spark, csv_path, fields=FIELDS)
    out = str(tmp_path / "out.ndjson")
    write_ndjson(df.coalesce(1), out)
    lines = []
    for fn in sorted(os.listdir(out)):
        if fn.endswith(".json"):
            with open(os.path.join(out, fn), encoding="utf-8") as f:
                lines += [json.loads(line) for line in f if line.strip()]
    by_id = {r["complaint_id"]: r for r in lines}
    assert set(by_id) == {"1001", "1002", "1003"}
    assert by_id["1002"]["narrative"] == "ünïcødé Ḋäta — 测试文本"
    assert by_id["1003"]["narrative"] == "quoted, with comma"
    # and the scan side reads it back identically
    back = read_ndjson(spark, out)
    assert back.count() == 3
    assert set(back.columns) == set(FIELDS)


def test_arity_mismatch_is_fatal(spark, csv_path):
    with pytest.raises(FieldArityError):
        read_csv(spark, csv_path, fields=["only", "two"])


def test_row_limit(spark, csv_path):
    assert read_csv(spark, csv_path, fields=FIELDS, limit=2).count() == 2


def test_json_array_single_document(spark, csv_path):
    df = read_csv(spark, csv_path, fields=FIELDS)
    doc = json.loads(json_array(df, order_by=["complaint_id"]))
    assert [r["complaint_id"] for r in doc] == ["1001", "1002", "1003"]
    assert doc[1]["narrative"].startswith("ünïcødé")


def test_json_array_ordered_across_partitions(spark):
    """Regression: the sorted frame spanning many partitions must still emit
    an ordered array (ungrouped aggs fetch shuffle blocks in nondeterministic
    order — json_array coalesces to one partition before aggregating)."""
    df = spark.range(0, 500).selectExpr("id", "concat('k', lpad(id, 4, '0')) AS k").repartition(16)
    doc = json.loads(json_array(df, order_by=["k"]))
    assert [r["id"] for r in doc] == list(range(500))


def test_write_csv_header_override(spark, tmp_path, csv_path):
    df = read_csv(spark, csv_path, fields=FIELDS)
    out = str(tmp_path / "pub.csv")
    write_csv(df.coalesce(1), out, header_names=["Complaint ID", "Product", "Consumer narrative"])
    files = [fn for fn in os.listdir(out) if fn.endswith(".csv")]
    with open(os.path.join(out, files[0]), encoding="utf-8") as f:
        header = f.readline().strip()
    assert header == "Complaint ID,Product,Consumer narrative"
    with pytest.raises(FieldArityError):
        write_csv(df, str(tmp_path / "bad.csv"), header_names=["a"])
