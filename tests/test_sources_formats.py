"""Source/sink format coverage (SURVEY §2.D scans row): CSV, JSON,
ORC, and parquet write→read round-trips through the same engine
session. The driver testdata is parquet-only, so these are
self-contained round-trips on derived data."""

from __future__ import annotations

from pyspark.sql import functions as F

from oamap_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _nation_rows(spark):
    return load_table(spark, SF_SMOKE, "nation").orderBy("n_nationkey")


def test_csv_roundtrip(spark, tmp_path):
    df = _nation_rows(spark)
    path = str(tmp_path / "nation_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(path)
        .orderBy("n_nationkey")
    )
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in df.collect()]


def test_json_roundtrip(spark, tmp_path):
    df = _nation_rows(spark)
    path = str(tmp_path / "nation_json")
    df.write.mode("overwrite").json(path)
    back = spark.read.json(path).select(*df.columns).orderBy("n_nationkey")
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in df.collect()]


def test_orc_roundtrip_nested(spark, tmp_path):
    """ORC preserves nested structs/arrays like parquet (same
    column-pruned scan path at scale)."""
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.collect_list(F.struct("l_linenumber", "l_quantity")).alias("lines"))
        .orderBy("l_orderkey")
        .limit(100)
    )
    path = str(tmp_path / "orders_orc")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).orderBy("l_orderkey").limit(100)
    a = [(r["l_orderkey"], sorted(map(tuple, r["lines"]))) for r in li.collect()]
    b = [(r["l_orderkey"], sorted(map(tuple, r["lines"]))) for r in back.collect()]
    assert a == b


def test_partitioned_parquet_write_prunes(spark, tmp_path):
    """Hive-partitioned write + partition-pruned read: the scan of one
    partition must not list the others (PartitionFilters at 100 TB)."""
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "events_part")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    one = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    from oamap_spark.plans import audit

    p = audit.plan_string(one)
    assert "PartitionFilters" in p
    exact = ev.where(F.col("event_type") == "purchase").count()
    assert one.count() == exact


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: files written under an older schema coexist
    with newer ones — mergeSchema unifies, old rows read NULL for new
    columns (oamap's widening inference, at the storage layer)."""
    from oamap_spark.sources.fill import fromdata

    p = str(tmp_path / "evolving")
    fromdata(spark, [{"a": 1, "b": "x"}]).write.parquet(p)
    fromdata(spark, [{"a": 2, "b": "y", "c": 1.5}]).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"a", "b", "c"}
    rows = {r["a"]: r["c"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 1.5


def test_xml_read_write_roundtrip_nested(spark, tmp_path):
    """XML is a first-class built-in source in Spark 4: nested,
    repeated elements land as array<struct> — the same Dremel-style
    shredding as every other nested ingest (oamap fill semantics at
    the storage layer). Round-trip: write with rowTag, read back."""
    from oamap_spark.sources.fill import fromdata

    df = fromdata(
        spark,
        [
            {"id": 1, "tags": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]},
            {"id": 2, "tags": [{"k": "c", "v": 3}]},
        ],
    )
    p = str(tmp_path / "x")
    df.write.format("xml").option("rowTag", "row").mode("overwrite").save(p)
    back = spark.read.format("xml").option("rowTag", "row").load(p)
    got = {
        r["id"]: sorted((t["k"], t["v"]) for t in r["tags"])
        for r in back.collect()
    }
    assert got == {1: [("a", 1), ("b", 2)], 2: [("c", 3)]}


def test_from_xml_column_parse(spark):
    """from_xml parses an XML-string column against a declared schema
    — the XML twin of the events.props JSON path (same late-binding
    semantics: malformed rows null out, columns prune)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "<p><a>5</a><b>x</b></p>"), (2, "<p><a>7</a><b>y</b></p>"), (3, "not xml")],
        ["id", "payload"],
    )
    parsed = df.select(
        "id", F.from_xml("payload", "a INT, b STRING").alias("p")
    ).select("id", "p.a", "p.b")
    rows = {r["id"]: (r["a"], r["b"]) for r in parsed.collect()}
    assert rows[1] == (5, "x") and rows[2] == (7, "y")
    assert rows[3] == (None, None)


def test_binaryfile_source_reads_opaque_payloads(spark, tmp_path):
    """`binaryFile` is the ingestion ramp for multimodal assets: each
    file becomes (path, modificationTime, length, content binary) —
    the opaque-payload column the decode operators consume. Verify
    content fidelity and glob filtering (only .img files picked up)."""
    payloads = {f"a{i}.img": bytes([i] * (10 + i)) for i in range(4)}
    (tmp_path / "skip.txt").write_bytes(b"not media")
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.img")
        .load(str(tmp_path))
    )
    assert sorted(df.columns) == ["content", "length", "modificationTime", "path"]
    rows = df.collect()
    assert len(rows) == 4
    for r in rows:
        name = r["path"].rsplit("/", 1)[-1]
        assert bytes(r["content"]) == payloads[name]
        assert r["length"] == len(payloads[name])


def test_text_source_wholetext_one_doc_per_file(spark, tmp_path):
    """`text` with wholetext=true: one row per file — the raw-corpus
    ingest shape (one document per file) feeding the curation ops."""
    (tmp_path / "d1.txt").write_text("hello\nworld")
    (tmp_path / "d2.txt").write_text("second doc")
    df = spark.read.text(str(tmp_path), wholetext=True)
    vals = sorted(r["value"] for r in df.collect())
    assert vals == ["hello\nworld", "second doc"]
