"""Tests for sources (S2 Excel bridge, S4 header promotion, S5
pagination), sinks (K3 document write, warehouse lifecycle), and the
embedder contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.sources.ingest import (
    from_header_rows,
    paginated_scan,
)


def test_header_promotion(spark):
    df = from_header_rows(spark, [["A", "b"], ["1", "x"], ["2", "y"]])
    assert df.columns == ["A", "b"]
    assert df.count() == 2
    assert from_header_rows(spark, []).count() == 0
    assert from_header_rows(spark, [["only", "header"]]).count() == 0


def test_paginated_scan(spark):
    pages = {None: ([{"name": "a"}, {"name": "b"}], "p2"), "p2": ([{"name": "c"}], None)}

    def fetch(cursor):
        return pages[cursor]

    df = paginated_scan(spark, fetch, "name string")
    assert sorted(r.name for r in df.collect()) == ["a", "b", "c"]


def test_excel_bridge_roundtrip(spark, tmp_path):
    """S2/K1 bridge round-trip — runs with openpyxl when present, else
    through the minimal OOXML shim (xlsx = zipped XML)."""
    from commercial_rfp_data_pipeline_spark.io import (
        read_excel_bridge,
        write_excel_bridge,
    )

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "Name string, val double")
    path = str(tmp_path / "t.xlsx")
    write_excel_bridge(df, path)
    back = read_excel_bridge(spark, path)
    assert sorted((r.Name, r.val) for r in back.collect()) == [("a", 1.0), ("b", 2.0)]
    # bytes input path (the reference reads BytesIO downloads)
    with open(path, "rb") as f:
        payload = f.read()
    again = read_excel_bridge(spark, payload)
    assert again.count() == 2


def test_xlsx_shim_types_and_blanks(spark, tmp_path):
    """The minimal OOXML shim itself: strings with whitespace, None
    cells, ints and floats survive a write/read cycle regardless of
    openpyxl availability."""
    from commercial_rfp_data_pipeline_spark.io import (
        _read_xlsx_minimal,
        _write_xlsx_minimal,
    )

    path = str(tmp_path / "shim.xlsx")
    _write_xlsx_minimal(
        ["name", "qty", "note"],
        [("a b  c", 2.0, None), ("<x&y>", 1.5, "ok")],
        path,
    )
    header, rows = _read_xlsx_minimal(path)
    assert header == ["name", "qty", "note"]
    assert rows == [["a b  c", 2.0, None], ["<x&y>", 1.5, "ok"]]
    # integral floats come back as int (xlsx numbers are all doubles;
    # matches pandas/openpyxl inference), non-integral stay float
    assert isinstance(rows[0][1], int) and isinstance(rows[1][1], float)


def test_xlsx_shim_bool_and_nan(tmp_path):
    """Bools round-trip as native boolean cells (not the string 'True')
    and float NaN writes as a blank cell — same schema with or without
    openpyxl."""
    from commercial_rfp_data_pipeline_spark.io import (
        _read_xlsx_minimal,
        _write_xlsx_minimal,
    )

    path = str(tmp_path / "shim2.xlsx")
    _write_xlsx_minimal(
        ["flag", "score"],
        [(True, float("nan")), (False, 0.25)],
        path,
    )
    _, rows = _read_xlsx_minimal(path)
    assert rows == [[True, None], [False, 0.25]]
    assert isinstance(rows[0][0], bool) and isinstance(rows[1][0], bool)


def test_salted_join_rejects_dim_replicating_how(spark):
    """Outer joins on the replicated-dim side would emit unmatched dim
    rows once per salt replica — salted_join refuses them."""
    import pytest

    from commercial_rfp_data_pipeline_spark.operators.skew import salted_join

    f = spark.createDataFrame([(1, "x")], "k int, a string")
    d = spark.createDataFrame([(1, "y")], "k int, b string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(f, d, key="k", salt_src="a", how=how)
    # left join of an unmatched fact row stays exactly one null-extended row
    f2 = spark.createDataFrame([(1, "x"), (2, "z")], "k int, a string")
    out = salted_join(f2, d, key="k", salt_src="a", how="left", n_salts=4)
    assert out.count() == 2


def test_document_sink_partitioned(spark, sf_dir, tmp_path):
    from commercial_rfp_data_pipeline_spark.operators.documents import (
        render_documents,
        write_documents,
    )
    from commercial_rfp_data_pipeline_spark.plans.flagship import flagship

    docs = render_documents(flagship(spark, sf_dir), source_file="lib.xlsx")
    out = str(tmp_path / "docs")
    write_documents(docs, out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {"file_name", "source_file", "content", "prefix"} <= set(back.columns)
    row = back.filter(F.col("content").contains("Question:")).first()
    assert row.content.startswith("Source File Name: lib.xlsx")
    assert row.file_name.endswith(".docx")


def test_index_lifecycle(spark, sf_dir, tmp_path):
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        ensure_index,
        reset_and_rebuild,
        search,
    )

    wh = str(tmp_path / "wh")
    chunks_path, emb_path = ensure_index(spark, sf_dir, wh)
    n1 = spark.read.parquet(emb_path).count()
    assert n1 > 0
    # idempotent: second ensure is a no-op (same row count)
    ensure_index(spark, sf_dir, wh)
    assert spark.read.parquet(emb_path).count() == n1
    # reset+rebuild overwrites in place
    reset_and_rebuild(spark, sf_dir, wh)
    assert spark.read.parquet(emb_path).count() == n1
    hits = search(spark, wh, ["spark filter join table", "stream window"], k=3)
    rows = hits.collect()
    assert len(rows) == 6
    assert all(0 <= r.rnk <= 3 for r in rows)


def test_full_pipeline_six_stages(spark, sf_dir, tmp_path):
    """The reference's whole six-stage main (SURVEY.md §3.1) as one
    run: [1] ensure containers -> warehouse dirs; [2] ensure index;
    [3] clean+key (flagship); [4] per-row document library; [5] reset
    and rebuild the index; [6] reconcile two listings into a citation
    map. Each stage's output feeds the next through the warehouse,
    preserving the reference's re-discovery semantics."""
    from pyspark.sql import functions as F

    from commercial_rfp_data_pipeline_spark.operators.documents import (
        docx_name_filter,
        reconcile_listings,
        render_documents,
        write_documents,
    )
    from commercial_rfp_data_pipeline_spark.plans.flagship import flagship
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        ensure_index,
        reset_and_rebuild,
        search,
    )

    wh = str(tmp_path / "warehouse")  # stage 1: container ensure
    _, emb_path = ensure_index(spark, sf_dir, wh)  # stage 2: index DDL
    cleaned = flagship(spark, sf_dir)  # stage 3: clean + key
    docs = render_documents(cleaned, source_file="RFP_content_library.xlsx")
    doc_dir = str(tmp_path / "doclib")
    write_documents(docs, doc_dir)  # stage 4: per-row library
    reset_and_rebuild(spark, sf_dir, wh)  # stage 5: wipe + re-run
    hits = search(spark, wh, ["table join filter"], k=2)
    assert hits.count() == 2
    # stage 6: reconcile the doc library against a stale remote listing
    lib = docx_name_filter(spark.read.parquet(doc_dir).select("file_name"), "file_name")
    remote = lib.limit(3).withColumn(
        "file_name", F.concat(F.lit("stale_"), F.col("file_name"))
    )
    to_upload, to_delete = reconcile_listings(
        lib.withColumnRenamed("file_name", "name"),
        remote.withColumnRenamed("file_name", "name"),
    )
    assert to_upload.count() == lib.count()  # nothing stale matches
    assert to_delete.count() == 3
    mapping = to_upload.select(
        F.col("name").alias("file_name"),
        F.concat(F.lit("https://host/preview/"), F.col("name")).alias("preview_url"),
    )
    assert mapping.count() == cleaned.count()


def test_embedder_expression_vs_pandas_batch(spark, sf_dir):
    """The Catalyst-expression embedder and the Arrow-batched pandas
    embedder implement the same math — vectors must agree."""
    from commercial_rfp_data_pipeline_spark.operators.embedder import (
        HashedBowEmbedder,
        PandasBatchEmbedder,
    )
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import build_chunks

    chunks = build_chunks(spark, sf_dir).limit(100)
    a = HashedBowEmbedder().embed(chunks, "chunk", "chunk_id").collect()
    b = PandasBatchEmbedder().embed(chunks, "chunk", "chunk_id").collect()
    av = {r.chunk_id: r.embedding for r in a}
    bv = {r.chunk_id: r.embedding for r in b}
    assert set(av) == set(bv)
    for cid in av:
        assert av[cid] == pytest.approx(bv[cid], abs=2e-6), cid


def test_approx_distinct_error_bound(spark, sf_dir):
    from commercial_rfp_data_pipeline_spark.queries.advanced_q import (
        q_distinct_approx,
        q_distinct_exact,
    )

    exact = {r.l_returnflag: r.n_parts for r in q_distinct_exact(spark, sf_dir).collect()}
    approx = {
        r.l_returnflag: r.n_parts_approx
        for r in q_distinct_approx(spark, sf_dir).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1, (k, n, approx[k])


def test_render_column_fallbacks(spark):
    """doc_library:90-124 fallback chains: response -> 'fixed answer'
    (label stays 'Response'), key_hash -> first column with the legacy
    RFP_Content_Library_{int(ref)}.docx naming (integral floats coerced
    to int)."""
    import pytest

    from commercial_rfp_data_pipeline_spark.operators.documents import (
        render_documents,
    )
    from commercial_rfp_data_pipeline_spark.validation import MissingColumnError

    # response -> fixed answer, key_hash present
    df = spark.createDataFrame(
        [("7.0", "abc123", "q1", "the answer")],
        ["ref", "key_hash", "question", "fixed answer"],
    )
    row = render_documents(df, source_file="s.xlsx").collect()[0]
    assert row.file_name == "abc123.docx"
    # label mirrors response_col.title() (doc_library:55)
    assert "Fixed Answer: the answer" in row.content

    # no key_hash: legacy first-column naming, integral float -> int
    legacy = spark.createDataFrame(
        [("7.0", "q1", "r1"), ("x9", "q2", "r2")],
        ["ref", "question", "response"],
    )
    names = {
        r.file_name for r in render_documents(legacy, source_file="s.xlsx").collect()
    }
    assert names == {
        "RFP_Content_Library_7.docx",
        "RFP_Content_Library_x9.docx",
    }

    # neither response nor fixed answer -> helpful error
    with pytest.raises(MissingColumnError):
        render_documents(
            spark.createDataFrame([("k", "q")], ["key_hash", "question"]),
            source_file="s.xlsx",
        )


def test_docx_byte_sink(spark, sf_dir, tmp_path):
    """K3 byte parity: write_docx_files emits one real .docx container
    per rendered row from the executors; unzipping word/document.xml
    gives back exactly the rendered lines as paragraphs."""
    import os
    import zipfile
    import xml.etree.ElementTree as ET

    from commercial_rfp_data_pipeline_spark.operators.documents import (
        render_documents,
        write_docx_files,
    )
    from commercial_rfp_data_pipeline_spark.plans.flagship import flagship

    docs = render_documents(flagship(spark, sf_dir), source_file="lib.xlsx")
    out = str(tmp_path / "docx")
    n = write_docx_files(docs, out)
    files = os.listdir(out)
    assert n == docs.count() == len(files)
    assert all(f.endswith(".docx") for f in files)

    sample = docs.limit(1).collect()[0]
    ns = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    with zipfile.ZipFile(os.path.join(out, sample.file_name)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = [
        "".join(t.text or "" for t in p.iter(f"{ns}t"))
        for p in root.iter(f"{ns}p")
    ]
    assert paras == sample.content.split("\n")
    assert paras[0].startswith("Source File Name: ")


def test_k7_upload_transport_seam(spark, sf_dir, tmp_path):
    """K7: the upload sink drives an injected put(name, bytes)
    transport from the executors — here a local writer standing in for
    the reference's Graph PUT — and only the reconciliation's to_upload
    side is pushed."""
    import os

    from commercial_rfp_data_pipeline_spark.operators.documents import (
        reconcile_listings,
        render_documents,
        upload_documents,
    )
    from commercial_rfp_data_pipeline_spark.plans.flagship import flagship

    docs = render_documents(flagship(spark, sf_dir), source_file="lib.xlsx")
    remote = docs.select("file_name").limit(20)  # already uploaded
    to_upload, _ = reconcile_listings(
        docs.select(F.col("file_name").alias("name")),
        remote.withColumnRenamed("file_name", "name"),
    )
    pending = docs.join(
        to_upload.withColumnRenamed("name", "file_name"), "file_name", "left_semi"
    )

    out = str(tmp_path / "uploads")
    os.makedirs(out)

    def put(name: str, payload: bytes) -> None:
        with open(os.path.join(out, name), "wb") as f:
            f.write(payload)

    n = upload_documents(pending, put, render=lambda c: c.encode("utf-8"))
    uploaded = os.listdir(out)
    assert n == docs.count() - 20 == len(uploaded)
    with open(os.path.join(out, uploaded[0])) as f:
        assert f.read().startswith("Source File Name: lib.xlsx")


def test_ivf_index_incremental_append(spark, sf_dir, tmp_path):
    """append_to_ivf_index must make new documents searchable without
    a rebuild: a freshly appended doc whose text equals the query
    string becomes the top hit (cosine ~1), and the centroid table is
    untouched (frozen between deliberate retrains)."""
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        append_to_ivf_index,
        ensure_ivf_index,
        ivf_search_index,
    )

    wh = str(tmp_path / "wh")
    cents_path, cells_path = ensure_ivf_index(spark, sf_dir, wh)
    cents_before = sorted(
        r.cent_id for r in spark.read.parquet(cents_path).select("cent_id").collect()
    )
    n_before = spark.read.parquet(cells_path).count()

    probe_text = "zebra quantum marmalade synchrotron paradox"
    new_docs = spark.createDataFrame(
        [(999999, probe_text)], "doc_id long, text string"
    )
    append_to_ivf_index(spark, wh, new_docs)

    assert spark.read.parquet(cells_path).count() == n_before + 1
    cents_after = sorted(
        r.cent_id for r in spark.read.parquet(cents_path).select("cent_id").collect()
    )
    assert cents_after == cents_before

    hits = ivf_search_index(spark, wh, [probe_text], nprobe=2, k=3).collect()
    top = max(hits, key=lambda r: r.sim)
    assert top.chunk_id.startswith("999999_"), hits
    assert top.sim > 0.999


def test_ivf_index_lifecycle_and_pruned_probe(spark, sf_dir, tmp_path):
    """ensure_ivf_index materializes centroids + cells partitioned by
    cent_id; probing reads only the probed cells (static partition
    pruning) and returns exactly what the from-scratch IVF search
    computes on the same embeddings."""
    from commercial_rfp_data_pipeline_spark.operators.vector import ivf_search
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        HashedBowEmbedder,
        ensure_ivf_index,
        ivf_search_index,
    )

    wh = str(tmp_path / "wh")
    cents_path, cells_path = ensure_ivf_index(spark, sf_dir, wh)
    n_cells = spark.read.parquet(cells_path).count()
    ensure_ivf_index(spark, sf_dir, wh)  # idempotent
    assert spark.read.parquet(cells_path).count() == n_cells

    queries = ["spark filter join table", "stream window count"]
    hits = ivf_search_index(spark, wh, queries, nprobe=2, k=3)
    rows = hits.collect()
    assert len(rows) == 6

    # partition pruning: the cells scan carries a cent_id partition filter
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cent_id" in plan.split("PartitionFilters", 1)[1][:120]

    # equivalence with the from-scratch search over the same embeddings
    emb = spark.read.parquet(f"{wh}/embeddings")
    qdf = spark.createDataFrame(
        [(f"q{i}", t) for i, t in enumerate(queries)], "q_id string, qtext string"
    )
    from pyspark.sql import functions as F

    qvec = (
        HashedBowEmbedder()
        .embed(qdf, text_col="qtext", id_col="q_id")
        .select("q_id", F.col("embedding").alias("q_vec"))
    )
    direct = ivf_search(
        emb, qvec, nprobe=2, k=3, id_col="chunk_id", vec_col="embedding"
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, direct.collect()))


def test_partitioned_fetch_distributes_specs(spark):
    """S5 scale form: each partition spec is fetched executor-side and
    the union of all partitions comes back as one DataFrame."""
    from commercial_rfp_data_pipeline_spark.sources.ingest import partitioned_fetch

    specs = [{"shard": s} for s in range(5)]

    def fetch(spec):
        return [
            {"shard": spec["shard"], "item": f"{spec['shard']}-{i}"} for i in range(3)
        ]

    df = partitioned_fetch(spark, specs, fetch, "shard long, item string")
    rows = df.collect()
    assert len(rows) == 15
    assert {r.item for r in rows} == {f"{s}-{i}" for s in range(5) for i in range(3)}


def test_upsert_table_merge_semantics(spark, tmp_path):
    """Keyed MERGE: updated keys replaced, new keys appended, untouched
    rows preserved; first call on an empty path just writes."""
    from commercial_rfp_data_pipeline_spark.io import upsert_table

    path = str(tmp_path / "store")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    upsert_table(spark, path, base, ["k"])
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    upsert_table(spark, path, updates, ["k"])
    got = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        3: ("c", 30.0),
        4: ("d", 40.0),
    }


def test_compact_table_reduces_file_count(spark, tmp_path):
    """Compaction rewrites a many-small-files table into the computed
    target count and preserves every row."""
    import glob

    from commercial_rfp_data_pipeline_spark.io import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(0, 10000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.mode("overwrite").parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 32
    n = compact_table(spark, path, target_file_bytes=1 << 30)
    after = len(glob.glob(path + "/*.parquet"))
    assert n == 1 and after == 1
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg({"v": "sum"}).collect()[0][0] == 10000 * 9999


def test_merge_agg_state_incremental_equals_recompute(spark, tmp_path):
    """Folding batches into the persisted aggregate state one at a
    time must equal a full recompute over all facts — the mergeable-
    state contract (count partials merge by sum; min/max idempotent) —
    and avg must be derivable at read time."""
    from pyspark.sql import functions as F

    from commercial_rfp_data_pipeline_spark.io import merge_agg_state

    path = str(tmp_path / "state")
    measures = {
        "n": ("count", ""),
        "total": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 2)], ["k", "v"]
    )
    b2 = spark.createDataFrame(
        [("a", 3), ("c", 7), ("b", -1), ("b", 10)], ["k", "v"]
    )
    merge_agg_state(spark, path, b1, ["k"], measures)
    state = merge_agg_state(spark, path, b2, ["k"], measures)
    full = (
        b1.unionByName(b2)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )
    got = {r.k: (r.n, r.total, r.lo, r.hi) for r in state.collect()}
    want = {r.k: (r.n, r.total, r.lo, r.hi) for r in full.collect()}
    assert got == want
    avg = {
        r.k: r.avg
        for r in state.select(
            "k", (F.col("total") / F.col("n")).alias("avg")
        ).collect()
    }
    assert avg["a"] == 3.0 and avg["b"] == 11 / 3

    import pytest

    with pytest.raises(ValueError, match="not mergeable"):
        merge_agg_state(spark, path, b1, ["k"], {"a": ("avg", "v")})


def test_compact_partitioned_table_preserves_layout(spark, tmp_path):
    """Partition dirs must survive compaction (pruning intact), rows
    must be identical, file counts must drop, and a second run must be
    a no-op (idempotent maintenance job)."""
    from pyspark.sql import functions as F

    from commercial_rfp_data_pipeline_spark.io import compact_partitioned_table

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("v")
    )
    # 16 tiny files per partition
    df.repartition(16).write.partitionBy("p").mode("overwrite").parquet(path)
    import glob

    before = len(glob.glob(f"{path}/p=*/*.parquet"))
    done = compact_partitioned_table(spark, path)
    after = len(glob.glob(f"{path}/p=*/*.parquet"))
    assert set(done) == {"p=0", "p=1", "p=2"}
    assert after == 3 < before
    back = spark.read.parquet(path)
    assert back.groupBy("p").count().count() == 3
    assert back.agg(F.sum("v")).first()[0] == sum(range(2000))
    assert compact_partitioned_table(spark, path) == {}


def test_write_audit_publish_blocks_bad_batches(spark, tmp_path):
    """WAP contract: a clean batch publishes atomically; a batch that
    violates a constraint raises, leaves the published table at the
    LAST GOOD version, and keeps staging for inspection."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from commercial_rfp_data_pipeline_spark.io import (
        AuditFailure,
        publish_audited,
    )

    path = str(tmp_path / "t")
    rules = {
        "qty_positive": lambda df: df.filter(F.col("v") <= 0).count(),
        "key_unique": lambda df: df.groupBy("k")
        .count()
        .filter("count > 1")
        .count(),
    }
    good = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    assert publish_audited(spark, path, good, rules) == {
        "qty_positive": 0,
        "key_unique": 0,
    }
    bad = spark.createDataFrame([("a", 1), ("a", -5)], ["k", "v"])
    with pytest.raises(AuditFailure) as e:
        publish_audited(spark, path, bad, rules)
    assert e.value.violations == {"qty_positive": 1, "key_unique": 1}
    # last good version still published; staging kept for debugging
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {
        ("a", 1),
        ("b", 2),
    }
    assert os.path.exists(e.value.staging)


def test_csv_corpus_quarantine_and_roundtrip(spark, tmp_path):
    """Well-formed CSV rows (including quoted embedded newlines) parse
    to typed columns; a malformed row lands in _corrupt_record instead
    of failing the read."""
    from commercial_rfp_data_pipeline_spark.sources.ingest import read_csv_corpus

    p = tmp_path / "docs.csv"
    p.write_text(
        'doc_id,text,lang,source\n'
        '1,"hello world",en,web\n'
        '2,"multi\nline text",en,book\n'
        'not_a_number,"bad row",en,web\n'
    )
    df = read_csv_corpus(spark, str(p))
    # Spark disallows queries touching ONLY the corrupt-record column
    # of a raw CSV scan — materialize full rows first (the documented
    # pattern; a real pipeline writes good/bad to separate sinks)
    all_rows = df.collect()
    rows = {
        r.doc_id: r.text for r in all_rows if r._corrupt_record is None
    }
    bad = [r for r in all_rows if r._corrupt_record is not None]
    assert rows == {1: "hello world", 2: "multi\nline text"}
    assert len(bad) == 1
    assert "not_a_number" in bad[0]._corrupt_record


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trip preserves rows and the read-back supports
    predicate pushdown (PushedFilters in the scan plan)."""
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.sources.ingest import (
        read_orc,
        save_orc,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = str(tmp_path / "li_orc")
    save_orc(li, path)
    back = read_orc(spark, path)
    assert back.count() == li.count()
    filtered = back.filter("l_partkey = 5")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_partkey" in plan
    assert filtered.count() == li.filter("l_partkey = 5").count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """A table whose later batches added a column must read back whole
    with mergeSchema: old rows surface NULL for the new column, and
    the reader never drops either side's columns — the schema-drift
    posture a long-lived ingest pipeline needs."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], ["id", "x"]).write.mode(
        "overwrite"
    ).parquet(path + "/batch=1")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "x", "score"]).write.mode(
        "overwrite"
    ).parquet(path + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "x", "score", "batch"}
    rows = {r.id: (r.x, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    # without mergeSchema the union schema is NOT guaranteed — the
    # option is the contract, not a default to rely on
    assert df.filter(F.col("score").isNull()).count() == 1


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    """Stream-static left join == the same join in batch: every event
    enriched with its user's first-signup cohort from a static
    snapshot; users without a signup keep null cohort."""
    from pyspark.sql import functions as F
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        enrich_with_static,
        read_events_stream,
        run_to_completion,
    )

    batch = load_table(spark, sf_dir, "events")
    dim = (
        batch.filter(
            (F.col("event_type") == "signup") & (F.col("user_id") % 2 == 0)
        )
        .groupBy("user_id")
        .agg(F.date_format(F.min("ts"), "yyyy-MM").alias("cohort"))
    )
    stream = read_events_stream(spark, sf_dir)
    got = run_to_completion(
        enrich_with_static(
            stream.select("event_id", "user_id"), dim
        ),
        "t_enrich",
        mode="append",
    )
    want = enrich_with_static(batch.select("event_id", "user_id"), dim)
    g = {(r.event_id, r.cohort) for r in got.collect()}
    w = {(r.event_id, r.cohort) for r in want.collect()}
    assert g == w and len(g) == batch.count()
    assert any(c is None for _, c in g)  # off-dim users survive (left)
    assert any(c is not None for _, c in g)


def test_time_travel_versions_commit_read_expire(spark, tmp_path):
    """Snapshot versioning on plain parquet: commits are immutable,
    time travel reads exact old snapshots, the pointer flips
    atomically, and expiry never drops the referenced version."""
    from commercial_rfp_data_pipeline_spark.io import (
        commit_version,
        expire_versions,
        read_version,
    )

    td = str(tmp_path / "versioned")
    v1 = commit_version(spark, td, spark.range(0, 10))
    v2 = commit_version(spark, td, spark.range(0, 20))
    v3 = commit_version(spark, td, spark.range(0, 5))
    assert (v1, v2, v3) == (1, 2, 3)
    assert read_version(spark, td).count() == 5          # latest
    assert read_version(spark, td, 1).count() == 10      # time travel
    assert read_version(spark, td, 2).count() == 20
    dropped = expire_versions(td, keep_last=2)
    assert dropped == [1]
    assert read_version(spark, td).count() == 5
    assert read_version(spark, td, 2).count() == 20      # kept
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_version(spark, td, 1).count()               # expired


def test_stream_stream_left_outer_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join == the batch left
    join on finite replay: matched pairs agree AND clicks with no
    in-window partner surface exactly once with null partner columns
    (the watermark-gated outer emission)."""
    from pyspark.sql import functions as F
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
        stream_click_pairs,
    )

    s1 = read_events_stream(spark, sf_dir)
    s2 = read_events_stream(spark, sf_dir)
    got_rows = run_to_completion(
        stream_click_pairs(s1, s2, how="left_outer"), "t_ss_outer", mode="append"
    ).collect()
    got = {(r.user_id, r.id_a, r.id_b) for r in got_rows}

    ev = load_table(spark, sf_dir, "events")
    # batch mirror: same projection + join condition, plain left join
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a")
    )
    right = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("id_b"),
        F.col("ts").alias("ts_b"),
    )
    want_rows = left.join(
        right,
        F.expr(
            "user_id = user_id_b AND id_a < id_b "
            "AND ts_b >= ts_a AND ts_b <= ts_a + interval 3600 seconds"
        ),
        "left_outer",
    ).select("user_id", "id_a", "id_b")
    want = {(r.user_id, r.id_a, r.id_b) for r in want_rows.collect()}
    got_matched = {t for t in got if t[2] is not None}
    want_matched = {t for t in want if t[2] is not None}
    assert got_matched == want_matched  # inner results identical
    got_null = {t for t in got if t[2] is None}
    want_null = {t for t in want if t[2] is None}
    # outer emissions are watermark-gated: a left row is null-extended
    # only once the watermark PROVES no match can arrive, and on finite
    # replay the watermark never passes the stream's tail — so the
    # streamed unmatched set is a subset of the batch one, never a
    # superset, and must be substantial
    assert got_null <= want_null
    assert len(got_null) > 0.5 * len(want_null), (len(got_null), len(want_null))


def test_rest_pages_python_datasource(spark):
    """S5 as a first-class Spark 4 Python Data Source: registers under
    format('rest_pages'), plans one input partition per shard, each
    task walks its own cursor chain, and the union over shards is
    exactly the full item set (no dupes, no gaps) with deterministic
    md5-derived attributes."""
    import hashlib

    from commercial_rfp_data_pipeline_spark.sources.rest_datasource import (
        RestPagesDataSource,
    )

    spark.dataSource.register(RestPagesDataSource)
    df = (
        spark.read.format("rest_pages")
        .option("n_shards", "5")
        .option("n_items", "103")   # deliberately not divisible
        .option("page_size", "7")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert sorted(r.item_id for r in rows) == list(range(103))
    by_id = {r.item_id: r for r in rows}
    for i in (0, 42, 102):
        assert by_id[i].shard_id == i % 5
        assert (
            by_id[i].name
            == "item_" + hashlib.md5(f"rest:{i}".encode()).hexdigest()[:12]
        )
    # the scan composes with the relational plan like any other source
    agg = df.groupBy("shard_id").count().collect()
    assert {r.shard_id: r["count"] for r in agg} == {
        s: len([i for i in range(103) if i % 5 == s]) for s in range(5)
    }


def test_rest_pages_streaming_source_drains_feed_exactly_once(spark):
    """The streaming form of the REST source: offsets advance as the
    feed grows, each micro-batch is range-sharded across executor
    partitions, and draining the stream yields every item exactly once
    with values identical to the batch reader's."""
    from commercial_rfp_data_pipeline_spark.sources.rest_datasource import (
        RestPagesDataSource,
    )

    spark.dataSource.register(RestPagesDataSource)
    stream = (
        spark.readStream.format("rest_pages")
        .option("n_shards", "4")
        .option("n_items", "60")
        .option("batch_items", "25")   # 3 polls: 25, 50, 60
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_rest_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t_rest_stream").collect()
    assert sorted(r.item_id for r in rows) == list(range(60))
    # values match the batch reader byte-for-byte
    batch = (
        spark.read.format("rest_pages")
        .option("n_shards", "4")
        .option("n_items", "60")
        .load()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch.collect()))


def test_rest_upload_python_datasource_writer(spark, tmp_path):
    """K7 as a first-class Python Data Source WRITER: executors PUT
    their partitions, the driver commits a job-level manifest listing
    every uploaded file — written only after all tasks succeed."""
    import json
    import os

    from commercial_rfp_data_pipeline_spark.sources.rest_datasource import (
        RestUploadDataSource,
    )

    spark.dataSource.register(RestUploadDataSource)
    dest = str(tmp_path / "uploads")
    df = spark.createDataFrame(
        [(f"doc_{i}.docx", f"payload {i}".encode()) for i in range(7)],
        "filename string, payload binary",
    ).repartition(3)
    (
        df.write.format("rest_upload")
        .option("path", dest)
        .mode("append")
        .save()
    )
    files = sorted(os.listdir(dest))
    assert [f for f in files if f.endswith(".docx")] == [
        f"doc_{i}.docx" for i in range(7)
    ]
    with open(os.path.join(dest, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 7
    assert manifest["files"] == [f"doc_{i}.docx" for i in range(7)]
    with open(os.path.join(dest, "doc_3.docx"), "rb") as f:
        assert f.read() == b"payload 3"


def test_session_store_merges_across_batches_and_topk(spark, tmp_path):
    """Session windows MERGE across micro-batches: drain 1 sees user
    u1 at 10:00 and 10:40 (two separate 30-min-gap open sessions);
    drain 2 adds a bridging 10:20 event, fusing them IN STATE, plus
    far-future flush events that advance the watermark past every real
    session. Append mode must emit exactly ONE merged u1 session (the
    constituents were never emitted — that is the point of the
    append-only restriction), the flush sessions themselves must stay
    unemitted (still open), and the store top-k must equal the batch
    sessionization of the real events."""
    import datetime as dt

    from commercial_rfp_data_pipeline_spark.streaming.sinks import (
        session_store_sink,
        session_topk,
    )
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        session_counts,
    )

    src = str(tmp_path / "events_src")
    store = str(tmp_path / "session_store")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, user_id long"

    def emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = session_store_sink(
            session_counts(stream, gap="30 minutes"), store, ckpt
        )
        q.awaitTermination(120)

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # drain 1: u1 splits into two OPEN sessions; u2 one busy session.
    # watermark (max_ts - 1h) is below every session end -> no emission
    emit([(ts(0), 1), (ts(40), 1), (ts(0), 2), (ts(1), 2), (ts(2), 2)])
    drain()
    # drain 2: bridge event merges u1's sessions in state; flush events
    # 4h later close every real session
    emit([(ts(20), 1), (ts(240), 999)])
    drain()
    got_all = spark.read.parquet(store)
    u1 = [
        (r.session_start, r.session_end, r.n_events)
        for r in got_all.filter("user_id = 1").collect()
    ]
    assert u1 == [(ts(0), ts(70), 3)], u1  # ONE merged session, never two
    assert got_all.filter("user_id = 999").count() == 0  # flush stays open
    # store top-k == batch sessionization of the real events
    allev = spark.read.parquet(src).filter("user_id <> 999")
    want = {
        tuple(r)
        for r in allev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
        .orderBy(F.col("n_events").desc(), "user_id", "session_start")
        .limit(2)
        .collect()
    }
    got = {tuple(r) for r in session_topk(spark, store, k=2).collect()}
    assert got == want and len(got) == 2


def test_session_topk_update_mode_merge_and_batch_parity(spark, tmp_path):
    """UPDATE-mode session top-k (the shape in-plan streaming session
    aggregation cannot express — it is APPEND-only). Three properties:

    1. UPDATE EMISSION: after drain 1, the snapshot already shows u2's
       OPEN session (n=3) — append mode would have emitted nothing.
    2. CROSS-BATCH MERGE: drain 2's bridging 10:20 event fuses u1's
       two drain-1 sessions into ONE row with the summed count, and
       u2's 10:03 event UPDATES its open session to n=4 (the same row
       re-emitted with a new value — the definition of update mode).
    3. BATCH PARITY: the final snapshot equals batch
       F.session_window sessionization of all real events, top-k under
       the same (n DESC, user, start) order — including sessions the
       far-future flush event EVICTED into the closed top-k (rolling,
       k-bounded, exact because closed sessions are immutable)."""
    import datetime as dt

    from commercial_rfp_data_pipeline_spark.streaming.sinks import (
        session_topk_update_sink,
        session_update_topk_latest,
    )

    src = str(tmp_path / "events_src")
    root = str(tmp_path / "session_update")
    ckpt = str(tmp_path / "ckpt_upd")
    schema = "ts timestamp, user_id long"

    def emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = session_topk_update_sink(
            stream, root, ckpt, gap_minutes=30, k=3, evict_delay_minutes=60
        )
        q.awaitTermination(120)

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # drain 1: u1 at 10:00 and 10:40 (two separate 30-min-gap
    # sessions); u2 at 10:00/10:01/10:02 (one open session, n=3)
    emit([(ts(0), 1), (ts(40), 1), (ts(0), 2), (ts(1), 2), (ts(2), 2)])
    drain()
    snap1 = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_update_topk_latest(spark, root).collect()
    }
    # update emission: the OPEN u2 session is already visible at n=3
    assert (2, ts(0), ts(32), 3) in snap1, snap1
    assert {(r[0], r[3]) for r in snap1} == {(2, 3), (1, 1)}, snap1

    # drain 2: bridge u1's sessions, grow u2's session, then a
    # far-future event that evicts every real session into closed state
    emit([(ts(20), 1), (ts(3), 2), (ts(240), 999)])
    drain()
    snap2 = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_update_topk_latest(spark, root).collect()
    }
    # cross-batch merge: ONE u1 row 10:00-11:10 with the summed count
    assert (1, ts(0), ts(70), 3) in snap2, snap2
    # update of an open session: u2 re-emitted at n=4
    assert (2, ts(0), ts(33), 4) in snap2, snap2

    # batch parity over the real events (the flush event is top-3 too
    # at n=1, but ties order by user_id so it falls outside k=3 only
    # if real sessions fill the snapshot — compare the full snapshot)
    allev = spark.read.parquet(src)
    want = {
        tuple(r)
        for r in allev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy(F.col("n_events").desc(), "user_id", "session_start")
        .limit(3)
        .collect()
    }
    assert snap2 == want, (snap2, want)

    # state is bounded: only the last two batch dirs survive per
    # bookkeeping dir, and LATEST names the newest snapshot
    import os as _os

    for sub in ("state", "closedtopk", "out"):
        ids = sorted(
            int(d.split("=", 1)[1])
            for d in _os.listdir(_os.path.join(root, sub))
            if d.startswith("batch_id=")
        )
        assert len(ids) <= 2, (sub, ids)
    assert _os.path.exists(_os.path.join(root, "LATEST"))


def test_session_update_sink_fresh_checkpoint_restart(spark, tmp_path):
    """ADVICE-r5: restarting the sink with a FRESH checkpoint over the
    same root_path resets batch ids to 0 — the LATEST pointer must then
    serve the NEW run's snapshot, not a stale higher-numbered directory
    left by the first run."""
    import datetime as dt

    from commercial_rfp_data_pipeline_spark.streaming.sinks import (
        session_topk_update_sink,
        session_update_topk_latest,
    )

    schema = "ts timestamp, user_id long"
    root = str(tmp_path / "root")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def run(src, ckpt, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = session_topk_update_sink(
            stream, root, ckpt, gap_minutes=30, k=3, evict_delay_minutes=60
        )
        q.awaitTermination(120)

    # run 1: two drains so the old run's ids reach batch_id=1
    src1, ckpt1 = str(tmp_path / "src1"), str(tmp_path / "ck1")
    run(src1, ckpt1, [(t0, 1), (t0 + dt.timedelta(minutes=1), 1)])
    run(src1, ckpt1, [(t0 + dt.timedelta(minutes=2), 1)])
    old = {
        (r.user_id, r.n_events)
        for r in session_update_topk_latest(spark, root).collect()
    }
    assert old == {(1, 3)}, old

    # run 2: fresh checkpoint + fresh source, SAME root — ids restart
    # at 0, which is lower than run 1's latest
    src2, ckpt2 = str(tmp_path / "src2"), str(tmp_path / "ck2")
    run(src2, ckpt2, [(t0, 7)])
    got = {
        (r.user_id, r.n_events)
        for r in session_update_topk_latest(spark, root).collect()
    }
    assert got == {(7, 1)}, got


def test_graph_index_lifecycle_and_pruned_hops(spark, sf_dir, tmp_path):
    """ensure_graph_index materializes the m-NN graph partitioned by
    src_bucket; searching it returns exactly what the in-memory beam
    search computes over the same vectors, and each hop's adjacency
    scan carries a src_bucket partition filter (the graph is fetched
    bucket-by-bucket, never loaded whole)."""
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        graph_beam_search,
        knn_graph,
    )
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        ensure_graph_index,
        graph_search_index,
    )

    wh = str(tmp_path / "wh")
    path = ensure_graph_index(spark, sf_dir, wh, m=8)
    n_edges = spark.read.parquet(path).count()
    ensure_graph_index(spark, sf_dir, wh, m=8)  # idempotent
    assert spark.read.parquet(path).count() == n_edges

    hits = graph_search_index(spark, sf_dir, wh, k=5, ef=16, rounds=4)
    got = {(r.q_id, r.vec_id, r.sim, r.rnk) for r in hits.collect()}

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    qd = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    mem = graph_beam_search(
        emb, knn_graph(emb, m=8), qd, k=5, ef=16, rounds=4
    )
    want = {(r.q_id, r.vec_id, r.sim, r.rnk) for r in mem.collect()}
    assert got == want and len(got) == 25

    # hop reads are bucket-pruned: re-run one hop's read shape
    probe = spark.read.parquet(path).filter(F.col("src_bucket").isin([0, 3]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "src_bucket" in plan.split("PartitionFilters", 1)[1][:160]


def test_cdc_upsert_sink_replay_and_time_travel(spark, tmp_path):
    """CDC apply with exactly-once semantics: batch 1 inserts three
    keys; a crash is injected AFTER the sink write but BEFORE the
    checkpoint commit, so the restarted stream REPLAYS batch 1 — the
    idempotent batch-dir overwrite must leave no duplicates. Batch 2
    then updates one key and deletes another; the compacted view must
    show exactly the surviving state, and as_of_batch=0 must time-travel
    back to the pre-update table."""
    from commercial_rfp_data_pipeline_spark.streaming.sinks import (
        cdc_upsert_sink,
        read_cdc_store,
    )

    src = str(tmp_path / "changes")
    store = str(tmp_path / "cdc_store")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, op string, val string, _seq long"

    def emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain(fail_once=False):
        crashed = {"did": False}

        def boom(batch_id):
            if fail_once and not crashed["did"]:
                crashed["did"] = True
                raise RuntimeError("injected crash before checkpoint commit")

        stream = spark.readStream.schema(schema).parquet(src)
        q = cdc_upsert_sink(stream, store, ckpt, on_batch_written=boom)
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # the injected crash surfaces here; restart resumes
        return crashed["did"]

    emit([(1, "I", "a", 1), (2, "I", "b", 2), (3, "I", "c", 3)])
    assert drain(fail_once=True)  # crash after write, before commit
    drain()  # replay: same batch rewrites its own directory
    cur = {(r.id, r.val) for r in read_cdc_store(spark, store).collect()}
    assert cur == {(1, "a"), (2, "b"), (3, "c")}, cur

    emit([(2, "U", "b2", 4), (3, "D", None, 5)])
    drain()
    cur = {(r.id, r.val) for r in read_cdc_store(spark, store).collect()}
    assert cur == {(1, "a"), (2, "b2")}, cur
    # time travel: before batch 1 of changes, the original table stands
    old = {(r.id, r.val)
           for r in read_cdc_store(spark, store, as_of_batch=0).collect()}
    assert old == {(1, "a"), (2, "b"), (3, "c")}, old


def test_watermark_drops_late_rows_with_metric_evidence(spark, tmp_path):
    """Watermark semantics, measured not assumed: after the first
    drain advances the watermark to 13:00, a 10:30 straggler in the
    second drain must be DROPPED — the finalized 10:00 window keeps
    count 1, and the query progress reports exactly one
    numRowsDroppedByWatermark. This is the bounded-state guarantee
    that lets a 100-TB stream's aggregation state stay finite."""
    import datetime as dt

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, user_id long"
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .count()
            .select(F.col("w.start").alias("w"), "count")
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q.lastProgress

    emit([(t0, 1), (t0 + dt.timedelta(hours=4), 1)])
    drain()  # watermark advances to 13:00; 10:00 window finalizes
    emit([(t0 + dt.timedelta(minutes=30), 1)])  # late by 2.5 hours
    p2 = drain()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0) for so in p2["stateOperators"]
    )
    assert dropped == 1, p2["stateOperators"]
    got = {(r.w, r["count"]) for r in spark.read.parquet(out).collect()}
    assert (t0, 1) in got, got  # on-time count only — straggler excluded
    assert (t0, 2) not in got


def test_bm25_index_incremental_append_equals_rebuild(spark, sf_dir, tmp_path):
    """The BM25 lifecycle invariant: build on 80% of the corpus, append
    the other 20%, and the index state must equal a from-scratch build
    over the union — df counts identical, stats identical, and search
    scores for a probe query identical to 6dp. This is what makes
    incremental maintenance safe to run forever: every table is a sum
    of per-batch contributions, so appends cannot drift."""
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        append_to_bm25_index,
        bm25_search_index,
        bm25_tables,
        ensure_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") % 5 != 0)
    rest = docs.filter(F.col("doc_id") % 5 == 0)

    inc_wh = str(tmp_path / "wh_inc")
    full_wh = str(tmp_path / "wh_full")
    ensure_bm25_index(spark, first, inc_wh)
    append_to_bm25_index(spark, inc_wh, rest)
    ensure_bm25_index(spark, docs, full_wh)

    inc_tbls = dict(zip(("tf", "dl", "df", "stats"), bm25_tables(spark, inc_wh)))
    full_tbls = dict(
        zip(("tf", "dl", "df", "stats"), bm25_tables(spark, full_wh))
    )
    for tbl in ("df", "stats"):
        a = {tuple(r) for r in inc_tbls[tbl].collect()}
        b = {tuple(r) for r in full_tbls[tbl].collect()}
        assert a == b, f"{tbl} diverged after append"

    # probe with the corpus's most frequent terms
    terms = [
        r.tok
        for r in full_tbls["df"].orderBy(F.col("df").desc(), "tok")
        .limit(5)
        .collect()
    ]
    got = {
        (r.chunk_id, r.bm25)
        for r in bm25_search_index(spark, inc_wh, terms, k=5).collect()
    }
    want = {
        (r.chunk_id, r.bm25)
        for r in bm25_search_index(spark, full_wh, terms, k=5).collect()
    }
    assert got == want and len(got) == 5, (got, want)


def test_bm25_append_idempotent_and_crash_safe(spark, sf_dir, tmp_path):
    """The ADVICE-r5 atomicity contract: (a) replaying the SAME append
    batch is a no-op (content-derived batch key already in the
    manifest) — postings, df, and stats are unchanged; (b) a crash
    BEFORE the manifest commit leaves the staged dirs invisible —
    readers see exactly the pre-append state, and the retried append
    repairs and commits."""
    import json
    import os

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        append_to_bm25_index,
        bm25_tables,
        ensure_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") % 5 != 0)
    rest = docs.filter(F.col("doc_id") % 5 == 0)
    wh = str(tmp_path / "wh")
    root = os.path.join(wh, "bm25")
    ensure_bm25_index(spark, first, wh)

    def state():
        tf, dl, df, stats = bm25_tables(spark, wh)
        return (
            {tuple(r) for r in df.collect()},
            {tuple(r) for r in stats.collect()},
            tf.count(),
            dl.count(),
        )

    append_to_bm25_index(spark, wh, rest)
    once = state()
    manifest_once = json.load(open(os.path.join(root, "MANIFEST.json")))
    # (a) replay the exact same batch — must be a committed-state no-op
    append_to_bm25_index(spark, wh, rest)
    assert state() == once
    assert json.load(open(os.path.join(root, "MANIFEST.json"))) == manifest_once

    # (b) simulate a crash before commit: stage a new batch's dirs by
    # hand (what a crashed append leaves behind) and check readers
    # ignore them entirely
    extra = docs.filter(F.col("doc_id") % 5 == 1).limit(3)
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        _bm25_batch_tables,
    )
    from commercial_rfp_data_pipeline_spark.operators.chunking import chunk_text

    tf_o, dl_o, _ = _bm25_batch_tables(chunk_text(extra, size=2000, overlap=500))
    tf_o.write.mode("overwrite").parquet(os.path.join(root, "tf", "orphan"))
    dl_o.write.mode("overwrite").parquet(os.path.join(root, "dl", "orphan"))
    assert state() == once, "orphan staged dirs leaked into reads"


def test_streaming_index_ingest_replay_and_rebuild_equivalence(
    spark, sf_dir, tmp_path
):
    """Round-7 composition: streaming ingest (foreachBatch) -> durable
    BM25 + IVF indexes, with at-least-once failure modes simulated.
    (1) a real readStream drains 3 doc batches into both indexes;
    (2) batch 2 is REPLAYED directly (crash-after-commit delivery) —
    must be a no-op; (3) a crash mid-IVF-append is simulated by
    pre-landing HALF of batch 4's rows, then batch 4 arrives through a
    second stream run — reconciliation must append exactly the
    complement. Final state must equal a FROM-SCRATCH rebuild over all
    ingested docs: BM25 df/stats sets, BM25 search scores, IVF cell
    row-sets, and IVF search results all identical; drift maintenance
    still runs bounded over the streamed layout."""
    import os

    from commercial_rfp_data_pipeline_spark.operators.chunking import (
        chunk_text,
    )
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        ivf_assign,
        ivf_centroids,
    )
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        append_to_bm25_index,
        append_to_ivf_index_reconciled,
        bm25_search_index,
        bm25_tables,
        build_embeddings,
        ensure_bm25_index,
        ivf_cell_drift,
        ivf_maintain,
        ivf_search_index,
    )
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.streaming.ingest import (
        index_ingest_sink,
        read_documents_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    streamed = docs.filter(F.col("doc_id") % 5 == 0)
    b = [
        streamed.filter(F.col("doc_id") % 4 == i).coalesce(1)
        for i in range(4)
    ]

    def build_ivf_base(wh, base_docs):
        chunks = chunk_text(base_docs, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
        emb = build_embeddings(chunks)
        cents = ivf_centroids(emb, 16, id_col="chunk_id", vec_col="embedding")
        cents.write.mode("overwrite").parquet(os.path.join(wh, "ivf_centroids"))
        cents = spark.read.parquet(os.path.join(wh, "ivf_centroids"))
        ivf_assign(
            emb, 16, id_col="chunk_id", vec_col="embedding", cents=cents
        ).select("chunk_id", "embedding", "cent_id", "_n").write.mode(
            "overwrite"
        ).partitionBy("cent_id").parquet(os.path.join(wh, "ivf_cells"))

    wh = str(tmp_path / "wh")
    ensure_bm25_index(spark, base, wh)
    build_ivf_base(wh, base)

    # stage the first 3 batches as single-file micro-batches
    docs_dir = tmp_path / "doc_batches"
    docs_dir.mkdir()
    for i in range(3):
        b[i].toPandas().to_parquet(docs_dir / f"b{i}.parquet", index=False)
    cp = str(tmp_path / "cp")
    q = index_ingest_sink(
        read_documents_stream(spark, str(docs_dir)), spark, wh, cp
    )
    q.awaitTermination(300)

    # (2) at-least-once replay of an already-committed batch: no-op
    cells_before = {
        (r.chunk_id, r.cent_id)
        for r in spark.read.parquet(os.path.join(wh, "ivf_cells"))
        .select("chunk_id", "cent_id")
        .collect()
    }
    append_to_bm25_index(spark, wh, b[1])
    assert append_to_ivf_index_reconciled(spark, wh, b[1]) == 0
    cells_after = {
        (r.chunk_id, r.cent_id)
        for r in spark.read.parquet(os.path.join(wh, "ivf_cells"))
        .select("chunk_id", "cent_id")
        .collect()
    }
    assert cells_after == cells_before

    # (3) crash mid-IVF-append: half of batch 4 already landed
    cents = spark.read.parquet(os.path.join(wh, "ivf_centroids"))
    b4_chunks = chunk_text(b[3], size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
    b4_assigned = ivf_assign(
        build_embeddings(b4_chunks),
        id_col="chunk_id",
        vec_col="embedding",
        cents=cents,
    ).select("chunk_id", "embedding", "cent_id", "_n")
    b4_assigned.filter(F.xxhash64("chunk_id") % 2 == 0).write.mode(
        "append"
    ).partitionBy("cent_id").parquet(os.path.join(wh, "ivf_cells"))
    b[3].toPandas().to_parquet(docs_dir / "b3.parquet", index=False)
    q2 = index_ingest_sink(
        read_documents_stream(spark, str(docs_dir)), spark, wh, cp
    )
    q2.awaitTermination(300)

    # no duplicate chunk rows despite the partial pre-landing
    final_cells = spark.read.parquet(os.path.join(wh, "ivf_cells"))
    assert final_cells.count() == final_cells.select("chunk_id").distinct().count()

    # from-scratch rebuild over the union (same frozen centroids)
    wh2 = str(tmp_path / "wh2")
    ensure_bm25_index(spark, docs, wh2)
    build_ivf_base(wh2, base)
    union_chunks = chunk_text(streamed, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
    cents2 = spark.read.parquet(os.path.join(wh2, "ivf_centroids"))
    ivf_assign(
        build_embeddings(union_chunks),
        id_col="chunk_id",
        vec_col="embedding",
        cents=cents2,
    ).select("chunk_id", "embedding", "cent_id", "_n").write.mode(
        "append"
    ).partitionBy("cent_id").parquet(os.path.join(wh2, "ivf_cells"))

    _, _, df1, stats1 = bm25_tables(spark, wh)
    _, _, df2, stats2 = bm25_tables(spark, wh2)
    assert {tuple(r) for r in df1.collect()} == {tuple(r) for r in df2.collect()}
    assert {tuple(r) for r in stats1.collect()} == {
        tuple(r) for r in stats2.collect()
    }
    terms = ["table", "spark", "window"]
    s1 = {tuple(r) for r in bm25_search_index(spark, wh, terms).collect()}
    s2 = {tuple(r) for r in bm25_search_index(spark, wh2, terms).collect()}
    assert s1 == s2

    got_cells = {
        (r.chunk_id, r.cent_id)
        for r in final_cells.select("chunk_id", "cent_id").collect()
    }
    want_cells = {
        (r.chunk_id, r.cent_id)
        for r in spark.read.parquet(os.path.join(wh2, "ivf_cells"))
        .select("chunk_id", "cent_id")
        .collect()
    }
    assert got_cells == want_cells
    qtexts = ["fast table scan", "window aggregate join"]
    v1 = {tuple(r) for r in ivf_search_index(spark, wh, qtexts).collect()}
    v2 = {tuple(r) for r in ivf_search_index(spark, wh2, qtexts).collect()}
    assert v1 == v2

    # drift maintenance still composes: bounded, count-preserving
    n_before = final_cells.count()
    res = ivf_maintain(spark, wh, drift_threshold=0.0)  # force re-Lloyd
    assert 0 < res["n_drifted"] <= 16
    after = spark.read.parquet(os.path.join(wh, "ivf_cells"))
    assert after.count() == n_before
    assert ivf_cell_drift(spark, wh).count() >= 1


def test_index_purge_equals_rebuild(spark, sf_dir, tmp_path):
    """Right-to-be-forgotten reaching the DERIVED artifacts: purging a
    subject's docs from the durable BM25 + IVF indexes must leave
    exactly the state a rebuild WITHOUT those docs produces (same
    frozen centroids), the manifest-committed purge must be
    idempotent, and untouched batch dirs must remain listed
    unchanged."""
    import json
    import os

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.chunking import (
        chunk_text,
    )
    from commercial_rfp_data_pipeline_spark.operators.vector import ivf_assign
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        append_to_bm25_index,
        bm25_search_index,
        bm25_tables,
        build_embeddings,
        ensure_bm25_index,
        ensure_ivf_index,
        ivf_search_index,
        purge_from_indexes,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    purged_ids = [r.doc_id for r in docs.filter(F.col("doc_id") % 10 == 0).collect()]

    wh = str(tmp_path / "wh")
    # two BM25 batches so the purge crosses batch-dir boundaries
    ensure_bm25_index(spark, first, wh)
    append_to_bm25_index(spark, wh, second)
    ensure_ivf_index(spark, sf_dir, wh)
    manifest_before = json.load(
        open(os.path.join(wh, "bm25", "MANIFEST.json"))
    )

    res = purge_from_indexes(spark, wh, purged_ids)
    assert res["bm25_chunks_removed"] > 0
    assert res["ivf_rows_removed"] > 0
    assert 0 < res["cells_rewritten"] <= 16

    # reference: BM25 built without the purged docs; IVF assigned with
    # the SAME frozen centroids
    remaining = docs.filter(~(F.col("doc_id") % 10 == 0))
    wh2 = str(tmp_path / "wh2")
    ensure_bm25_index(spark, remaining, wh2)
    os.makedirs(wh2, exist_ok=True)
    spark.read.parquet(os.path.join(wh, "ivf_centroids")).write.parquet(
        os.path.join(wh2, "ivf_centroids")
    )
    cents2 = spark.read.parquet(os.path.join(wh2, "ivf_centroids"))
    ivf_assign(
        build_embeddings(
            chunk_text(remaining, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
        ),
        id_col="chunk_id",
        vec_col="embedding",
        cents=cents2,
    ).select("chunk_id", "embedding", "cent_id", "_n").write.mode(
        "overwrite"
    ).partitionBy("cent_id").parquet(os.path.join(wh2, "ivf_cells"))

    tf1, dl1, df1, st1 = bm25_tables(spark, wh)
    tf2, dl2, df2, st2 = bm25_tables(spark, wh2)
    assert {tuple(r) for r in tf1.collect()} == {tuple(r) for r in tf2.collect()}
    assert {tuple(r) for r in dl1.collect()} == {tuple(r) for r in dl2.collect()}
    assert {tuple(r) for r in df1.collect()} == {tuple(r) for r in df2.collect()}
    assert {tuple(r) for r in st1.collect()} == {tuple(r) for r in st2.collect()}
    terms = ["table", "spark", "window"]
    assert {tuple(r) for r in bm25_search_index(spark, wh, terms).collect()} == {
        tuple(r) for r in bm25_search_index(spark, wh2, terms).collect()
    }
    got = {
        (r.chunk_id, r.cent_id)
        for r in spark.read.parquet(os.path.join(wh, "ivf_cells"))
        .select("chunk_id", "cent_id")
        .collect()
    }
    want = {
        (r.chunk_id, r.cent_id)
        for r in spark.read.parquet(os.path.join(wh2, "ivf_cells"))
        .select("chunk_id", "cent_id")
        .collect()
    }
    assert got == want
    qtexts = ["fast table scan"]
    assert {
        tuple(r) for r in ivf_search_index(spark, wh, qtexts).collect()
    } == {tuple(r) for r in ivf_search_index(spark, wh2, qtexts).collect()}

    # idempotent: a replayed purge changes nothing
    manifest_once = json.load(open(os.path.join(wh, "bm25", "MANIFEST.json")))
    assert manifest_once != manifest_before
    res2 = purge_from_indexes(spark, wh, purged_ids)
    assert res2 == {
        "bm25_chunks_removed": 0,
        "ivf_rows_removed": 0,
        "cells_rewritten": 0,
    }
    assert (
        json.load(open(os.path.join(wh, "bm25", "MANIFEST.json")))
        == manifest_once
    )


def test_index_purge_fully_purged_cell(spark, sf_dir, tmp_path):
    """ADVICE r7 (high): dynamic partition overwrite only rewrites
    partitions PRESENT in the written data — if every row of an IVF
    cell belongs to purged docs, the purge used to leave that cell's
    partition dir untouched, silently serving the subject's vectors.
    Purge every parent doc of one chosen cell and assert (a) no purged
    chunk remains anywhere in the index, (b) the fully-purged cell's
    partition dir is gone, (c) search never returns a purged chunk."""
    import os

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        ensure_bm25_index,
        ensure_ivf_index,
        ivf_search_index,
        purge_from_indexes,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wh = str(tmp_path / "wh")
    ensure_bm25_index(spark, docs, wh)
    ensure_ivf_index(spark, sf_dir, wh)

    cells_path = os.path.join(wh, "ivf_cells")
    cells = spark.read.parquet(cells_path).withColumn(
        "parent", F.regexp_extract("chunk_id", r"^(.*)_\d+$", 1)
    )
    # the cell with the fewest distinct parent docs — purging all of
    # them guarantees that cell ends up with zero survivors
    victim = (
        cells.groupBy("cent_id")
        .agg(F.countDistinct("parent").alias("n_parents"))
        .orderBy("n_parents", "cent_id")
        .limit(1)
        .collect()[0]
    )
    victim_cell = victim.cent_id
    purged_ids = [
        r.parent
        for r in cells.filter(F.col("cent_id") == victim_cell)
        .select("parent")
        .distinct()
        .collect()
    ]
    assert purged_ids

    res = purge_from_indexes(spark, wh, purged_ids)
    assert res["ivf_rows_removed"] > 0

    # (b) fully-purged partition dir deleted
    assert not os.path.isdir(
        os.path.join(cells_path, f"cent_id={victim_cell}")
    )
    # (a) zero purged chunks anywhere in the rewritten index
    after = spark.read.parquet(cells_path).withColumn(
        "parent", F.regexp_extract("chunk_id", r"^(.*)_\d+$", 1)
    )
    assert after.filter(F.col("parent").isin(purged_ids)).count() == 0
    # (c) search over the purged index never surfaces a purged chunk
    hits = ivf_search_index(spark, wh, ["fast table scan"], k=10)
    for r in hits.collect():
        parent = r.chunk_id.rsplit("_", 1)[0]
        assert parent not in set(purged_ids)


def test_semantic_cache_purge_forces_miss(spark, sf_dir, tmp_path):
    """VERDICT r7 #4: a forgotten document could still be SERVED from
    the semantic cache. After purging its result ids, (a) the purged
    entries are gone from the manifest-resolved cache, (b) a lookup
    that previously HIT now MISSES (falls through to fresh search),
    (c) unrelated entries still hit, (d) a replayed purge is a no-op."""
    import json
    import os

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        purge_from_semantic_cache,
        semantic_cache_entries,
        semantic_cache_lookup,
        semantic_cache_put,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    wh = str(tmp_path / "wh")
    # two batches: entries caching results 100/101 and 200/201
    rows = emb.filter(F.col("vec_id").isin(10, 11, 20, 21)).collect()
    vec_of = {r.vec_id: r.v for r in rows}
    b1 = spark.createDataFrame(
        [(1, vec_of[10], 100, 0.99), (2, vec_of[11], 101, 0.99)],
        "cache_id long, q_vec array<double>, result_id long, result_sim double",
    )
    b2 = spark.createDataFrame(
        [(3, vec_of[20], 200, 0.99), (4, vec_of[21], 201, 0.99)],
        "cache_id long, q_vec array<double>, result_id long, result_sim double",
    )
    semantic_cache_put(spark, wh, b1)
    semantic_cache_put(spark, wh, b2)

    queries = spark.createDataFrame(
        [(10, vec_of[10]), (20, vec_of[20])],
        "q_id long, q_vec array<double>",
    )
    before = {
        r.q_id: (r.hit, r.served_id)
        for r in semantic_cache_lookup(spark, wh, queries).collect()
    }
    assert before[10] == (True, 100) and before[20] == (True, 200)

    removed = purge_from_semantic_cache(spark, wh, [100, 101])
    assert removed == 2
    after = {
        r.q_id: (r.hit, r.served_id)
        for r in semantic_cache_lookup(spark, wh, queries).collect()
    }
    assert after[10] == (False, None)  # purged: falls through to search
    assert after[20] == (True, 200)  # unrelated entry untouched
    live = {
        r.result_id for r in semantic_cache_entries(spark, wh).collect()
    }
    assert live == {200, 201}

    mpath = os.path.join(wh, "semcache", "MANIFEST.json")
    m1 = json.load(open(mpath))
    assert purge_from_semantic_cache(spark, wh, [100, 101]) == 0
    assert json.load(open(mpath)) == m1


def test_graph_index_purge_removes_and_relinks(spark, sf_dir, tmp_path):
    """VERDICT r7 #4: purging vec_ids from the durable graph ANN index
    removes them as nodes AND as neighbors, re-links affected sources
    through the deleted nodes' neighborhoods (degree restored up to m
    where candidates exist), leaves search never returning a purged
    id, and is replay-idempotent. A fully-purged src_bucket's dir is
    deleted (the dynamic-overwrite gap)."""
    import os

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        ensure_graph_index,
        graph_search_index,
        purge_from_graph_index,
    )

    wh = str(tmp_path / "wh")
    ensure_graph_index(spark, sf_dir, wh)
    graph_path = os.path.join(wh, "knn_graph")
    g0 = spark.read.parquet(graph_path)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )

    # purge two well-connected nodes (never the search entry point,
    # which is min(vec_id))
    indeg = (
        g0.groupBy("nbr_id").count().orderBy(F.col("count").desc(), "nbr_id")
    )
    purged = [r.nbr_id for r in indeg.limit(2).collect() if r.nbr_id > 5][:2]
    assert purged
    deg_before = {
        r.src_id: r.c
        for r in g0.filter(F.col("nbr_id").isin(purged))
        .filter(~F.col("src_id").isin(purged))
        .select("src_id")
        .distinct()
        .join(g0.groupBy("src_id").agg(F.count(F.lit(1)).alias("c")), "src_id")
        .collect()
    }

    res = purge_from_graph_index(spark, wh, purged, emb)
    assert res["nodes_removed"] == len(purged)
    assert res["edges_dropped"] > 0 and res["sources_relinked"] > 0

    g1 = spark.read.parquet(graph_path)
    assert g1.filter(
        F.col("src_id").isin(purged) | F.col("nbr_id").isin(purged)
    ).count() == 0
    # re-link restored degree m for affected sources (candidates exist
    # at this corpus size), and ranks are a clean 1..deg sequence
    deg_after = {
        r.src_id: r.c
        for r in g1.groupBy("src_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for s, d0 in deg_before.items():
        assert deg_after.get(s, 0) == d0, (s, d0, deg_after.get(s))
    ranks = g1.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rnk").alias("mx")
    )
    assert ranks.filter(F.col("n") != F.col("mx")).count() == 0

    # search over the purged index never returns a purged id
    hits = graph_search_index(spark, sf_dir, wh)
    assert all(r.vec_id not in set(purged) for r in hits.collect())

    # replay: nothing left to purge
    res2 = purge_from_graph_index(spark, wh, purged, emb)
    assert res2 == {
        "nodes_removed": 0,
        "edges_dropped": 0,
        "sources_relinked": 0,
        "buckets_rewritten": 0,
    }


def test_bm25_compaction_preserves_search(spark, sf_dir, tmp_path):
    """Compacting a multi-batch BM25 index into one dir changes the
    file layout only: tf/dl row sets and search scores identical,
    manifest shrinks to one batch, replayed compaction is a no-op."""
    import json
    import os

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        append_to_bm25_index,
        bm25_search_index,
        bm25_tables,
        compact_bm25_index,
        ensure_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wh = str(tmp_path / "wh")
    ensure_bm25_index(spark, docs.filter(F.col("doc_id") % 3 == 0), wh)
    append_to_bm25_index(spark, wh, docs.filter(F.col("doc_id") % 3 == 1))
    append_to_bm25_index(spark, wh, docs.filter(F.col("doc_id") % 3 == 2))

    def state():
        tf, dl, df, st = bm25_tables(spark, wh)
        return (
            {tuple(r) for r in tf.collect()},
            {tuple(r) for r in dl.collect()},
            {tuple(r) for r in df.collect()},
            {tuple(r) for r in st.collect()},
        )

    terms = ["table", "window", "spark"]
    before = state()
    s_before = {
        tuple(r) for r in bm25_search_index(spark, wh, terms).collect()
    }
    assert compact_bm25_index(spark, wh) == 3
    manifest = json.load(open(os.path.join(wh, "bm25", "MANIFEST.json")))
    assert len(manifest["batches"]) == 1
    assert state() == before
    assert {
        tuple(r) for r in bm25_search_index(spark, wh, terms).collect()
    } == s_before
    assert compact_bm25_index(spark, wh) == 0


def test_curated_ingest_matches_batch_reference(spark, sf_dir, tmp_path):
    """The streaming curation twin: ensemble-gated, deduplicating
    ingest over 3 micro-batches (with a whitespace-variant duplicate
    injected and a crash replay in the middle) must land exactly the
    batch reference — gate(doc) computed once over all docs (the gate
    is per-doc, so batch boundaries can't change it) and
    first-arrival-wins content dedup in batch order."""
    import glob as _glob
    import os as _os

    import pytest
    from pyspark.errors import StreamingQueryException

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        quality_ensemble_signals,
    )
    from commercial_rfp_data_pipeline_spark.streaming.ingest import (
        curated_ingest_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    # batch 2 includes ws-variant DUPLICATES of five batch-0 docs
    dupes = (
        docs.filter(F.col("doc_id").isin(0, 3, 6, 9, 12))
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.lit("  "), F.col("text"), F.lit("   ")).alias("text"),
        )
    )
    b2 = docs.filter(F.col("doc_id") % 3 == 2).unionByName(dupes)

    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    seen: set[str] = set()
    for i, b in enumerate([b0, b1, b2]):
        b.coalesce(1).write.mode("append").parquet(inp)
        for f in _glob.glob(inp + "/*.parquet"):
            if f not in seen:
                _os.utime(f, (1_700_000_000 + i * 60,) * 2)
                seen.add(f)
    schema = spark.read.parquet(inp).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )

    calls = {"n": 0}

    def boom(batch_id: int) -> None:
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after write, before commit")

    q = curated_ingest_sink(
        stream(), spark, store, ckpt, on_batch_written=boom
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    q2 = curated_ingest_sink(stream(), spark, store, ckpt)
    q2.awaitTermination()

    got = {
        r.doc_id: r.fp for r in spark.read.parquet(store).collect()
    }

    # batch reference: per-doc gate + first-arrival content dedup
    all_docs = b0.unionByName(b1).unionByName(b2)
    kept_ids = {
        r.doc_id
        for r in quality_ensemble_signals(all_docs)
        .filter("keep")
        .collect()
    }
    fp_of = {
        r.doc_id: r.fp
        for r in all_docs.select(
            "doc_id",
            F.md5(
                F.lower(
                    F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
                )
            ).alias("fp"),
        ).collect()
    }
    want: dict[int, str] = {}
    seen_fp: set[str] = set()
    for b in [b0, b1, b2]:
        for r in sorted(b.select("doc_id").collect(), key=lambda r: r.doc_id):
            d = r.doc_id
            if d in kept_ids and fp_of[d] not in seen_fp:
                seen_fp.add(fp_of[d])
                want[d] = fp_of[d]
    assert got == want
    # the injected duplicates were gated out by CONTENT (their base
    # docs arrived first), never admitted twice
    assert all(d < 100000 or d not in got for d in got)


def test_ingest_sink_fails_loud_on_corrupt_store(spark, sf_dir, tmp_path):
    """ADVICE r7 (medium): a corrupt admission store used to be
    swallowed by the first-batch except-handler and the batch was
    admitted with NO dedup check. Now only a genuinely-missing store
    skips the check; a corrupt store fails the stream so the real
    error surfaces instead of silently violating the store
    invariant."""
    import os as _os

    import pytest
    from pyspark.errors import StreamingQueryException

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.streaming.ingest import (
        curated_ingest_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    inp = str(tmp_path / "in")
    docs.limit(20).coalesce(1).write.parquet(inp)
    schema = spark.read.parquet(inp).schema

    # a store with a PRIOR committed batch dir containing garbage —
    # exactly the case the bare handler used to mask
    store = str(tmp_path / "store")
    bad_dir = _os.path.join(store, "batch_id=999")
    _os.makedirs(bad_dir)
    with open(_os.path.join(bad_dir, "part-corrupt.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    q = curated_ingest_sink(
        spark.readStream.schema(schema).parquet(inp),
        spark,
        store,
        str(tmp_path / "ckpt"),
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()


def test_neardup_ingest_rejects_rewrites_across_batches(spark, sf_dir, tmp_path):
    """Near-dup admission at ingest: a batch-2 REWRITE (one word
    changed — byte-distinct, so exact-fingerprint dedup would admit
    it) of a batch-0 doc is rejected by the SimHash band check; novel
    docs are admitted; a mid-stream crash replay changes nothing; and
    the final store satisfies the invariant that NO two admitted docs
    are within Hamming 3 of each other."""
    import glob as _glob
    import os as _os

    import pytest
    from pyspark.errors import StreamingQueryException

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        simhash,
        simhash_pairs,
    )
    from commercial_rfp_data_pipeline_spark.streaming.ingest import (
        neardup_ingest_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # use the corpus's REAL near-dup pairs (byte-distinct rewrites the
    # exact-fingerprint sink would admit): a-side docs arrive in batch
    # 0, their near-dup partners in batch 2
    near = simhash_pairs(simhash(docs)).select("doc_a", "doc_b").collect()
    assert near, "corpus has no near-dup pairs at this SF"
    a_side = sorted({r.doc_a for r in near})[:5]
    partner = {}
    for r in near:
        if r.doc_a in a_side and r.doc_a not in partner:
            partner[r.doc_a] = r.doc_b
    b_side = sorted(set(partner.values()))
    rest = docs.filter(
        ~F.col("doc_id").isin([*a_side, *b_side])
    ).filter(F.col("doc_id") < 60)
    b0 = docs.filter(F.col("doc_id").isin(a_side))
    b1 = rest
    b2 = docs.filter(F.col("doc_id").isin(b_side))

    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    seen: set[str] = set()
    for i, b in enumerate([b0, b1, b2]):
        b.coalesce(1).write.mode("append").parquet(inp)
        for f in _glob.glob(inp + "/*.parquet"):
            if f not in seen:
                _os.utime(f, (1_700_000_000 + i * 60,) * 2)
                seen.add(f)
    schema = spark.read.parquet(inp).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )

    calls = {"n": 0}

    def boom(batch_id: int) -> None:
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after write, before commit")

    q = neardup_ingest_sink(
        stream(), spark, store, ckpt, on_batch_written=boom
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    q2 = neardup_ingest_sink(stream(), spark, store, ckpt)
    q2.awaitTermination()

    admitted = spark.read.parquet(store)
    ids = {r.doc_id for r in admitted.select("doc_id").collect()}
    # a near-dup pair never survives together; with the a-side arriving
    # first, at least one partner was rejected BY the store check
    for a, b in partner.items():
        assert not (a in ids and b in ids)
    assert any(a in ids and b not in ids for a, b in partner.items())
    # THE invariant: no two admitted docs within Hamming 3
    final_pairs = simhash_pairs(
        admitted.select("doc_id", "simhash"), max_hamming=3
    )
    assert final_pairs.count() == 0


def test_remote_embedder_matches_expression_embedder(spark, sf_dir):
    """RemoteBatchEmbedder through a fake service transport produces
    the identical vectors as the Catalyst expression embedder — the
    production swap is a one-argument change with no semantic drift.
    The transport is defined INSIDE the test so cloudpickle ships it
    by value (a tests-module function pickles by reference, which
    executors cannot import — the driver-contract gotcha)."""

    def _hashed_bow_transport(texts):
        import hashlib
        import re

        import numpy as np

        dim = 64
        out = np.zeros((len(texts), dim))
        for i, t in enumerate(texts):
            toks = re.sub(r"\s+", " ", str(t)).strip().lower().split(" ")
            for tok in toks:
                j = int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) % dim
                out[i, j] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return [list(v) for v in np.round(out / norms, 6)]

    from commercial_rfp_data_pipeline_spark.operators.chunking import (
        chunk_text,
    )
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.embedder import (
        HashedBowEmbedder,
        RemoteBatchEmbedder,
    )

    docs = load_table(spark, sf_dir, "documents").limit(40)
    chunks = chunk_text(docs, size=120, overlap=30)
    want = {
        r.chunk_id: [round(x, 6) for x in r.embedding]
        for r in HashedBowEmbedder()
        .embed(chunks, "chunk", "chunk_id")
        .collect()
    }
    got = {
        r.chunk_id: [round(x, 6) for x in r.embedding]
        for r in RemoteBatchEmbedder(_hashed_bow_transport)
        .embed(chunks, "chunk", "chunk_id")
        .collect()
    }
    assert got == want


def test_remote_embedder_retries_and_validates():
    """Driver-side contract tests for the retry/validation logic: a
    transport that fails once succeeds on retry (with the on_retry
    hook observing the attempt); a short response and a wrong-dim
    response both fail loudly; persistent failure raises after the
    retry budget."""
    import pandas as pd
    import pytest

    from commercial_rfp_data_pipeline_spark.operators.embedder import (
        RemoteBatchEmbedder,
    )

    def run_one(emb, texts):
        # drive the mapInPandas closure directly with one pandas batch
        batches = iter([pd.DataFrame({"t": texts, "i": range(len(texts))})])
        # rebuild the inner runner the same way embed() does
        out = []

        class _FakeDF:
            def mapInPandas(self, fn, schema):
                out.extend(list(fn(batches)))
                return None

        emb.embed(_FakeDF(), "t", "i")
        return out

    calls = {"n": 0}
    seen_retries = []

    def flaky(texts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("transient")
        return [[0.0] * 64 for _ in texts]

    out = run_one(
        RemoteBatchEmbedder(
            flaky, max_retries=2, on_retry=lambda a, e: seen_retries.append(a)
        ),
        ["x", "y"],
    )
    assert len(out) == 1 and len(out[0]) == 2
    assert seen_retries == [0]

    with pytest.raises(Exception, match="returned 1 vectors"):
        run_one(
            RemoteBatchEmbedder(lambda ts: [[0.0] * 64]), ["x", "y"]
        )
    with pytest.raises(Exception, match="dim mismatch"):
        run_one(
            RemoteBatchEmbedder(lambda ts: [[0.0] * 8 for _ in ts]),
            ["x", "y"],
        )
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        run_one(
            RemoteBatchEmbedder(
                lambda ts: (_ for _ in ()).throw(ConnectionError("down")),
                max_retries=1,
            ),
            ["x"],
        )
