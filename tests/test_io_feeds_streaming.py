from __future__ import annotations

import datetime as dt

import pytest

from etl_reporting_spark.datafeeds.writers import (
    ExecutionLog,
    grouped_report_frame,
    write_csv,
)
from etl_reporting_spark.io import (
    Engine,
    TableType,
    WriteMode,
    inject_incremental_predicate,
    render_template,
)
from etl_reporting_spark.streaming.cdc_stream import (
    dedup_within_watermark,
    read_event_stream,
    run_available_now_to_table,
    windowed_event_counts,
)


def test_render_template_and_incremental():
    text = "SELECT * FROM {{SOURCE_DATABASE}}.t WHERE 1=1 {{AND_CONDITION}}"
    out = render_template(text, {"source_database": "db1"})
    out = inject_incremental_predicate(out, "sequenced_at", "2024-01-01")
    assert out == "SELECT * FROM db1.t WHERE 1=1  AND (sequenced_at) > '2024-01-01'"
    # no incremental config → marker collapses
    assert inject_incremental_predicate("x {{WHERE_CONDITION}}", None, None) == "x "


def test_engine_session_vars_and_views(spark):
    eng = Engine(spark)
    eng.set_session_variables(carrier_name="ACME")
    df = eng.execute_query("SELECT $CARRIER_NAME AS carrier")
    assert df.first()["carrier"] == "ACME"

    src = spark.createDataFrame([(1,), (2,)], "v int")
    eng.save_as_view(src, "eng_view")
    assert eng.execute_query("SELECT COUNT(*) AS n FROM eng_view", lazy=False)[0]["n"] == 2


def test_engine_temp_table_modes(spark):
    eng = Engine(spark)
    df1 = spark.createDataFrame([(1,)], "v int")
    df2 = spark.createDataFrame([(2,)], "v int")
    eng.save_as_table(df1, "tmp_t", WriteMode.OVERWRITE, TableType.TEMPORARY)
    eng.save_as_table(df2, "tmp_t", WriteMode.APPEND, TableType.TEMPORARY)
    assert eng.table("tmp_t").count() == 2
    eng.save_as_table(df1, "tmp_t", WriteMode.IGNORE, TableType.TEMPORARY)
    assert eng.table("tmp_t").count() == 2  # ignored
    with pytest.raises(ValueError):
        eng.save_as_table(df1, "tmp_t", WriteMode.ERROR_IF_EXISTS, TableType.TEMPORARY)


def test_engine_multi_statement(spark):
    eng = Engine(spark)
    out = eng.execute_multiple_statements(
        ["SELECT 1 AS a;", "SELECT 2 AS b"], lazy=False
    )
    assert out[0]["b"] == 2


def test_grouped_report_frame(spark):
    df = spark.createDataFrame(
        [("east", 10.0, 2), ("east", 20.0, 3), ("west", 6.0, 2)],
        "grp string, amount double, claimants int",
    )
    frame = grouped_report_frame(
        df, "grp", ["amount", "claimants"], ratio=("avg_paid", "amount", "claimants")
    )
    labels = list(frame["grp"])
    assert labels == ["east", "east", "east Total", "west", "west Total", "Grand Total"]
    grand = frame.iloc[-1]
    assert grand["amount"] == 36.0 and grand["claimants"] == 7
    assert abs(grand["avg_paid"] - 36.0 / 7) < 1e-12


def test_write_csv_crlf(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    p = tmp_path / "out.csv"
    write_csv(df, p, crlf=True)
    raw = p.read_bytes()
    assert b"\r\n" in raw and raw.startswith(b"a,b")


def test_write_csv_survives_scd2_sentinel(spark, tmp_path):
    # SCD2 open rows carry the 9999-12-31 sentinel, which overflows
    # pandas datetime64[ns]; the writers must fall back to the
    # timestamp_as_object Arrow path instead of raising.
    import datetime as dt

    from etl_reporting_spark.operators.cdc import scd2_intervals

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1)), ("a", dt.datetime(2024, 2, 1))],
        "key string, sequenced_at timestamp",
    )
    out = scd2_intervals(df, "key", "sequenced_at")
    p = tmp_path / "scd2.csv"
    write_csv(out, p)
    text = p.read_text()
    assert "9999-12-31" in text and text.count("\n") == 3


def test_execution_log(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS audit_test")
    log = ExecutionLog(spark, table="audit_test.execution_log")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    eid = log.record("report_x", "SUCCESS", t0, t0 + dt.timedelta(seconds=5), rows_affected=42)
    rows = spark.table("audit_test.execution_log").collect()
    assert any(r["execution_id"] == eid and r["rows_affected"] == 42 for r in rows)
    spark.sql("DROP TABLE audit_test.execution_log")
    spark.sql("DROP DATABASE audit_test")


def test_streaming_dedup_and_window(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, value double"
    batch = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 5), 10, 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 5), 10, 1.0),  # duplicate event
            (2, dt.datetime(2024, 1, 1, 0, 20), 11, 2.0),
            (3, dt.datetime(2024, 1, 1, 1, 10), 10, 3.0),
        ],
        schema,
    )
    batch.write.mode("overwrite").parquet(str(src))

    stream = read_event_stream(spark, str(src), schema)
    assert stream.isStreaming
    deduped = dedup_within_watermark(stream, ["event_id"], "ts")
    q = run_available_now_to_table(deduped, "stream_dedup_out", str(tmp_path / "cp1"))
    q.awaitTermination(60)
    assert spark.table("stream_dedup_out").count() == 3  # dup dropped

    windowed = windowed_event_counts(stream, "ts", "1 hour")
    q2 = (
        windowed.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .outputMode("append")
        .toTable("stream_window_out")
    )
    q2.awaitTermination(60)
    # append mode only emits windows the watermark has closed; with
    # availableNow the final watermark closes the first hour's window.
    out = {r["period_start"]: r["n_events"] for r in spark.table("stream_window_out").collect()}
    assert out.get(dt.datetime(2024, 1, 1, 0, 0)) == 3
    spark.sql("DROP TABLE IF EXISTS stream_dedup_out")
    spark.sql("DROP TABLE IF EXISTS stream_window_out")


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from etl_reporting_spark.streaming.cdc_stream import stateful_running_totals

    src = tmp_path / "stateful_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, value double"
    b1 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0), 10, 1.0),
         (2, dt.datetime(2024, 1, 1, 0, 1), 10, 2.0),
         (3, dt.datetime(2024, 1, 1, 0, 2), 11, 5.0)],
        schema,
    )
    b2 = spark.createDataFrame(
        [(4, dt.datetime(2024, 1, 1, 1, 0), 10, 4.0),
         (5, dt.datetime(2024, 1, 1, 1, 1), 12, 7.0)],
        schema,
    )
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = stateful_running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_out").collect()
    # last emitted state per user reflects the accumulated totals
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["event_count"], r["value_sum"])
    assert final[10] == (3, 7.0)  # 2 events batch1 + 1 event batch2 (state carried)
    assert final[11] == (1, 5.0)
    assert final[12] == (1, 7.0)


def test_permanent_view_survives_new_session(spark):
    """Catalog-backed views persist across sessions; temp views don't
    (reference save_as_view stores the definition in the catalog,
    connector:511-566)."""
    from etl_reporting_spark.io import Engine

    eng = Engine(spark)
    eng.drop_view("pv_over_table")
    eng.drop_managed_table("pv_base")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.saveAsTable("pv_base")
    eng.create_permanent_view("pv_over_table", "SELECT k, upper(v) AS v FROM pv_base")
    eng.save_as_view(spark.table("pv_base"), "pv_temp_alias")

    fresh = spark.newSession()
    rows = {r["k"]: r["v"] for r in fresh.sql("SELECT * FROM pv_over_table").collect()}
    assert rows == {1: "A", 2: "B"}
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException):
        fresh.sql("SELECT * FROM pv_temp_alias")

    # session variables resolve into the stored definition
    eng.set_session_variables(min_k="2")
    eng.create_permanent_view("pv_filtered", "SELECT k FROM pv_base WHERE k >= $MIN_K")
    assert [r["k"] for r in fresh.sql("SELECT * FROM pv_filtered").collect()] == [2]
    eng.drop_view("pv_filtered")
    eng.drop_view("pv_over_table")
    eng.drop_managed_table("pv_base")


def test_save_as_view_permanent_from_dataframe(spark):
    """The reference's save_as_view stores the DataFrame's own SQL plan
    as a catalog view (connector:511-566); the engine mirrors it via
    the defining SQL recorded on execute_query frames."""
    import pytest as _pytest

    from etl_reporting_spark.io import Engine

    eng = Engine(spark)
    eng.drop_view("pv_df_view")
    eng.drop_managed_table("pv_df_base")
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, amt double").write.saveAsTable(
        "pv_df_base"
    )
    df = eng.execute_query("SELECT k, amt * 2 AS amt2 FROM pv_df_base WHERE k >= 2")
    eng.save_as_view(df, "pv_df_view", permanent=True)

    fresh = spark.newSession()
    rows = [(r["k"], r["amt2"]) for r in fresh.table("pv_df_view").collect()]
    assert rows == [(2, 40.0)]

    # an API-built frame carries no SQL → clear error, not a temp view
    with _pytest.raises(ValueError, match="no defining SQL"):
        eng.save_as_view(spark.table("pv_df_base"), "pv_df_bad", permanent=True)

    eng.drop_view("pv_df_view")
    eng.drop_managed_table("pv_df_base")


def test_query_history_read_surface(spark):
    """Engine.get_query_history mirrors the reference's
    get_query_history (connector:585-601): newest-first top-n over the
    execution log, optionally scoped to one object."""
    from etl_reporting_spark.io import Engine

    eng = Engine(spark)
    # empty history before the log table exists
    assert eng.get_query_history(5, log_table="qh_log").count() == 0

    Engine(spark).drop_managed_table("qh_log")
    log = ExecutionLog(spark, table="qh_log")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    for i in range(4):
        log.record(
            f"obj_{i % 2}", "SUCCESS", t0 + dt.timedelta(minutes=i), rows_affected=i
        )
    hist = eng.get_query_history(3, log_table="qh_log").collect()
    assert len(hist) == 3
    starts = [r["execution_start_ts"] for r in hist]
    assert starts == sorted(starts, reverse=True)  # newest first
    scoped = eng.get_query_history(10, object_name="obj_1", log_table="qh_log").collect()
    assert {r["object_name"] for r in scoped} == {"obj_1"} and len(scoped) == 2
    Engine(spark).drop_managed_table("qh_log")


def test_grouped_report_null_group_reconciles(spark):
    """Rows with a NULL group value get their own labelled subtotal and
    the body sums to the grand total (dropna regression)."""
    from etl_reporting_spark.datafeeds.writers import grouped_report_frame

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 4.0)], "grp string, amt double"
    )
    frame = grouped_report_frame(df, "grp", ["amt"])
    labels = list(frame["grp"])
    assert "(null) Total" in labels and "Grand Total" in labels
    grand = frame.loc[frame["grp"] == "Grand Total", "amt"].iloc[0]
    subtotals = frame.loc[
        frame["grp"].isin(["a Total", "(null) Total"]), "amt"
    ].sum()
    assert grand == subtotals == 7.0


def test_formatted_workbook_roundtrip(spark, tmp_path):
    """The formatted workbook round-trips on whichever xlsx backend is
    available (openpyxl, or the vendored xlsxlite in dependency-free
    containers): merged header, bold totals, dollar format, widths."""
    import pandas as pd

    from etl_reporting_spark.datafeeds.writers import (
        write_formatted_workbook,
        xlsx_backend,
    )

    frame = pd.DataFrame(
        {"Region": ["east", "east Total", "Grand Total"], "Paid": [10.0, 10.0, 10.0]}
    )
    out = tmp_path / "report.xlsx"
    write_formatted_workbook(
        {"Summary": frame, "Detail": frame},
        out,
        carrier_name="ACME",
        report_name="Claims",
        report_start_dt="01/01/2024",
        report_end_dt="01/15/2024",
        dollar_columns=["Paid"],
        specific_column_widths={"Region": 30},
    )
    wb = xlsx_backend().load_workbook(out)
    assert wb.sheetnames == ["Summary", "Detail"]
    ws = wb["Summary"]
    assert ws.cell(row=1, column=1).value == "ACME"
    assert ws.cell(row=2, column=1).value == "Claims"
    assert ws.cell(row=5, column=1).value == "Region"
    assert ws.cell(row=5, column=1).font.bold
    # subtotal + grand-total rows bold; detail row not
    assert not ws.cell(row=6, column=1).font.bold
    assert ws.cell(row=7, column=1).font.bold and ws.cell(row=8, column=1).font.bold
    assert ws.cell(row=7, column=2).number_format == "$#,##0.00"
    assert ws.column_dimensions["A"].width == 30


def test_pdf_extraction_fallback_chain():
    """The pdfplumber→tabula→camelot chain falls through missing libs
    and failures, returns the first non-empty result, and reports every
    attempt when the chain is exhausted."""
    import pandas as pd
    import pytest as _pytest

    from etl_reporting_spark.datafeeds.pdf_tables import extract_pdf_tables

    table = pd.DataFrame({"a": [1]})

    def missing(path):
        raise ImportError("no lib")

    def broken(path):
        raise RuntimeError("parse error")

    def empty(path):
        return []

    def works(path):
        return [table]

    out = extract_pdf_tables(
        "x.pdf", extractors=(("p1", missing), ("p2", broken), ("p3", works))
    )
    assert out[0] is table

    with _pytest.raises(NotImplementedError) as exc:
        extract_pdf_tables("x.pdf", extractors=(("p1", missing), ("p2", empty)))
    assert "p1: not installed" in str(exc.value) and "p2: no tables found" in str(exc.value)

    # the real chain: all three libraries absent in this container
    with _pytest.raises(NotImplementedError) as exc2:
        extract_pdf_tables("x.pdf")
    assert "pdfplumber" in str(exc2.value)


def test_read_excel_roundtrip(spark, tmp_path):
    """The Excel source round-trips a frame written by the Excel sink
    on whichever xlsx backend is available."""
    from etl_reporting_spark.datafeeds.writers import read_excel, write_excel

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    p = tmp_path / "roundtrip.xlsx"
    write_excel(df, p)
    back = read_excel(spark, p)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_load_mappings_excel(tmp_path):
    from etl_reporting_spark.datafeeds.writers import xlsx_backend
    from etl_reporting_spark.dq.test_case_generator import load_mappings_excel

    wb = xlsx_backend().Workbook()
    ws = wb.active
    ws.append(["table", "column", "primary_key", "filter_column"])
    ws.append(["orders", "o_totalprice", "o_orderkey", ""])
    p = tmp_path / "map.xlsx"
    wb.save(str(p))
    (m,) = load_mappings_excel(str(p))
    assert m.table == "orders" and m.primary_key == "o_orderkey"


def test_session_window_matches_batch_sessionize(spark):
    """The native session_window aggregate groups the same events into
    the same sessions as the LAG-based batch operator (away from the
    exactly-gap fencepost, where the two differ by design)."""
    from etl_reporting_spark.operators.sessionize import session_aggregates
    from etl_reporting_spark.streaming.cdc_stream import sessionized_event_counts

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 10, 1.0),
        (2, dt.datetime(2024, 1, 1, 0, 10), 10, 2.0),
        (3, dt.datetime(2024, 1, 1, 1, 0), 10, 4.0),   # > 30 min gap: new session
        (4, dt.datetime(2024, 1, 1, 0, 5), 11, 8.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in session_aggregates(df).collect()
    }
    native = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionized_event_counts(df).collect()
    }
    assert batch == native
    assert batch[(10, dt.datetime(2024, 1, 1, 0, 0))] == (2, 3.0)
    assert batch[(10, dt.datetime(2024, 1, 1, 1, 0))] == (1, 4.0)


def test_session_window_streaming_emits_closed_sessions(spark, tmp_path):
    from etl_reporting_spark.streaming.cdc_stream import (
        read_event_stream,
        sessionized_event_counts,
    )

    src = tmp_path / "sess_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, value double"
    batch = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), 10, 1.0),
            (2, dt.datetime(2024, 1, 1, 0, 10), 10, 2.0),
            # far-future event advances the watermark past user 10's session
            (3, dt.datetime(2024, 1, 2, 0, 0), 99, 0.0),
        ],
        schema,
    )
    batch.write.mode("overwrite").parquet(str(src))
    stream = read_event_stream(spark, str(src), schema)
    out = sessionized_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM sess_out").collect()}
    assert rows[10]["n_events"] == 2 and rows[10]["sum_value"] == 3.0
    # 30-min gap: the closed session's window end is last event + gap
    assert rows[10]["session_end"] == dt.datetime(2024, 1, 1, 0, 40)
    assert 99 not in rows  # its session is still open at final watermark


def test_streaming_dedup_screen_per_batch(spark, tmp_path):
    """Each micro-batch screens against the standing corpus signature
    store; verified pairs land in the sink, corpus-internal dups never
    re-derive."""
    from etl_reporting_spark.llm.dedup import minhash_signatures, shingle_docs
    from etl_reporting_spark.streaming.cdc_stream import streaming_dedup_screen

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base), (2, base + " lambda")],
        "doc_id long, text string",
    )
    store = minhash_signatures(shingle_docs(corpus))

    src = tmp_path / "doc_stream"
    src.mkdir()
    spark.createDataFrame(
        [(10, base + " mu"), (11, "unrelated filler words that match nothing at all")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    got: list[tuple] = []

    def sink(pairs_df, epoch_id):
        got.extend((r["doc_a"], r["doc_b"]) for r in pairs_df.collect())

    q = streaming_dedup_screen(
        stream, corpus, store, str(tmp_path / "cp_screen"), sink, min_jaccard=0.5
    )
    q.awaitTermination(120)
    assert (1, 10) in got and (2, 10) in got   # batch doc near-dups both corpus docs
    assert (1, 2) not in got                   # corpus-internal: not re-derived
    assert all(a != 11 and b != 11 for a, b in got)  # unrelated doc is clean


def test_streaming_quality_screen_per_batch(spark, tmp_path):
    """Micro-batches arrive scored with the classifier margin; the
    sink routes keeps vs rejects — no state, no shuffle."""
    from etl_reporting_spark.streaming.cdc_stream import streaming_quality_screen

    src = tmp_path / "qdoc_stream"
    src.mkdir()
    spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was a fine day for sitting"),
            (2, "$$$ ### !!! @@@ %%% ^^^ &&& *** ((( )))"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    got: dict[int, tuple] = {}

    def sink(scored_df, epoch_id):
        for r in scored_df.collect():
            got[r["doc_id"]] = (r["keep"], r["quality_score"])

    q = streaming_quality_screen(stream, str(tmp_path / "cp_q"), sink)
    q.awaitTermination(120)
    assert got[1][0] is True and got[2][0] is False
    assert got[1][1] > got[2][1]
    assert set(got) == {1, 2}


def test_streaming_sketch_maintenance_equals_batch_build(spark, tmp_path):
    """Stream terms in (two source files → micro-batches), maintain
    the sketch store per epoch, and prove the folded store EQUALS a
    single batch build over everything — the mergeability contract
    that justifies sketch maintenance on a stream."""
    from etl_reporting_spark.llm.corpusops import bloom_build, countmin_sketch
    from etl_reporting_spark.streaming.cdc_stream import (
        read_bloom_store,
        read_countmin_store,
        streaming_sketch_maintenance,
    )

    src = tmp_path / "sketch_src"
    src.mkdir()
    rows1 = [(f"t{i % 7}",) for i in range(40)]
    rows2 = [(f"t{i % 11}",) for i in range(40)]
    spark.createDataFrame(rows1, "term string").write.mode("append").parquet(str(src))
    spark.createDataFrame(rows2, "term string").write.mode("append").parquet(str(src))

    stream = spark.readStream.schema("term string").parquet(str(src))
    q = streaming_sketch_maintenance(
        stream,
        str(tmp_path / "cp_sketch"),
        str(tmp_path / "store"),
        depth=3,
        width=64,
        m_bits=2048,
        k_hashes=4,
    )
    q.awaitTermination(120)

    everything = spark.createDataFrame(rows1 + rows2, "term string")
    cm_ref = {(r["sketch_row"], r["bucket"]): r["cnt"]
              for r in countmin_sketch(everything, "term", depth=3, width=64).collect()}
    cm_got = {(r["sketch_row"], r["bucket"]): r["cnt"]
              for r in read_countmin_store(spark, str(tmp_path / "store")).collect()}
    assert cm_got == cm_ref

    bf_ref = {(r["word_idx"], r["word"])
              for r in bloom_build(everything, "term", m_bits=2048, k=4).collect()}
    bf_got = {(r["word_idx"], r["word"])
              for r in read_bloom_store(spark, str(tmp_path / "store")).collect()}
    assert bf_got == bf_ref


def test_analyze_table_collects_stats(spark, tmp_path):
    engine = Engine(spark)
    spark.range(100).selectExpr("id", "id % 7 AS grp").write.mode(
        "overwrite"
    ).saveAsTable("stats_demo")
    engine.analyze_table("stats_demo")
    row_count = spark.sql("DESCRIBE TABLE EXTENDED stats_demo").filter(
        "col_name = 'Statistics'"
    ).first()
    assert row_count is not None and "rows" in row_count["data_type"]
    engine.analyze_table("stats_demo", ["grp"])
    ndv = spark.sql("DESCRIBE EXTENDED stats_demo grp").filter(
        "info_name = 'distinct_count'"
    ).first()
    assert ndv is not None and int(ndv["info_value"]) >= 6
    spark.sql("DROP TABLE stats_demo")


def test_streaming_drift_screen_e2e(spark, tmp_path):
    """Drift verdicts per micro-batch against a standing baseline:
    a balanced baseline vs a skewed stream must FAIL the TVD gate;
    the verdict frame matches the batch drift_check's shape."""
    import pyspark.sql.functions as F

    from etl_reporting_spark.streaming.cdc_stream import streaming_drift_screen

    src = tmp_path / "drift_src"
    src.mkdir()
    skewed = [("a",)] * 18 + [("b",)] * 2
    spark.createDataFrame(skewed, "category string").write.mode("append").parquet(str(src))

    baseline = spark.createDataFrame(
        [("a", 50), ("b", 50)], "category string, n long"
    )
    got: list = []

    def sink(verdict, epoch_id):
        got.append({r["category"]: r for r in verdict.collect()})

    stream = spark.readStream.schema("category string").parquet(str(src))
    q = streaming_drift_screen(
        stream, baseline, str(tmp_path / "cp_drift"), sink, max_tvd=0.1
    )
    q.awaitTermination(120)
    assert len(got) == 1
    v = got[0]
    assert abs(v["a"]["tvd"] - 0.4) < 1e-12  # |0.9-0.5|/2 + |0.1-0.5|/2
    assert not v["a"]["passed"] and not v["b"]["passed"]
    assert v["a"]["n_base"] == 50 and v["a"]["n_cur"] == 18
