"""Python UDTF extension point: row-identity with the declarative twin.

The oracle gate proves x_udtf_chunk_windows against DuckDB; these
tests pin the stronger internal claim — the imperative UDTF and the
codegen'd HOF operator (text.chunk_documents) emit EXACTLY the same
rows, and the UDTF handles the degenerate inputs (NULL text, empty
token list, sub-window doc) the same way.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from strava_etl_public_spark.operators.text import chunk_documents
from strava_etl_public_spark.operators.udtfs import register_udtfs


def _udtf_chunks(spark, docs, chunk: int, stride: int):
    register_udtfs(spark)
    docs.createOrReplaceTempView("t_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM t_udtf_docs d, LATERAL chunk_windows_udtf(d.text, {chunk}, {stride}) c
        """
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("doc_id", "chunk_idx").collect()]


def test_udtf_matches_declarative_twin_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(100)
    declarative = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, stride=48)
    imperative = _udtf_chunks(spark, docs, 64, 48)
    assert _sorted_rows(imperative) == _sorted_rows(declarative)


def test_udtf_degenerate_inputs(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "...!!!"), (4, "one two"), (5, "a " * 200)],
        "doc_id long, text string",
    )
    # NULL / empty / punctuation-only docs emit nothing; a sub-window
    # doc emits exactly one tail chunk — same contract as the twin.
    declarative = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, stride=48)
    imperative = _udtf_chunks(spark, docs, 64, 48)
    assert _sorted_rows(imperative) == _sorted_rows(declarative)
    got_ids = {r[0] for r in _sorted_rows(imperative)}
    assert got_ids == {4, 5}
    one = [r for r in _sorted_rows(imperative) if r[0] == 4]
    assert one == [(4, 0, "one two", 2)]


def test_udtf_overlap_and_tail_rule(spark):
    # 10 tokens, chunk 4, stride 3 -> starts 0,3,6 and the ceil-rule
    # tail start 9 would exceed unless needed: last = ceil(6/3)*3 = 6,
    # so starts are 0..6 step 3 (tail window 6..9 spans 4 tokens).
    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = _sorted_rows(_udtf_chunks(spark, docs, 4, 3))
    twin = _sorted_rows(chunk_documents(docs, "doc_id", "text", 4, 3))
    assert rows == twin
    assert [r[1] for r in rows] == [0, 1, 2]
    assert rows[-1][3] == 4 and rows[-1][2] == "w6 w7 w8 w9"


def test_table_arg_udtf_matches_ewma_operator(spark, sf_dir):
    """Three implementations, one answer: the TABLE-argument UDTF's
    final per-key EWMA must be bit-identical to the last row of
    rolling.ewma_by_key (the oracle gate pins the third — the
    recursive-CTE — against the query)."""
    from pyspark.sql import Window as W

    from strava_etl_public_spark.functions import epoch as ep
    from strava_etl_public_spark.operators.rolling import ewma_by_key

    register_udtfs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts", "value"
    )
    ev = ev.withColumn("_ns", ep.epoch_ns(ev, "ts")).drop("ts")
    ev.createOrReplaceTempView("t_udtf_ev")
    got = {
        r["user_id"]: (r["n"], r["ewma"])
        for r in spark.sql(
            """
            SELECT * FROM ewma_final_udtf(TABLE(t_udtf_ev)
                                          PARTITION BY user_id
                                          ORDER BY (_ns, event_id))
            """
        ).collect()
    }
    op = ewma_by_key(ev, ["user_id"], ["_ns", "event_id"], "value", 0.3, "s")
    w = W.partitionBy("user_id").orderBy(F.desc("_ns"), F.desc("event_id"))
    last = op.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
    counts = {
        r["user_id"]: r["c"]
        for r in op.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    want = {
        r["user_id"]: (counts[r["user_id"]], r["s"]) for r in last.collect()
    }
    assert got == want and len(got) > 0


def test_table_arg_udtf_null_value_matches_operator(spark):
    """NULL-value parity (code-review r8 low): ewma_by_key reads the
    value column through pandas (NULL → NaN inside the recursion,
    surfaced as NULL by the Arrow serializer on the way back); the
    UDTF must do the same instead of raising TypeError on
    float(None) and failing the whole query."""
    from strava_etl_public_spark.operators.rolling import ewma_by_key

    register_udtfs(spark)
    ev = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, None), (1, 30, 4.0), (2, 10, 8.0)],
        "user_id long, event_id long, value double",
    ).withColumn("_ns", F.col("event_id") * 1000)
    ev.createOrReplaceTempView("t_udtf_null_ev")
    got = {
        r["user_id"]: (r["n"], r["ewma"])
        for r in spark.sql(
            """
            SELECT * FROM ewma_final_udtf(TABLE(t_udtf_null_ev)
                                          PARTITION BY user_id
                                          ORDER BY (_ns, event_id))
            """
        ).collect()
    }
    op = ewma_by_key(ev, ["user_id"], ["_ns", "event_id"], "value", 0.3, "s")
    want = {
        r["user_id"]: (r["c"], r["s"])
        for r in op.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"), F.max_by("s", "_ns").alias("s"))
        .collect()
    }
    assert set(got) == set(want) == {1, 2}
    assert got[2] == want[2] == (1, 8.0)
    # key 1 hit the NULL: both paths must surface the poisoned state
    # as NULL (not raise, not diverge NaN-vs-NULL)
    assert got[1] == want[1] == (3, None)
