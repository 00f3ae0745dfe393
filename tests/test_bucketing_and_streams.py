"""Bucketed-table co-located joins, foreachBatch sinks, IVF ANN sanity."""

from __future__ import annotations

import pytest

# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow

import uuid

from pyspark.sql import functions as F

from ooh_etl_spark.plans.audit import physical_plan
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key means later joins
    co-locate without an Exchange — the 100 TB answer to repeated
    fact-fact joins on the same key."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    suffix = uuid.uuid4().hex[:8]
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li"))
        .saveAsTable(f"li_b_{suffix}")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord"))
        .saveAsTable(f"ord_b_{suffix}")
    )
    a = spark.table(f"li_b_{suffix}")
    b = spark.table(f"ord_b_{suffix}")
    # Disable broadcast so the join would otherwise be a shuffle SMJ.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("o_orderpriority").count()
        plan = physical_plan(j)
        assert "SortMergeJoin" in plan, plan
        # No shuffle below the join: buckets already co-locate the keys.
        # Plan nodes number leaf-up, so any Exchange feeding the join
        # would carry a smaller id than the SortMergeJoin node.
        import re

        smj_id = int(re.search(r"\((\d+)\) SortMergeJoin", plan).group(1))
        exchange_ids = [int(m) for m in re.findall(r"\((\d+)\) Exchange", plan)]
        assert all(eid > smj_id for eid in exchange_ids), plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS li_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS ord_b_{suffix}")


def test_foreachbatch_sink(spark, tmp_path):
    """foreachBatch: the exactly-once escape hatch — each micro-batch
    lands as a normal batch write (here: parquet per epoch)."""
    from ooh_etl_spark.queries.streaming import _event_stream

    out = str(tmp_path / "epochs")
    ev = _event_stream(spark, SF_DIR).select("event_id", "user_id", "value")

    def sink(batch_df, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = ev.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.processAllAvailable()
    q.stop()
    written = spark.read.parquet(out)
    expected = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert written.count() == expected


def test_ivf_ann_shape_and_ordering(spark):
    from ooh_etl_spark.queries import QUERIES

    rows = QUERIES["q53_ann_ivf"].fn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1)), q
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True), q
    # IVF restricts search to the query's own cell; some overlap with
    # the exact top-k is expected (same-cell vectors are near vectors).
    exact = QUERIES["q30_knn_cosine"].fn(spark, SF_DIR).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    ivf_pairs = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(exact_pairs & ivf_pairs) > 0


def test_transform_with_state_when_supported(spark):
    # Spark 4 transformWithStateInPandas needs a working protobuf; the
    # operator is library code either way, the run is env-gated.
    import pytest

    from ooh_etl_spark.queries.streaming import _protobuf_ok

    if not _protobuf_ok():
        pytest.skip("protobuf unavailable: transformWithState cannot run here")
    from ooh_etl_spark.queries.streaming import q122_stream_transform_with_state
    from tests.conftest import SF_DIR

    out = q122_stream_transform_with_state(spark, SF_DIR)
    assert out.count() > 0


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restart-from-checkpoint is the exactly-once contract: a
    stateful stream (dropDuplicates on event_id) is stopped and
    RESTARTED against a landing dir that re-delivers every record;
    the checkpointed dedup state must suppress all of them — the
    sink row count cannot move. This is the recovery path a 100 TB
    pipeline exercises on every executor loss or deploy."""
    import shutil

    from ooh_etl_spark.tables import table_path

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src = table_path(SF_DIR, "events")
    shutil.copy(src, landing / "batch_a.parquet")

    schema = spark.read.parquet(str(landing)).schema

    def start():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .load(str(landing))
            .select("event_id", "user_id", "event_type")
            .dropDuplicates(["event_id"])
        )

        def sink(batch_df, epoch_id: int) -> None:
            batch_df.write.mode("append").parquet(out)

        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    n_expected = spark.read.parquet(src).select("event_id").distinct().count()
    assert spark.read.parquet(out).count() == n_expected

    # Redeliver every record under a new file name, restart from the
    # SAME checkpoint: state must recover and emit nothing new.
    shutil.copy(src, landing / "batch_b_redelivery.parquet")
    q = start()
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == n_expected
    assert got.select("event_id").distinct().count() == n_expected


def test_occupation_stream_replay_between_offsets(spark):
    """The streaming source's recovery contract: readBetweenOffsets
    must reproduce exactly the rows the live read() emitted for the
    same offset range (pure-function-of-id determinism — what makes
    checkpoint replay exactly-once)."""
    from ooh_etl_spark.sources.pysource import OccupationStreamReader

    r = OccupationStreamReader({"numrecords": "50", "batchsize": "20"})
    live, off1 = r.read(r.initialOffset())
    live = list(live)
    assert off1 == {"i": 20} and len(live) == 20
    replay = list(r.readBetweenOffsets({"i": 0}, {"i": 20}))
    assert replay == live
    # tail batch is clamped at numrecords, then the stream goes quiet
    rows2, off2 = r.read({"i": 40})
    assert off2 == {"i": 50} and len(list(rows2)) == 10
    rows3, off3 = r.read({"i": 50})
    assert off3 == {"i": 50} and list(rows3) == []
