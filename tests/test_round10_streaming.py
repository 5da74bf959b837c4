"""Checkpoint recovery of applyInPandasWithState keyed state — the one
restart path the streaming matrix didn't yet pin (file-source offsets,
the MERGE sink, and stream-stream join state have had crash tests
since r4-r6; the KEYED state store behind the stateful operators did
not). Protocol: run 1 consumes a prefix of the slices and terminates
(availableNow) with marker/bin state in the checkpoint; more slices
land; run 2 resumes from the SAME checkpoint and must produce the
settled answer of the uninterrupted stream — bit-exactly for P²
(whose estimate is a pure fold of the full ordered stream, so any
state loss changes it), and batch-equal for the packing fold."""

from __future__ import annotations

import os

from pyspark.sql import Window, functions as F

from dumbo_spark.streaming.runners import _stamp_replay_order


def _run_ckpt(spark, stream_df, out_dir, ckpt):
    # parquet sink, NOT memory: the memory sink refuses checkpoint
    # recovery ("this query does not support recovering..."), and the
    # whole point here is resuming keyed state — both runs append to
    # the same directory through the same checkpoint
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_p2_marker_state_recovers_from_checkpoint(spark, tmp_path):
    from dumbo_spark.streaming.stateful import p2_quantile_stream
    from tests.test_round10_ops import _p2_python_fold

    vals = [((i * 48271) % 997) / 10.0 for i in range(210)]
    rows = [(i, "t", float(v), i * 1000) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts_us long"
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src)

    def write_slice(k, lo, hi):
        d = os.path.join(src, f"slice{k}.parquet")
        df.where((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        _stamp_replay_order(d, k)

    def stream():
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )

    # run 1: only the first 70 observations exist — markers initialize
    # and advance, then the query terminates with state checkpointed
    write_slice(0, 0, 70)
    emitted1 = _run_ckpt(
        spark, p2_quantile_stream(stream()), out_dir, ckpt
    ).collect()
    assert max(r["n_seen"] for r in emitted1) == 70

    # the rest of the stream lands; run 2 resumes from the checkpoint
    write_slice(1, 70, 140)
    write_slice(2, 140, 210)
    emitted2 = _run_ckpt(
        spark, p2_quantile_stream(stream()), out_dir, ckpt
    ).collect()

    settled = max(emitted2, key=lambda r: r["n_seen"])
    assert settled["n_seen"] == 210
    # BIT-exact vs the uninterrupted single-pass fold: lost or
    # re-initialized marker state cannot reproduce this
    assert settled["p2_estimate"] == _p2_python_fold(vals)


def test_p2_short_first_batch_state_recovers(spark, tmp_path):
    # ADVICE r10 high: when the FIRST micro-batch holds < 5 rows the
    # state tuple pads q with 0.0 up to 5 slots; the restore used to
    # read all 5 back, so the zeros became phantom observations (3-row
    # first batch -> est 30.44 vs correct 34.01, len(q)==7). Pin the
    # pre-init restore path: 3 rows, checkpoint, then the rest — the
    # settled estimate must be BIT-exact vs the uninterrupted fold.
    from dumbo_spark.streaming.stateful import p2_quantile_stream
    from tests.test_round10_ops import _p2_python_fold

    vals = [((i * 48271) % 997) / 10.0 + 20.0 for i in range(60)]
    rows = [(i, "t", float(v), i * 1000) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts_us long"
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src)

    def write_slice(k, lo, hi):
        d = os.path.join(src, f"slice{k}.parquet")
        df.where((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        _stamp_replay_order(d, k)

    def stream():
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )

    # run 1: only 3 observations — markers NOT yet initialized; the
    # checkpointed state carries 3 real values + 2 padding zeros
    write_slice(0, 0, 3)
    emitted1 = _run_ckpt(
        spark, p2_quantile_stream(stream()), out_dir, ckpt
    ).collect()
    assert max(r["n_seen"] for r in emitted1) == 3

    write_slice(1, 3, 60)
    emitted2 = _run_ckpt(
        spark, p2_quantile_stream(stream()), out_dir, ckpt
    ).collect()
    settled = max(emitted2, key=lambda r: r["n_seen"])
    assert settled["n_seen"] == 60
    assert settled["p2_estimate"] == _p2_python_fold(vals)


def test_packing_open_bin_state_recovers_from_checkpoint(spark, tmp_path):
    from dumbo_spark.operators.packing import greedy_pack_bins
    from dumbo_spark.streaming.stateful import greedy_packing_stream

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * ((i * 37) % 90)), "s") for i in range(120)],
        "doc_id long, text string, source string",
    )
    from dumbo_spark.operators.packing import _doc_perm

    perm = _doc_perm(docs, buckets=2)
    w = F.row_number().over(
        Window.partitionBy("source", "bucket").orderBy("_k", "doc_id")
    )
    cnt = F.count("*").over(Window.partitionBy("source", "bucket"))
    sliced = perm.withColumn("_sl", F.floor((w - 1) * 3 / cnt).cast("int"))
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src)
    schema = "source string, bucket int, _k string, doc_id long, n_tokens int"

    def write_slice(k):
        d = os.path.join(src, f"slice{k}.parquet")
        sliced.where(F.col("_sl") == k).select(
            "source", "bucket", "_k", "doc_id", "n_tokens"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        _stamp_replay_order(d, k)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )

    write_slice(0)
    out1 = _run_ckpt(
        spark, greedy_packing_stream(stream()), out_dir, ckpt
    ).collect()
    assert out1  # run 1 emitted open-bin snapshots
    write_slice(1)
    write_slice(2)
    out2 = _run_ckpt(
        spark, greedy_packing_stream(stream()), out_dir, ckpt
    ).collect()

    settled: dict = {}
    for r in out2:
        key = (r["source"], r["bucket"], r["bin_id"])
        cur = settled.get(key, (0, 0))
        settled[key] = (max(cur[0], r["n_docs"]), max(cur[1], r["bin_tokens"]))
    batch = {
        (r["source"], r["bucket"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in greedy_pack_bins(docs, buckets=2).collect()
    }
    assert settled == batch  # open-bin state carried THROUGH the restart
