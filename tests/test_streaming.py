"""Streaming incremental dedup: micro-batch logic, file-source stream via
availableNow trigger, reconciliation pass."""

import os

import pytest
from pyspark.sql import functions as F

from gaoya_spark.config import MinHashConfig, TokenizerSpec
from gaoya_spark.sources.warehouse import Warehouse
from gaoya_spark.streaming.stream_dedup import StreamingDedup

WORD = TokenizerSpec(kind="word", n_from=1, n_to=1, lowercase=True)
CFG = MinHashConfig(num_bands=42, band_width=3, threshold=0.5, tokenizer=WORD)


def _img_rows(ids_texts):
    return [(i, t, 0) for i, t in ids_texts]


SCHEMA = "image_id long, caption string, phash long"


def test_process_batch_incremental(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sd = StreamingDedup(spark, wh, CFG)

    b0 = spark.createDataFrame(
        _img_rows([(1, "the quick brown fox jumps over the lazy dog"),
                   (2, "totally unrelated text about database engines")]),
        SCHEMA,
    )
    sd.process_batch(b0, 0)
    assert wh.read("stream_signatures").count() == 2
    labels0 = {r["id"]: r["component"] for r in wh.read("stream_labels").collect()}
    assert labels0 == {1: 1, 2: 2}

    # batch 1: near-dup of id 1 arrives -> adopts component 1
    b1 = spark.createDataFrame(
        _img_rows([(3, "the quick brown fox jumps over the lazy cat")]), SCHEMA
    )
    sd.process_batch(b1, 1)
    labels = {r["id"]: r["component"] for r in wh.read("stream_labels").collect()}
    assert labels[3] == 1
    assert wh.read("stream_signatures").count() == 3


def test_process_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch retry semantics: Spark re-runs the same batch_id after
    a mid-batch failure; replaying a batch must not double-append
    signatures/edges/labels (batch_id-partition dynamic overwrite)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sd = StreamingDedup(spark, wh, CFG)
    b0 = spark.createDataFrame(
        _img_rows([(1, "the quick brown fox jumps over the lazy dog"),
                   (2, "the quick brown fox jumps over the lazy cat")]),
        SCHEMA,
    )
    sd.process_batch(b0, 0)
    sigs_once = wh.read("stream_signatures").count()
    edges_once = wh.read("stream_edges").count()
    labels_once = sorted(
        (r["id"], r["component"]) for r in wh.read("stream_labels").collect()
    )
    sd.process_batch(b0, 0)  # replay
    assert wh.read("stream_signatures").count() == sigs_once
    assert wh.read("stream_edges").count() == edges_once
    assert sorted(
        (r["id"], r["component"]) for r in wh.read("stream_labels").collect()
    ) == labels_once


def test_file_stream_available_now(spark, tmp_path):
    src = tmp_path / "incoming"
    os.makedirs(src)
    spark.createDataFrame(
        _img_rows([(10, "alpha beta gamma delta epsilon zeta"),
                   (11, "alpha beta gamma delta epsilon eta")]),
        SCHEMA,
    ).write.parquet(str(src / "f0"))

    wh = Warehouse(spark, str(tmp_path / "wh"))
    sd = StreamingDedup(spark, wh, CFG)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    q = sd.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    labels = {r["id"]: r["component"] for r in wh.read("stream_labels").collect()}
    assert labels == {10: 10, 11: 10}


def test_reconcile_fixes_chains(spark, tmp_path):
    """Incremental labels can split a chain across batches; reconcile
    (batch connected components over streamed edges) must merge it."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sd = StreamingDedup(spark, wh, CFG)
    sd.process_batch(
        spark.createDataFrame(
            _img_rows([(5, "one two three four five six seven eight")]), SCHEMA
        ),
        0,
    )
    sd.process_batch(
        spark.createDataFrame(
            _img_rows([(4, "one two three four five six seven nine")]), SCHEMA
        ),
        1,
    )
    # incremental rule: 4 matched 5 but min(4, comp(5)=5) = 4; 5 keeps 5 —
    # split! reconcile must co-cluster them
    labels = {r["id"]: r["component"] for r in sd.reconcile().collect()}
    assert labels[4] == labels[5] == 4


def test_stateful_first_seen_across_restarts(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: duplicates inside a batch
    and ACROSS separately-triggered runs are dropped — the second
    availableNow run restores group state from the checkpoint."""
    from gaoya_spark.streaming.stateful import first_seen_stream

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"
    os.makedirs(src)
    spark.createDataFrame(
        _img_rows([(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")]),
        SCHEMA,
    ).write.parquet(str(src / "f0"))

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
        q = (
            first_seen_stream(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {(r["image_id"], r["caption"]) for r in spark.read.parquet(str(out)).collect()}
    assert {c for _, c in got} == {"alpha beta", "gamma delta"}
    assert len(got) == 2  # in-batch duplicate (id 2) dropped

    # second file: one replay of a seen caption + one new caption
    spark.createDataFrame(
        _img_rows([(4, "alpha beta"), (5, "epsilon zeta")]), SCHEMA
    ).write.parquet(str(src / "f1"))
    run_once()
    got2 = {(r["image_id"], r["caption"]) for r in spark.read.parquet(str(out)).collect()}
    assert {c for _, c in got2} == {"alpha beta", "gamma delta", "epsilon zeta"}
    assert len(got2) == 3  # id 4's duplicate dropped via RESTORED state
