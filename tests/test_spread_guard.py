"""Pins for the payload-generator single-split guard
(operators/multimodal.py ``_spread_small_input``) — the r15 lesson
pair. (1) A small batch input is spread to defaultParallelism so
per-row codec CPU parallelizes instead of serializing onto the one
task a single parquet split yields. (2) An input whose plan already
carries an explicit SHUFFLE repartition is returned AS-IS, by object
identity: under AQE the ``.rdd`` partition-count probe MATERIALIZES
any shuffle already in the plan, so probing a pre-repartitioned input
executes its shuffle as a throwaway probe job and the bytes get paid
twice (the bench shuffle ledger caught exactly this as a 2x entry on
an 'untouched' query). (3) A coalesce also prints as a Repartition
node (``Repartition 1, false``) but must NOT skip — it narrows the
input and carries no shuffle for the probe to materialize. (4)
Streaming frames pass through untouched (``.rdd`` raises on streaming
plans; the micro-batch engine sizes their partitions)."""

from __future__ import annotations

from tests.conftest import SF_DIR

from stockpy_spark.operators.multimodal import _spread_small_input


def _single_split_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    # precondition for the spread tests: the small file reads as fewer
    # splits than cores (if the driver ever regenerates testdata with
    # many row groups, these tests need a different small fixture)
    assert (
        docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    )
    return docs


def test_small_batch_input_spreads_to_default_parallelism(spark):
    out = _spread_small_input(_single_split_docs(spark))
    assert (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_pre_repartitioned_input_returned_by_identity(spark):
    pre = _single_split_docs(spark).repartition(
        spark.sparkContext.defaultParallelism
    )
    assert _spread_small_input(pre) is pre


def test_repartition_by_expression_returned_by_identity(spark):
    pre = _single_split_docs(spark).repartition(2, "doc_id")
    assert _spread_small_input(pre) is pre


def test_coalesce_does_not_false_skip(spark):
    one = spark.range(0, 100, 1, 4).coalesce(1)
    out = _spread_small_input(one)
    assert (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_streaming_frame_passes_through(spark):
    stream = spark.readStream.format("rate").load()
    assert _spread_small_input(stream) is stream
