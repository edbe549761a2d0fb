"""Fault-injection proof for reliable pin mode (r13 judge item #4).

The r13 sweep proved reliable-mode CORRECTNESS (254/254 hash-green
under ``STOCKPY_PIN_MODE=reliable``); nothing had ever actually LOST
an executor mid-query. This test runs a pin-heavy registry query on
``local-cluster[2,2,2048]`` (real executor JVMs, real block loss —
local[*] cannot lose an executor), SIGKILLs every executor after the
eager pins have materialized, and asserts a FRESH execution of the
same logical plan still completes with the identical result: the
checkpointed blocks are re-read from the durable checkpoint dir by
the respawned executors. The fresh QueryExecution matters: the first
probe draft re-collected the SAME DataFrame object and both modes
"survived", because a Dataset memoizes its physical plan and the
BroadcastExchange futures already held the pinned rows on the driver
— the blocks were never re-read. ``q.where(lit(True))`` forces new
physical planning over the same pinned LogicalRDD/checkpoint nodes.

The CONTRAST case pins the same query in local (localCheckpoint) mode
on the same cluster shape: the pinned blocks live only on executor
storage with lineage truncated, so after the kill the re-collect must
FAIL (Spark cannot recompute a truncated lineage) — proving the kill
actually destroys state and the reliable-mode survival is the
checkpoint's doing, not a lucky block placement.

Each case runs in a subprocess (a second SparkSession with a
different master cannot share the test session's JVM); if the
local-cluster master cannot even start in this environment the test
SKIPS rather than fails (the CLUSTER_UP sentinel distinguishes
environment trouble from a genuine regression).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = r"""
import os, signal, subprocess, sys, time

sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

tmp = sys.argv[1]
spark = (
    SparkSession.builder.master("local-cluster[2,2,2048]")
    .config("spark.stockpy.pin.mode", {mode!r})
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir(os.path.join(tmp, "ckpt"))
print("CLUSTER_UP", flush=True)

from pyspark.sql import functions as F

from stockpy_spark.registry import QUERIES

# pin-heavy query: feat_target_encode pins its global-prior census and
# cell table eagerly at plan-build time
q = QUERIES["feat_target_encode"](spark, "/root/testdata/sf0.001")
rows0 = sorted(map(tuple, q.collect()))
print("PINNED_AND_COLLECTED", len(rows0), flush=True)

# kill exactly THIS app's executor JVMs (ps can see orphans of earlier
# local-cluster runs)
app_id = spark.sparkContext.applicationId
out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True, text=True).stdout
pids = [
    int(line.split(None, 1)[0])
    for line in out.splitlines()
    if "CoarseGrainedExecutorBackend" in line and app_id in line
]
assert pids, "no executor JVMs found — not actually a local-cluster run"
for p in pids:
    os.kill(p, signal.SIGKILL)
print("KILLED", len(pids), flush=True)
time.sleep(5)  # let the master register the loss / respawn executors

# a FRESH QueryExecution over the SAME logical plan (same pinned
# RDD nodes): re-collecting q itself would reuse its memoized
# physical plan, whose BroadcastExchange futures already hold the
# pinned rows on the driver — that path never re-reads the blocks
# and survives in every mode (measured — see test docstring).
q2 = q.where(F.lit(True))
rows1 = sorted(map(tuple, q2.collect()))
assert rows0 == rows1, "post-kill result diverged from pre-kill result"
print("SURVIVED", len(rows1), flush=True)
"""


def _run_case(tmp_path, mode: str) -> subprocess.CompletedProcess:
    script = _COMMON.format(repo=REPO, mode=mode)
    return subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / mode)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )


def test_reliable_pin_survives_executor_kill(tmp_path):
    try:
        r = _run_case(tmp_path, "reliable")
    except subprocess.TimeoutExpired:
        pytest.skip("local-cluster run timed out in this environment")
    if "CLUSTER_UP" not in r.stdout:
        pytest.skip(
            "local-cluster master unavailable here: "
            + (r.stderr or "")[-400:]
        )
    assert "KILLED" in r.stdout, (r.stdout, r.stderr[-2000:])
    assert "SURVIVED" in r.stdout, (r.stdout, r.stderr[-2000:])


def test_local_pin_contrast_dies_with_executors(tmp_path):
    """The kill must actually destroy state: with localCheckpoint pins
    the same procedure cannot complete (truncated lineage, blocks gone
    with the executors)."""
    try:
        r = _run_case(tmp_path, "local")
    except subprocess.TimeoutExpired:
        pytest.skip("local-cluster run timed out in this environment")
    if "CLUSTER_UP" not in r.stdout:
        pytest.skip(
            "local-cluster master unavailable here: "
            + (r.stderr or "")[-400:]
        )
    assert "KILLED" in r.stdout, (r.stdout, r.stderr[-2000:])
    assert "SURVIVED" not in r.stdout, (
        "local-mode pins survived an executor wipe — either the kill "
        "missed or localCheckpoint semantics changed",
        r.stdout,
    )
