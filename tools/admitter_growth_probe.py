"""Standing-index growth probe for the streaming MinHash admitter
(round-13 task: r12 verdict "What's wrong" #2 / Next #3).

The r12 finding: the admitter re-read and re-``distinct()``ed the FULL
standing admission index every micro-batch — an O(index) term growing
linearly with corpus age, the one unbounded growth term left in the
corpus. The r13 rework bounds it with bloom-sidecar pre-screens plus a
prefix-partitioned index layout (streaming/ops.py docstring).

This probe measures exactly that term: it builds standing indexes at
1x/4x/16x synthetic corpus sizes and, for EACH size, drains one
identical mostly-novel wave through the admitter in BOTH layouts —
``bounded`` (the r13 default) and ``legacy`` (a hand-seeded pre-r13
flat state dir, which the admitter still serves via its fallback path
— conveniently, the fallback IS the old O(index) code path). The
admitted sets are asserted identical across layouts at every size.

Expected shape: legacy wall grows ~linearly with index size; bounded
wall stays ~flat (the wave's suspect set, not the index, drives its
cost). One JSON line: per-size wall seconds for both layouts, the
16x/1x growth ratios, and the parity verdict.

Usage: python tools/admitter_growth_probe.py [base_n] [wave_n]
Defaults: base_n=12500 (so sizes are 12.5k/50k/200k docs), wave_n=2000.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from stockpy_spark.session import get_spark


def synth_corpus(spark, n, salt):
    """n unique short documents — distinct token sets so no two are
    minhash dups (each doc carries its own id tokens)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit(salt),
            F.col("id").cast("string"),
            F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))),
            F.md5(F.concat(F.lit(salt + "2"), F.col("id").cast("string"))),
        ).alias("text"),
    )


def write_wave(spark, df, landing):
    import glob

    os.makedirs(landing, exist_ok=True)
    tmp = os.path.join(landing, "__w0")
    df.coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(landing, "batch-0.parquet"))
    shutil.rmtree(tmp)


def seed_legacy(spark, corpus, state):
    """Hand-seed the pre-r13 flat layout so the admitter's fallback
    (the old O(index) path) serves it."""
    from stockpy_spark.operators.dedup import corpus_dedup_keys

    fps, keys = corpus_dedup_keys(corpus, "text", "doc_id")
    fps.withColumn("batch_id", F.lit(-1)).write.parquet(
        os.path.join(state, "fps")
    )
    keys.withColumn("batch_id", F.lit(-1)).write.parquet(
        os.path.join(state, "keys")
    )
    with open(os.path.join(state, "_SEED_COMPLETE"), "w") as fh:
        fh.write("seeded")


def run_once(spark, corpus, wave_df, root, layout):
    from stockpy_spark.streaming.ops import run_incremental_minhash_admitter

    state = os.path.join(root, f"state_{layout}")
    landing = os.path.join(root, f"landing_{layout}")
    ckpt = os.path.join(root, f"ckpt_{layout}")
    write_wave(spark, wave_df, landing)
    if layout == "legacy":
        os.makedirs(state, exist_ok=True)
        seed_legacy(spark, corpus, state)
    else:
        from stockpy_spark.streaming.ops import seed_admission_state

        skw = {}
        mb = os.environ.get("ADM_PROBE_M_BITS")
        if mb:
            skw["bloom_m_bits"] = int(mb)
        seed_admission_state(spark, corpus, "text", "doc_id", state, **skw)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    # both layouts are seeded ABOVE this line: the timer below sees
    # only the per-batch drain — exactly the O(index) term under test
    t0 = time.time()
    import os as _os
    kw = {"full_scan_below_bytes": 0}  # force the screened mechanics
    mb = _os.environ.get("ADM_PROBE_M_BITS")
    if mb:
        kw["bloom_m_bits"] = int(mb)
    admitted = run_incremental_minhash_admitter(
        spark, stream, corpus, "text", "doc_id", state, ckpt, **kw
    )
    ids = sorted(r.doc_id for r in admitted.collect())
    wall = time.time() - t0
    return wall, ids


def main():
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500
    wave_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark("admitter_growth_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"probe": "admitter_growth", "base_n": base_n, "wave_n": wave_n,
           "sizes": {}}
    parity_ok = True
    walls = {"bounded": {}, "legacy": {}}
    for mult in (1, 4, 16):
        n = base_n * mult
        corpus = synth_corpus(spark, n, "corp")
        # wave: mostly novel + a few dups of the corpus (suspect path)
        wave = synth_corpus(spark, wave_n, "wave").withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
        dups = corpus.limit(20).withColumn(
            "doc_id", F.col("doc_id") + 20_000_000
        )
        wave_df = wave.unionByName(dups)
        sets = {}
        for layout in ("bounded", "legacy"):
            root = tempfile.mkdtemp(prefix=f"admprobe_{mult}_{layout}_")
            try:
                wall, ids = run_once(spark, corpus, wave_df, root, layout)
            finally:
                shutil.rmtree(root, ignore_errors=True)
            walls[layout][mult] = round(wall, 2)
            sets[layout] = ids
        parity_ok = parity_ok and sets["bounded"] == sets["legacy"]
        out["sizes"][f"{mult}x"] = {
            "index_docs": n,
            "bounded_s": walls["bounded"][mult],
            "legacy_s": walls["legacy"][mult],
            "admitted": len(sets["bounded"]),
        }
    out["bounded_growth_16x_over_1x"] = round(
        walls["bounded"][16] / walls["bounded"][1], 2
    )
    out["legacy_growth_16x_over_1x"] = round(
        walls["legacy"][16] / walls["legacy"][1], 2
    )
    out["admitted_sets_identical"] = parity_ok
    print(json.dumps(out))


if __name__ == "__main__":
    main()
