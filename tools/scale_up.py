"""Synthesize a larger SF from the driver testdata by unioning key-shifted
copies — for local scale spot-checks (BASELINE.md §3).

Usage: python tools/scale_up.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch_sf1

Every copy i shifts each table's surrogate keys by i*OFFSET with the SAME
offset on both sides of every foreign key, so join fan-outs and group
cardinalities scale linearly like a real larger SF would: 10x orders join
10x lineitem on shifted orderkeys, each user's event stream stays a
single user's stream (user_id shifted), ANN query set stays fixed
(vec_id < 5 exists only in copy 0) while the corpus grows 10x. Document
texts get a per-copy suffix and embedding vectors a small deterministic
per-copy jitter so dedup/similarity keep an sf-like duplicate/pair
profile instead of every doc (or vector) having exactly `factor`
cosine-1.0 clones — byte-identical copies would make pair counts grow
~factor^2, not linearly. Dims (nation, region) are copied once — they
are fixed-size in TPC-H scaling too.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockpy_spark.session import get_spark
from stockpy_spark.sources.testdata import read_events

OFFSET = 100_000_000

# table -> columns to shift by copy_index * OFFSET
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["nation", "region"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scratch_sf1"
    spark = get_spark("scale_up")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for name in COPY_ONCE:
        out = f"{dst}/{name}.parquet"
        shutil.rmtree(out, ignore_errors=True)
        spark.read.parquet(f"{src}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(out)

    for name, keys in SHIFTS.items():
        base = (
            read_events(spark, src)
            if name == "events"
            else spark.read.parquet(f"{src}/{name}.parquet")
        )
        # COMPOSITION GUARD (r13): scaling an ALREADY-SCALED dir
        # re-applies the same i*OFFSET shifts, and (i+j) sums collide —
        # .scratch_sf10 built as scale_up(10, .scratch_sf1) had only
        # 2.85M distinct o_orderkey in 15M orders rows, silently
        # inflating every keyed join's fan-out ~5x and poisoning the
        # sf10 decade ratios recorded in r11/r12. Always scale from
        # the PRISTINE sf0.1 with the full factor.
        mx = base.agg(F.max(F.col(keys[0]))).collect()[0][0]
        if mx is not None and int(mx) >= OFFSET:
            raise SystemExit(
                f"scale_up: {name}.{keys[0]} max={mx} >= OFFSET={OFFSET} — "
                f"'{src}' looks already scaled; re-run from the pristine "
                "driver testdata (composed shifts collide on i+j sums)"
            )
        copies = []
        for i in range(factor):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast("long"))
            if name == "documents" and i > 0:
                # keep a realistic dup profile: true dups stay dups
                # within each copy, but copies aren't clones of each other
                c = c.withColumn(
                    "text", F.concat_ws(" ", F.col("text"), F.lit(f"c{i}"))
                )
            if name == "embeddings" and i > 0:
                # same rationale for vectors: a byte-identical copy would
                # give every vector factor-1 cosine-1.0 clones, making
                # pair counts grow ~factor^2 instead of ~linearly like a
                # real larger SF. Deterministic per-copy jitter (keyed on
                # vec_id and element index) breaks the clones while
                # keeping vectors close to their originals.
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x
                            + F.lit(0.05)
                            * F.sin(
                                (F.col("vec_id") % F.lit(997)).cast("double")
                                * (j + F.lit(1)).cast("double")
                                * F.lit(float(i))
                            )
                        ).cast("float"),
                    ),
                )
            copies.append(c)
        union = copies[0]
        for c in copies[1:]:
            union = union.unionByName(c)
        out = f"{dst}/{name}.parquet"
        shutil.rmtree(out, ignore_errors=True)
        union.write.mode("overwrite").parquet(out)
        print(f"{name}: {factor}x written")


if __name__ == "__main__":
    main()
