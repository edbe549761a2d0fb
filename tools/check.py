"""Local mirror of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01, compares row count, sorted column names, and an
order-insensitive canonical value hash. Stricter than any reasonable
driver hash: values are canonicalized to strings (floats via repr after
round-trip) and must match exactly.

Usage: python tools/check.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, len(rows)


def main() -> int:
    import __spark_entry__ as e
    from stockpy_spark.session import get_spark

    only = set(sys.argv[1:])
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    spark = get_spark("check")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            # Guard (round-2 lesson): DuckDB HUGEINT (sum of ints) and
            # DECIMAL aggregates hash differently from Spark's
            # bigint/double at the driver even when values are
            # bit-identical. Our str() canonicalization masks that, so
            # reject the TYPES outright — oracles must emit
            # BIGINT/DOUBLE/VARCHAR/DATE/TIMESTAMP-class columns only.
            bad_types = [
                f"{c}:{t}"
                for c, t in zip(dcols, (str(t) for t in rel.types))
                if "HUGEINT" in t or t.startswith("DECIMAL")
            ]
            if bad_types:
                print(
                    f"FAIL  {name}: oracle emits driver-hostile types "
                    f"{bad_types} — CAST to BIGINT/DOUBLE in the SQL"
                )
                failures.append(name)
                continue
            drows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        sh, sn = canon_rows(scols, srows)
        dh, dn = canon_rows(dcols, drows)
        schema_ok = sorted(scols) == sorted(dcols)
        if sn == dn and schema_ok and sh == dh:
            print(f"ok    {name}: {sn} rows match ({time.time()-t0:.1f}s)")
        else:
            print(
                f"FAIL  {name}: rows {sn} vs {dn}, schema_ok={schema_ok} "
                f"(spark {sorted(scols)} vs duck {sorted(dcols)}), hash {'=' if sh==dh else '!='}"
            )
            if sn == dn and schema_ok:
                # show first differing canonical line
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("\x1f".join(canon_cell(r[i]) for i in order_s) for r in srows)
                ld = sorted("\x1f".join(canon_cell(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ls, ld):
                    if a != b:
                        print(f"      spark: {a.replace(chr(31), ' | ')}")
                        print(f"      duck : {b.replace(chr(31), ' | ')}")
                        break
            failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
