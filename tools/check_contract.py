"""Mirror of the driver's correctness gate: run every __spark_entry__
query on Spark AND its oracle_sql on DuckDB at sf0.01, compare
row-count + column names + order-insensitive values.

Usage: python tools/check_contract.py [--nulls] [sf_dir] [query ...]

--nulls: before checking, copy sf_dir to a temp dir whose documents
table gains three adversarial rows (NULL text, empty string,
whitespace-only) and run the sweep against THAT — proves every
query/oracle pair agrees on degenerate text, not just on the
well-formed driver fixture (round-5: this sweep found a real ANSI
DIVIDE_BY_ZERO crash in text_features plus three oracle NULL-semantics
divergences).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _doctored_nulls(sf_dir: str) -> str:
    """Copy sf_dir to a temp dir, appending NULL / "" / whitespace-only
    text rows (fresh doc_ids) to the documents table."""
    import glob
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = tempfile.mkdtemp(prefix="sfnulls_")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)
        if name != "documents.parquet":
            shutil.copy(p, os.path.join(dst, name))
            continue
        t = pq.read_table(p)
        cols = {c: t[c].to_pylist() for c in t.column_names}
        template = {c: cols[c][0] for c in t.column_names}
        next_id = max(cols["doc_id"]) + 1
        for off, txt in enumerate((None, "", "   ")):
            row = dict(template, doc_id=next_id + off, text=txt)
            for c in t.column_names:
                cols[c].append(row[c])
        pq.write_table(
            pa.table(
                {c: pa.array(cols[c], t.schema.field(c).type) for c in t.column_names}
            ),
            os.path.join(dst, name),
        )
    return dst


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in idx) for r in rows)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--nulls"]
    nulls = "--nulls" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if nulls:
        sf_dir = _doctored_nulls(sf_dir)
        print(f"nulls-doctored fixture: {sf_dir}")

    import duckdb

    import __spark_entry__ as entry
    from deduplication_spark.session import get_spark

    spark = get_spark(app_name="check_contract", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            esc = p.replace("'", "''")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{esc}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    # a typo'd name on the command line must not green the gate having
    # checked ZERO queries
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        return 1
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        # the driver canonicalizer sorts every column in pandas: a list
        # value raises "unhashable type" and the query records as err —
        # catch array/map outputs here (even for rows-only queries)
        bad = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map")
        ]
        if bad:
            print(f"FAIL  {name}: canonicalizer-unsafe array/map cols {bad}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        if sorted(c.lower() for c in scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rows {len(srows)} vs {len(drows)}")
            ok = False
        else:
            a = _rowset([c.lower() for c in scols], [tuple(r) for r in srows])
            b = _rowset(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: values differ, e.g. {diff}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(srows)} rows, values match")
        else:
            failures += 1
    print(f"\n{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
