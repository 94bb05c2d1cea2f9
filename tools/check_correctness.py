"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given SF, then compares row count, column names, and
an order-insensitive value multiset (exact on ints/strings/bools/
dates; floats compared via repr after round(12)).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 12))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return repr(v)


def row_key(row, cols):
    d = dict(zip(cols, row))
    return tuple(norm(d[c]) for c in sorted(cols))


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from deftunes_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {exc}")
            continue
        if name not in oracles:
            # The driver's canonicalizer pandas-sorts every output and
            # crashes on nested columns (r9: bpe_encode's array<int>
            # shipped an ERR artifact while this checker passed it —
            # the stand-in must never be MORE permissive than the hard
            # signal it stands in for). Rows-only outputs must be flat.
            nested = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "struct", "map")
            ]
            if nested:
                failures.append(name)
                print(
                    f"FAIL {name}: rows-only output has "
                    f"non-canonicalizable column(s) {nested} — the "
                    "driver rejects array/struct/map; project to "
                    "scalars (hash/CSV-join the nested column)"
                )
                continue
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error {exc}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={scols} oracle={ocols}")
        else:
            sm = Counter(row_key(r, scols) for r in srows)
            om = Counter(row_key(r, ocols) for r in orows)
            if sm != om:
                diff = (sm - om) + (om - sm)
                sample = list(diff.items())[:3]
                problems.append(f"value mismatch, e.g. {sample}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    from deftunes_spark.ext.multimodal import codec_mode

    # Two codec facts, kept distinct (r11 verdict #8): the multimodal
    # ORACLE queries here always run the deterministic-fake branch
    # (the only one a DuckDB SQL twin can mirror); real_codec names
    # the tier whose fake_*=False branch pytest verified this build
    # (pillow, or the vendored pnm-builtin where Pillow is absent).
    codec = codec_mode()
    print(
        f"\n{len(failures)} failures out of "
        f"{len([q for q in qs if not only or q in only])} checked "
        f"(oracle_image_codec=deterministic-fake, real_codec={codec})"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
