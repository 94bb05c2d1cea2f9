from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from deftunes_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="deftunes_wh_")
    s = get_spark(
        "deftunes-tests",
        master="local[4]",
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _uuid36(i: int) -> str:
    h = f"{i:032x}"
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


@pytest.fixture(scope="session")
def songs_landing(spark):
    """All-string songs rows as landed from CSV (FIXTURES.md A1), with
    seeded DQ violations: one short track_id, one NULL song_id, one
    NULL artist_id; duplicated artists for dim dedup."""
    rows = []
    for i in range(20):
        rows.append(
            {
                "track_id": f"TR{i:016d}",
                "song_id": f"SO{i:016d}",
                "artist_id": f"AR{i % 5:016d}",
                "artist_mbid": _uuid36(i % 5),
                "artist_name": f"Artist {i % 5}",
                "title": f"Title {i}",
                "release": f"Album {i % 7}",
                "year": str(1990 + (i % 30)) if i % 11 else "0",
                "duration": f"{120 + i}.5",
                "artist_familiarity": "0.5",
                "artist_hotttnesss": "0.6",
                "track_7digitalid": str(1000 + i),
                "shs_perf": "-1",
                "shs_work": "0",
            }
        )
    rows[3]["track_id"] = "TRSHORT"  # ColumnLength 18 violation
    rows[5]["song_id"] = None  # IsComplete violation
    rows[7]["artist_id"] = None  # IsComplete violation
    return spark.createDataFrame(rows)


@pytest.fixture(scope="session")
def users_landing(spark):
    """users JSON shape (FIXTURES.md A2): positional location array,
    seeded NULLs + duplicate user_ids around the 0.95 threshold."""
    rows = []
    for i in range(100):
        rows.append(
            {
                "user_id": _uuid36(i if i < 96 else 42),  # 4 dups
                "user_lastname": f"Last{i}" if i % 17 else None,
                "user_name": f"Name{i}",
                "user_since": "2019-01-01",
                "user_location": [
                    f"{40 + i % 10}.1",
                    f"-{70 + i % 10}.2",
                    f"City {i % 7}",
                    ["US", "DE", "FR"][i % 3],
                    "UTC",
                ],
            }
        )
    return spark.createDataFrame(rows)


@pytest.fixture(scope="session")
def sessions_landing(spark):
    """sessions JSON shape (FIXTURES.md A3): nested item arrays,
    multi-item sessions (declared-unique session_id violated after
    explode), one price > 2 violation."""
    rows = []
    for i in range(30):
        items = [
            {
                "song_id": f"SO{(i * 3 + j) % 20:016d}",
                "song_name": f"Title {(i * 3 + j) % 20}",
                "artist_id": f"AR{(i + j) % 5:016d}",
                "artist_name": f"Artist {(i + j) % 5}",
                "price": 0.99 + (j % 2),
                "currency": "USD",
                "liked": bool(j % 2),
                "liked_since": "2020-01-15" if j % 2 else None,
            }
            for j in range(1 + i % 3)
        ]
        rows.append(
            {
                "user_id": _uuid36(i % 25),
                "session_id": _uuid36(1000 + i),
                "session_start_time": f"2020-0{1 + i % 3}-{1 + i % 27:02d}T12:{i % 60:02d}:00",
                "user_agent": "Mozilla/5.0",
                "session_items": items,
            }
        )
    rows[4]["session_items"][0]["price"] = 9.99  # ColumnValues <= 2 violation
    from pyspark.sql import types as T

    item = T.StructType(
        [
            T.StructField("song_id", T.StringType()),
            T.StructField("song_name", T.StringType()),
            T.StructField("artist_id", T.StringType()),
            T.StructField("artist_name", T.StringType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("currency", T.StringType()),
            T.StructField("liked", T.BooleanType()),
            T.StructField("liked_since", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("session_id", T.StringType()),
            T.StructField("session_start_time", T.StringType()),
            T.StructField("user_agent", T.StringType()),
            T.StructField("session_items", T.ArrayType(item)),
        ]
    )
    return spark.createDataFrame(
        [
            (
                r["user_id"],
                r["session_id"],
                r["session_start_time"],
                r["user_agent"],
                [tuple(i[f.name] for f in item.fields) for i in r["session_items"]],
            )
            for r in rows
        ],
        schema,
    )


@pytest.fixture()
def tmp_ingest_date() -> str:
    return dt.date(2020, 3, 1).isoformat()
