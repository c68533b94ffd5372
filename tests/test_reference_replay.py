"""Reference-replay tests (SURVEY.md §5 strategy item 2).

The reference's de-facto test suite is its executed notebooks: recorded
outputs of SQL over the 49,990-row ticket-`users` table (SURVEY.md §5's
golden table). The real CSV isn't reachable here, so these tests rebuild a
users-SHAPED fixture per FIXTURES.md §1 — same 18-column schema, same
49,990 rows, deterministic content — run the exact notebook queries
through the engine, and differentially check every result against DuckDB
on the identical data (DuckDB *is* the reference's execution engine, so
this replays reference semantics end-to-end):

- A1 ungrouped COUNT(*)                 (query_iceberg.ipynb:368)
- A2+O1+O3 state histogram top-10       (query_iceberg.ipynb:798-802)
- A3 10-branch UNION ALL fan-out        (query_iceberg.ipynb:914-933)
- P5 conjunctive filter sports∧jazz     (query_iceberg.ipynb:1096)
- S9 WA-users export selection          (query_iceberg.ipynb:1332-1336)
- J1 users⋈netflix_titles              (blog part-3:338-343)
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

import pyspark.sql.functions as F

N_USERS = 49_990

STATES = [
    "AB", "BC", "MB", "NB", "NL", "NS", "NT", "PE", "QC", "SK", "YT",
    "WA", "OR", "CA", "NV", "ID", "MT", "WY", "UT", "AZ", "CO", "NM",
    "TX", "OK", "KS", "NE", "SD", "ND", "MN", "IA", "MO", "AR", "LA",
    "WI", "IL", "MI", "IN", "OH", "KY", "TN", "MS", "AL", "GA", "FL",
    "SC", "NC", "VA", "WV", "MD", "DE", "NJ", "PA", "NY", "CT", "RI",
    "MA", "VT", "NH", "ME",
]

PREF_COLS = [
    "likesports", "liketheatre", "likeconcerts", "likejazz",
    "likeclassical", "likeopera", "likerock", "likevegas",
    "likebroadway", "likemusicals",
]


def _h(uid: int, field: str) -> int:
    """Deterministic per-(row, column) integer — stable fixture content."""
    d = hashlib.md5(f"{uid}:{field}".encode()).digest()
    return int.from_bytes(d[:8], "big")


@pytest.fixture(scope="module")
def users_pdf() -> pd.DataFrame:
    uids = range(1, N_USERS + 1)
    alnum = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    rows = {
        "userid": list(uids),
        "username": [
            "".join(alnum[_h(u, f"un{i}") % len(alnum)] for i in range(8))
            for u in uids
        ],
        "firstname": [f"First{_h(u, 'fn') % 500}" for u in uids],
        "lastname": [f"Last{_h(u, 'ln') % 2000}" for u in uids],
        "city": [f"City{_h(u, 'ci') % 300}" for u in uids],
        "state": [STATES[_h(u, "st") % len(STATES)] for u in uids],
        "email": [f"user{u}@example{_h(u, 'em') % 50}.com" for u in uids],
        "phone": [f"({_h(u, 'p1') % 900 + 100}) 555-{_h(u, 'p2') % 10000:04d}"
                  for u in uids],
    }
    for c in PREF_COLS:
        # likesports ~17.4% true (8,682/49,990 in the reference); others ~25%
        threshold = 174 if c == "likesports" else 250
        rows[c] = [(_h(u, c) % 1000) < threshold for u in uids]
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def users_env(spark, users_pdf):
    sdf = spark.createDataFrame(users_pdf)
    sdf.createOrReplaceTempView("ru_users")
    titles = users_pdf.rename(columns={"userid": "show_id"}).copy()
    titles["title"] = [f"Title {i}" for i in titles["show_id"]]
    spark.createDataFrame(titles).createOrReplaceTempView("ru_titles")
    con = duckdb.connect()
    con.register("users", users_pdf)
    con.register("netflix_titles", titles)
    return spark, con


def _rows(df) -> set[tuple]:
    return {tuple(map(str, r)) for r in df}


def test_a1_count_star(users_env):
    spark, con = users_env
    got = spark.table("ru_users").agg(F.count("*").alias("total_users")).collect()
    want = con.execute("SELECT COUNT(*) AS total_users FROM users").fetchall()
    assert got[0][0] == want[0][0] == N_USERS


def test_a2_state_histogram_top10(users_env):
    spark, con = users_env
    got = (
        spark.table("ru_users")
        .groupBy("state")
        .agg(F.count("*").alias("user_count"))
        .orderBy(F.desc("user_count"), F.asc("state"))
        .limit(10)
        .collect()
    )
    want = con.execute(
        """SELECT state, COUNT(*) AS user_count FROM users
           GROUP BY state ORDER BY user_count DESC, state LIMIT 10"""
    ).fetchall()
    assert [(r[0], r[1]) for r in got] == want


def test_a3_preference_fanout(users_env):
    spark, con = users_env
    from functools import reduce

    u = spark.table("ru_users")
    branches = [
        u.filter(F.col(c)).agg(F.count("*").alias("count")).select(
            F.lit(c[4:].capitalize()).alias("preference"), "count"
        )
        for c in PREF_COLS
    ]
    got = reduce(lambda a, b: a.unionAll(b), branches).collect()
    want = con.execute(
        " UNION ALL ".join(
            f"SELECT '{c[4:].capitalize()}' AS preference, COUNT(*) AS count "
            f"FROM users WHERE {c} = true"
            for c in PREF_COLS
        )
    ).fetchall()
    assert _rows(got) == _rows(want)
    # reference property: Sports is the rarest preference (8,682 vs ~12.5k)
    counts = dict((r[0], r[1]) for r in got)
    assert counts["Sports"] == min(counts.values())


def test_p5_sports_and_jazz(users_env):
    spark, con = users_env
    got = (
        spark.table("ru_users")
        .filter(F.col("likesports") & F.col("likejazz"))
        .select("userid", "username", "state")
        .collect()
    )
    want = con.execute(
        """SELECT userid, username, state FROM users
           WHERE likesports = true AND likejazz = true"""
    ).fetchall()
    assert _rows(got) == _rows(want) and len(got) > 0


def test_s9_wa_export_selection(users_env):
    spark, con = users_env
    got = (
        spark.table("ru_users")
        .filter(F.col("state") == "WA")
        .select("userid", "username", "firstname", "lastname", "city",
                "state", "email")
        .collect()
    )
    want = con.execute(
        """SELECT userid, username, firstname, lastname, city, state, email
           FROM users WHERE state = 'WA'"""
    ).fetchall()
    assert _rows(got) == _rows(want) and len(got) > 0


def test_j1_users_titles_join(users_env):
    spark, con = users_env
    u = spark.table("ru_users").alias("u")
    n = spark.table("ru_titles").alias("n")
    got = (
        u.join(n, F.col("u.userid") == F.col("n.show_id"), "inner")
        .select("u.userid", "u.username", "n.title")
        .orderBy("u.userid")
        .limit(10)
        .collect()
    )
    want = con.execute(
        """SELECT u.userid, u.username, n.title
           FROM users u JOIN netflix_titles n ON u.userid = n.show_id
           ORDER BY u.userid LIMIT 10"""
    ).fetchall()
    assert _rows(got) == _rows(want) and len(got) == 10
