"""Mimic the driver's DuckDB-oracle comparison for every registry query.

For each entry in arhivum_spark.queries.REGISTRY with an oracle SQL: run the
Spark query and the DuckDB SQL at sf0.01, sort columns by name, sort rows,
and compare values — catching any mismatch before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from arhivum_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE_DIR}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                v = bool(v)
            elif isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
                if math.isnan(v):
                    v = "nan"
            elif isinstance(v, int):
                v = int(v)
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize(
    "name", [n for n, (_f, sql) in REGISTRY.items() if sql is not None]
)
def test_query_matches_oracle(spark, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_ORACLE_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert not mism, (
        f"{name}: value mismatch at sorted rows {mism}: "
        f"{[(a[i], b[i]) for i in mism]}"
    )
