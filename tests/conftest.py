from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from kafkastreams_tp3_is_spark.schemas import TESTDATA_TABLES
from kafkastreams_tp3_is_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
          "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


@pytest.fixture(scope="session")
def planted_docs(spark):
    """40 random docs + 5 near-dup copies (one word changed) + 1 exact dup.
    Planted pairs: (i, 100+i) for i in 0..4, and (5, 200). Shared by the
    dedup-recall and duplicate-clustering suites."""
    import random
    rng = random.Random(7)
    base = [" ".join(rng.choice(_WORDS) for _ in range(80)) for _ in range(40)]
    rows = [(i, t) for i, t in enumerate(base)]
    for i in range(5):
        words = base[i].split()
        words[17] = "zulu"  # one token changed -> jaccard/simhash near-dup
        rows.append((100 + i, " ".join(words)))
    rows.append((200, base[5]))  # exact duplicate
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, {(i, 100 + i) for i in range(5)} | {(5, 200)}


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver compare: sort columns by name, then rows by all
    columns, reset index."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(spark_df, duck_df: pd.DataFrame, *, float_exact: bool = True):
    a = normalize(spark_df.toPandas())
    b = normalize(duck_df)
    assert list(a.columns) == list(b.columns), f"columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if float_exact:
                assert (av.astype(float).values == bv.astype(float).values).all(), \
                    f"float col {col} not bit-identical"
            else:
                pd.testing.assert_series_equal(av.astype(float), bv.astype(float),
                                               check_names=False, rtol=1e-12)
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), f"col {col} differs"
