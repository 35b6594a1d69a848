"""Pipeline observability — the Spark-idiomatic replacement for the
reference's debug ``peek`` (SURVEY §2.2 P6, streamFunctions/*.java's
``.peek(System.out::println)`` calls).

A peek that prints rows is a side-effecting row map — it breaks whole-
stage codegen, serializes the stream through the driver console, and
cannot survive a distributed run. ``df.observe`` is the engine-native
form: named aggregate metrics collected DURING the job (no second pass,
no extra action), delivered on the driver after each action (batch) or
per micro-batch (streaming, via QueryProgressEvent.observedMetrics).

``observed(df, name)`` attaches the standard row-count / per-column
null-count metrics a pipeline audit wants; ``collect_metrics`` runs an
action and returns them. Zero cost when the metrics are never read —
observe compiles to a CollectMetrics node feeding an accumulator, the
row path stays codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observed(df: DataFrame, name: str = "pipeline",
             null_cols: list[str] | None = None
             ) -> tuple[DataFrame, Observation]:
    """Attach a named observation to ``df``: n_rows plus a null count per
    column in ``null_cols`` (default: every top-level column). Returns
    (df, observation); read ``observation.get`` after an action."""
    cols = null_cols if null_cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        # coalesce: SUM over zero rows is null, and an audit must see 0,
        # not None, exactly on the empty-input edge it exists to catch
        aggs.append(F.coalesce(F.sum(F.col(c).isNull().cast("long")),
                               F.lit(0)).alias(f"nulls_{c}"))
    obs = Observation(name)
    return df.observe(obs, *aggs), obs


def collect_metrics(df: DataFrame, name: str = "pipeline",
                    null_cols: list[str] | None = None) -> dict:
    """Run one action over ``df`` and return its observation metrics —
    the single-pass answer to 'how many rows flowed through, and were
    any keys null'. The triggering action is a count(): the cheapest
    portable action, and the observation rides its scan."""
    out, obs = observed(df, name, null_cols)
    out.count()
    return dict(obs.get)
