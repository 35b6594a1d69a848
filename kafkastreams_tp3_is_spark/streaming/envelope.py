"""Kafka Connect JSON-envelope rendering (SURVEY S5, S6).

Every reference query wraps each result as a string
``{"schema": <connect-schema>, "payload": <values>}`` so the Connect
JsonConverter (schemas.enable=true) can auto-create Postgres tables
(/root/reference/src/main/java/streamFunctions/AvailableSeatsPerRoute.java:46-62,
config/routes-sink.json:16-17). Payload rendering rules, matched exactly:

  - doubles via Java ``String.format("%.2f", v)`` (OccupancyPerRoute.java:81)
    — Spark's format_string lowers to java.lang.String.format, so rounding
    (HALF_UP) is bit-compatible with the reference;
  - strings double-quoted verbatim (the reference does not escape either:
    LeastOccupiedTransportTypeWindow.java:114-117);
  - int32/int64 as bare decimal.

Whitespace inside the envelope is normalized to compact JSON (the reference
embeds Java text-block indentation; Connect's JSON parser is whitespace-
insensitive, so the byte layout is not part of the contract).

Everything is a JVM-side concat/format_string projection — a narrow map,
streaming- and batch-compatible, no UDF.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Spark simpleString -> Connect schema type
#: (int32/int64/double/string are the only types the reference emits,
#: SURVEY 1.2 "Output schema system")
CONNECT_TYPES = {
    "string": "string",
    "int": "int32",
    "integer": "int32",
    "bigint": "int64",
    "long": "int64",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "string",
    "timestamp": "string",
}


def connect_schema_json(df: DataFrame, value_cols: list[str],
                        name: str | None = None,
                        optional: bool = False) -> str:
    """Compact Connect schema header for the given output columns, e.g.
    {"type":"struct","fields":[{"field":"totalCapacity","type":"int32"}]}."""
    by_name = {f.name: f for f in df.schema.fields}
    fields = []
    for c in value_cols:
        spark_t = by_name[c].dataType.simpleString()
        entry: dict = {"field": c, "type": CONNECT_TYPES[spark_t]}
        if optional:
            entry["optional"] = True
        fields.append(entry)
    schema: dict = {"type": "struct", "fields": fields}
    if name:
        schema["optional"] = False
        schema["name"] = name
    return json.dumps(schema, separators=(", ", ": "))


def _render_value(df: DataFrame, col: str) -> F.Column:
    """One payload value, rendered the way the reference's String.format
    does: %.2f doubles, quoted strings, bare ints."""
    spark_t = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[col]
    c = F.col(col)
    if isinstance(spark_t, (T.DoubleType, T.FloatType)):
        return F.format_string("%.2f", c)
    if isinstance(spark_t, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return c.cast("string")
    return F.concat(F.lit('"'), c.cast("string"), F.lit('"'))


def connect_envelope(df: DataFrame, key_col: str | None,
                     value_cols: list[str] | None = None,
                     schema_name: str | None = None,
                     optional: bool = False) -> DataFrame:
    """S5: render each row as Kafka (key, value) strings with the Connect
    envelope. Returns columns (key string, value string), ready for the
    Kafka sink (sources/kafka.py write_kafka_stream) or df.write."""
    cols = value_cols or [c for c in df.columns if c != key_col]
    header = connect_schema_json(df, cols, name=schema_name, optional=optional)
    payload_parts: list[F.Column] = [F.lit("{")]
    for i, c in enumerate(cols):
        if i:
            payload_parts.append(F.lit(", "))
        payload_parts.append(F.lit(f'"{c}": '))
        payload_parts.append(_render_value(df, c))
    payload_parts.append(F.lit("}"))
    value = F.concat(F.lit('{"schema": ' + header + ', "payload": '),
                     *payload_parts,
                     F.lit("}"))
    key = (F.col(key_col).cast("string") if key_col
           else F.lit(None).cast("string"))
    return df.select(key.alias("key"), value.alias("value"))


#: Connect schema for raw Route records, as re-emitted by the standalone
#: re-envelope job (utils/KafkaSchemaTransformer.java:44-60).
ROUTE_CONNECT_SCHEMA = json.dumps({
    "type": "struct",
    "fields": [
        {"field": "routeId", "type": "string"},
        {"field": "origin", "type": "string"},
        {"field": "destination", "type": "string"},
        {"field": "transportType", "type": "string"},
        {"field": "capacity", "type": "int32"},
        {"field": "operator", "type": "string"},
    ],
    "optional": False,
    "name": "Route",
}, separators=(", ", ": "))


def envelope_passengers_per_route(spark, sf_dir: str) -> DataFrame:
    """Q5 rendered through the Connect envelope — the S5 sink path as an
    oracle-checked queries() entry: (key, value) strings exactly as the
    Kafka output topic would carry them (PassengersPerRoute.java:42-59)."""
    from ..queries import q5_passengers_per_route
    df = q5_passengers_per_route(spark, sf_dir)
    return connect_envelope(df, key_col="route_id",
                            value_cols=["passengerCount"])


def reenvelope_records(records: DataFrame,
                       schema_json: str = ROUTE_CONNECT_SCHEMA) -> DataFrame:
    """S6: the standalone re-envelope job (KafkaSchemaTransformer.java:36-82)
    as a one-line transform: wrap each raw JSON value string in the Connect
    envelope, key unchanged. Works on batch frames and streams alike —
    compose with read_kafka_stream/write_kafka_stream for the live job."""
    return records.select(
        F.col("key").cast("string").alias("key"),
        F.concat(F.lit('{"schema": ' + schema_json + ', "payload": '),
                 F.col("value").cast("string"),
                 F.lit("}")).alias("value"))
