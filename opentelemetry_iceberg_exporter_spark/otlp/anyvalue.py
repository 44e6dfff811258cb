"""Canonical JSON encoding of OTLP attribute maps and AnyValues.

Reference parity: attributesToJSON / valueToInterface
(internal/arrow/traces.go:252-291, metrics.go:765-773) marshal a
pcommon.Map through Go's json.Marshal, which SORTS map keys — so the
encoder here sorts entries by key before emitting.  logValueToJSON
(logs.go:190-211) is the body-specific variant: scalars pass through
RAW (unquoted), doubles as %f (fixed 6 decimals), and only slice/map
values get JSON-encoded.

All encoders are pure Catalyst expressions (concat/transform/when) —
JVM-side, codegen'd, no UDFs.

Known formatting divergences vs Go (documented, covered by tests):
* non-integral doubles inside attribute JSON use Spark's double->string
  rendering ("0.1", "1.0E21"); Go emits shortest-round-trip ("0.1",
  "1e+21"). Values in the reference's fixture corpus are unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .model import ATTR_DEPTH


def json_quote(col: Column) -> Column:
    """JSON-escape + quote a string: render '["x"]' and strip brackets."""
    arr = F.to_json(F.array(col))
    return arr.substr(F.lit(2), F.length(arr) - 2)


def json_number(col: Column) -> Column:
    """Go json.Marshal renders integral float64s without a decimal point
    (42.0 -> "42"); Spark CAST(double AS STRING) keeps ".0". Match Go for
    the integral case."""
    as_long = col.cast("long")
    integral = (col == as_long.cast("double")) & (F.abs(col) < 1e15)
    return F.when(integral, as_long.cast("string")).otherwise(col.cast("string"))


def anyvalue_to_json(v: Column, depth: int = ATTR_DEPTH) -> Column:
    """Render an AnyValue struct as a JSON fragment (valueToInterface +
    json.Marshal semantics: typed scalars, base64 bytes as string,
    recursive arrays and key-sorted maps)."""
    out = (
        F.when(v["stringValue"].isNotNull(), json_quote(v["stringValue"]))
        .when(v["boolValue"].isNotNull(), F.when(v["boolValue"], F.lit("true")).otherwise("false"))
        .when(v["intValue"].isNotNull(), v["intValue"].cast("long").cast("string"))
        .when(v["doubleValue"].isNotNull(), json_number(v["doubleValue"]))
        .when(v["bytesValue"].isNotNull(), json_quote(v["bytesValue"]))
    )
    if depth > 0:
        arr = v["arrayValue"]["values"]
        out = out.when(
            v["arrayValue"].isNotNull(),
            F.concat(
                F.lit("["),
                F.concat_ws(
                    ",",
                    F.transform(arr, lambda x: anyvalue_to_json(x, depth - 1)),
                ),
                F.lit("]"),
            ),
        )
        kv = v["kvlistValue"]["values"]
        out = out.when(
            v["kvlistValue"].isNotNull(), _entries_to_json(kv, depth - 1)
        )
    return out.otherwise(F.lit("null"))


def _entries_to_json(entries: Column, depth: int) -> Column:
    """array<struct<key,value>> -> '{"k1":v1,...}' with keys sorted
    (Go json.Marshal map-key ordering)."""
    sorted_entries = F.array_sort(entries)  # struct sort: first field = key
    rendered = F.transform(
        sorted_entries,
        lambda kv: F.concat(
            json_quote(kv["key"]), F.lit(":"), anyvalue_to_json(kv["value"], depth)
        ),
    )
    return F.concat(F.lit("{"), F.concat_ws(",", rendered), F.lit("}"))


def attributes_to_json(attrs: Column, depth: int = ATTR_DEPTH) -> Column:
    """Attribute list -> canonical JSON object string; '{}' when absent
    (the reference emits "{}" for empty maps, traces.go:253-256).

    depth defaults to ATTR_DEPTH — the SAME bound the parse schema uses
    (model.anyvalue_type) — so anything from_json can represent is also
    rendered; encoding one level shallower silently dropped depth-2
    values (e.g. map-of-array-of-scalars) to 'null'."""
    return F.when(attrs.isNull(), F.lit("{}")).otherwise(_entries_to_json(attrs, depth))


# ---------------------------------------------------------------------------
# SQL-text builders — semantically IDENTICAL to the Column builders above,
# but rendered as one SQL string consumed by a single F.expr call.
#
# Why both exist: building the recursive encoder out of Column objects costs
# ~4,500 py4j round trips per attribute column (every F.when/transform is a
# JVM call; the higher-order lambdas dominate). With ~24 encoded columns per
# metrics flatten that was 107k JVM round trips and ~20 s of pure plan
# CONSTRUCTION per query (measured; execution was 4.7 s). The text form is
# one round trip per column. The golden-fixture tests and the DuckDB oracles
# pin that both forms produce byte-identical output.


def json_quote_sql(e: str) -> str:
    t = f"to_json(array({e}))"
    return f"substring({t}, 2, length({t}) - 2)"


def json_number_sql(e: str) -> str:
    return (
        f"CASE WHEN {e} = CAST(CAST({e} AS BIGINT) AS DOUBLE)"
        f" AND abs({e}) < 1.0E15"
        f" THEN CAST(CAST({e} AS BIGINT) AS STRING)"
        f" ELSE CAST({e} AS STRING) END"
    )


def anyvalue_to_json_sql(v: str, depth: int = ATTR_DEPTH) -> str:
    branches = [
        (f"{v}.stringValue IS NOT NULL", json_quote_sql(f"{v}.stringValue")),
        (
            f"{v}.boolValue IS NOT NULL",
            f"CASE WHEN {v}.boolValue THEN 'true' ELSE 'false' END",
        ),
        (
            f"{v}.intValue IS NOT NULL",
            f"CAST(CAST({v}.intValue AS BIGINT) AS STRING)",
        ),
        (f"{v}.doubleValue IS NOT NULL", json_number_sql(f"{v}.doubleValue")),
        (f"{v}.bytesValue IS NOT NULL", json_quote_sql(f"{v}.bytesValue")),
    ]
    if depth > 0:
        var = f"x{depth}"
        branches.append(
            (
                f"{v}.arrayValue IS NOT NULL",
                "concat('[', concat_ws(',', transform("
                f"{v}.arrayValue.values, {var} -> "
                f"{anyvalue_to_json_sql(var, depth - 1)})), ']')",
            )
        )
        branches.append(
            (
                f"{v}.kvlistValue IS NOT NULL",
                entries_to_json_sql(f"{v}.kvlistValue.values", depth - 1),
            )
        )
    whens = " ".join(f"WHEN {c} THEN {e}" for c, e in branches)
    return f"CASE {whens} ELSE 'null' END"


def entries_to_json_sql(entries: str, depth: int) -> str:
    var = f"kv{depth}"
    item = (
        f"concat({json_quote_sql(var + '.key')}, ':', "
        f"{anyvalue_to_json_sql(var + '.value', depth)})"
    )
    return (
        "concat('{', concat_ws(',', transform(array_sort("
        + entries
        + f"), {var} -> {item})), '}}')"
    )


def attributes_to_json_sql(attrs: str, depth: int = ATTR_DEPTH) -> str:
    return (
        f"CASE WHEN {attrs} IS NULL THEN '{{}}' "
        f"ELSE {entries_to_json_sql(attrs, depth)} END"
    )


def log_body_to_string_sql(body: str, depth: int = ATTR_DEPTH) -> str:
    branches = [
        (f"{body} IS NULL", "CAST(NULL AS STRING)"),
        (f"{body}.stringValue IS NOT NULL", f"{body}.stringValue"),
        (
            f"{body}.boolValue IS NOT NULL",
            f"CASE WHEN {body}.boolValue THEN 'true' ELSE 'false' END",
        ),
        (
            f"{body}.intValue IS NOT NULL",
            f"CAST(CAST({body}.intValue AS BIGINT) AS STRING)",
        ),
        (
            f"{body}.doubleValue IS NOT NULL",
            f"format_string('%f', {body}.doubleValue)",
        ),
        (
            f"{body}.bytesValue IS NOT NULL",
            f"CAST(unbase64({body}.bytesValue) AS STRING)",
        ),
    ]
    if depth > 0:
        var = f"x{depth}"
        branches.append(
            (
                f"{body}.arrayValue IS NOT NULL",
                "concat('[', concat_ws(',', transform("
                f"{body}.arrayValue.values, {var} -> "
                f"{anyvalue_to_json_sql(var, depth - 1)})), ']')",
            )
        )
        branches.append(
            (
                f"{body}.kvlistValue IS NOT NULL",
                entries_to_json_sql(f"{body}.kvlistValue.values", depth - 1),
            )
        )
    whens = " ".join(f"WHEN {c} THEN {e}" for c, e in branches)
    return f"CASE {whens} ELSE CAST(NULL AS STRING) END"


def log_body_to_string(body: Column, depth: int = ATTR_DEPTH) -> Column:
    """logValueToJSON (logs.go:190-211): string bodies pass through RAW,
    ints as digits, doubles as %f (fixed 6 decimals), bools as
    true/false; slice/map bodies JSON-encoded; absent -> NULL."""
    out = (
        F.when(body.isNull(), F.lit(None).cast("string"))
        .when(body["stringValue"].isNotNull(), body["stringValue"])
        .when(body["boolValue"].isNotNull(), F.when(body["boolValue"], F.lit("true")).otherwise("false"))
        .when(body["intValue"].isNotNull(), body["intValue"].cast("long").cast("string"))
        .when(body["doubleValue"].isNotNull(), F.format_string("%f", body["doubleValue"]))
        # OTLP/JSON carries bytesValue base64-encoded; the reference emits
        # the DECODED bytes as a string (logs.go:207,
        # string(v.Bytes().AsRaw())) — so unbase64 here. The attribute-JSON
        # branch keeps base64 (Go json.Marshal base64-encodes []byte).
        .when(body["bytesValue"].isNotNull(), F.unbase64(body["bytesValue"]).cast("string"))
    )
    if depth > 0:
        arr = body["arrayValue"]["values"]
        out = out.when(
            body["arrayValue"].isNotNull(),
            F.concat(
                F.lit("["),
                F.concat_ws(",", F.transform(arr, lambda x: anyvalue_to_json(x, depth - 1))),
                F.lit("]"),
            ),
        )
        out = out.when(
            body["kvlistValue"].isNotNull(),
            _entries_to_json(body["kvlistValue"]["values"], depth - 1),
        )
    return out.otherwise(F.lit(None).cast("string"))
