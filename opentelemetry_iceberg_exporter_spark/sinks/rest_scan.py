"""Client half of the Iceberg REST Catalog server-side scan-planning
API (the public REST OpenAPI's `PlanTableScan` operation family):

    POST   /v1/{prefix}/namespaces/{ns}/tables/{tbl}/plan            submit
    GET    /v1/{prefix}/namespaces/{ns}/tables/{tbl}/plan/{plan-id}  poll
    DELETE /v1/{prefix}/namespaces/{ns}/tables/{tbl}/plan/{plan-id}  cancel
    POST   /v1/{prefix}/namespaces/{ns}/tables/{tbl}/tasks           page

Why it matters at 100 TB: local planning pays one manifest-list walk
plus O(matching manifests) storage round-trips PER READER; a catalog
that plans server-side amortizes that metadata I/O (and its cache)
across every engine in the fleet, and is the only place vended-
credential deployments can apply row/file-level access policy before
an engine sees a single path. The exporter stays correct either way —
this module is the interop surface, with local planning as the
always-available fallback.

Wire shapes per the public `rest-catalog-open-api.yaml`:

* `PlanTableScanRequest`: `snapshot-id`, `select`, `filter` (the spec's
  Expression JSON), `case-sensitive`.
* `PlanTableScanResult`: `status` of `completed` (with
  `file-scan-tasks` + `delete-files` + optional `plan-tasks` pagination
  tokens), `submitted` (with `plan-id` to poll), `failed`, `cancelled`.
* `FetchScanTasksResult` (POST tasks with one `plan-task` token): more
  `file-scan-tasks` / `delete-files` / `plan-tasks`.
* `FileScanTask`: `data-file` + `delete-file-references`, each an index
  into the SAME message's `delete-files` list — applicability is a
  per-message, per-task contract, which is exactly what lets the client
  skip sequence-number reconstruction (see `group_scan_tasks`).

Deliberate non-support, grounded in the spec: `with_lineage` reads stay
locally planned. The spec's `DataFile` JSON carries `first-row-id`
(v3) but NO data sequence number, and `_last_updated_sequence_number`
is defined as exactly that number — a server-planned lineage read
cannot be reconstructed faithfully, so the client refuses instead of
fabricating it.

The test stub (tests/rest_stub.py) implements the SERVER half with its
own independent expression parser and ContentFile serializer, so the
roundtrip tests exercise the wire format itself, not a shared codec.
"""

from __future__ import annotations

from dataclasses import replace
from datetime import date, datetime
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .iceberg_fs import (
    DataFile,
    current_schema,
    default_spec_fields,
    scan_with_deletes,
)

# capped breadth-first page fetch: a byzantine server emitting cyclic
# plan-task tokens must terminate with an error, not an infinite loop
MAX_PLAN_TASK_FETCHES = 10_000


# -- expression JSON (client -> server) -------------------------------------

def literal_json(v: Any) -> Any:
    """Spec literal serialization for the JSON value slot: temporal
    values ride as ISO-8601 strings, decimals as strings, everything
    else as the native JSON scalar."""
    if isinstance(v, datetime) or isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    return v


def _cmp(op: str, term: Any, value: Any) -> dict:
    return {"type": op, "term": term, "value": literal_json(value)}


def _and_all(conjuncts: list[dict]) -> dict | None:
    if not conjuncts:
        return None
    expr = conjuncts[0]
    for c in conjuncts[1:]:
        expr = {"type": "and", "left": expr, "right": c}
    return expr


def _listify(v: Any) -> list:
    if v is None:
        return []
    return [v] if isinstance(v, tuple) else list(v)


def scan_filter_json(
    md: dict,
    partition_range: tuple[int, int] | None = None,
    column_range: Any = None,
    source_predicate: Any = None,
    source_range: Any = None,
) -> dict | None:
    """The tuple pruning surface (RestTable.read's kwargs), serialized
    as one conjunctive spec Expression. column_range and source_range
    both become plain column range predicates (the server decides how
    to prune with them — bounds, transform rewrite, or both);
    partition_range becomes a transform-term range on the FIRST default
    spec field, the same field local planning applies it to. Returns
    None when there is nothing to send (plan everything)."""
    conjuncts: list[dict] = []
    seen: set[str] = set()
    for col, lo, hi in _listify(column_range) + _listify(source_range):
        for op, bound in (("gt-eq", lo), ("lt-eq", hi)):
            if bound is None:
                continue
            pred = _cmp(op, col, bound)
            key = repr(pred)
            if key not in seen:  # column_range/source_range often alias
                seen.add(key)
                conjuncts.append(pred)
    for col, val in _listify(source_predicate):
        conjuncts.append(_cmp("eq", col, val))
    if partition_range is not None:
        spec_fields = default_spec_fields(md)
        if spec_fields:
            pf = spec_fields[0]
            src = next(
                (
                    f
                    for f in current_schema(md)["fields"]
                    if f["id"] == pf["source-id"]
                ),
                None,
            )
            if src is not None:
                term = {
                    "type": "transform",
                    "transform": pf["transform"],
                    "term": src["name"],
                }
                lo, hi = partition_range
                conjuncts.append(_cmp("gt-eq", term, lo))
                conjuncts.append(_cmp("lt-eq", term, hi))
    return _and_all(conjuncts)


# -- plan result JSON (server -> client) -------------------------------------

_CONTENT_CODES = {"data": 0, "position-deletes": 1, "equality-deletes": 2}


def parse_content_file(j: dict, md: dict) -> DataFile:
    """Spec ContentFile JSON -> DataFile. Partition values arrive as a
    list aligned with the file's spec (by `spec-id`); they are mapped
    back to the name-keyed dict local planning produces. Stats maps are
    not reconstructed (raw_bounds stays None) — pruning already
    happened server-side and re-commit paths never see these files."""
    content = j.get("content", "data")
    if content not in _CONTENT_CODES:
        raise ValueError(f"unknown content file kind {content!r}")
    spec_id = j.get("spec-id")
    partition: dict[str, Any] = {}
    vals = j.get("partition") or []
    spec = next(
        (s for s in md.get("partition-specs", []) if s["spec-id"] == spec_id),
        None,
    )
    if spec is not None:
        partition = {
            pf["name"]: v for pf, v in zip(spec["fields"], vals)
        }
    eq_ids = j.get("equality-ids")
    return DataFile(
        file_path=j["file-path"],
        file_size_in_bytes=int(j.get("file-size-in-bytes", 0)),
        record_count=int(j.get("record-count", 0)),
        partition=partition,
        content=_CONTENT_CODES[content],
        equality_ids=tuple(eq_ids) if eq_ids else None,
        referenced_data_file=j.get("referenced-data-file"),
        content_offset=j.get("content-offset"),
        content_size_in_bytes=j.get("content-size-in-bytes"),
        first_row_id=j.get("first-row-id"),
        spec_id=spec_id,
    )


def parse_scan_tasks(
    result: dict, md: dict
) -> tuple[list[tuple[DataFile, list[DataFile]]], list[str]]:
    """One PlanTableScanResult / FetchScanTasksResult message ->
    ([(data file, applicable delete files)], plan-task tokens).
    `delete-file-references` index into the SAME message's
    `delete-files` list — the spec scopes them per message, so pages
    are self-contained. A deletion vector arriving without
    `referenced-data-file` is pinned to its task's data file: the
    task-level reference IS the applicability contract."""
    deletes = [parse_content_file(d, md) for d in result.get("delete-files") or []]
    tasks: list[tuple[DataFile, list[DataFile]]] = []
    for t in result.get("file-scan-tasks") or []:
        df = parse_content_file(t["data-file"], md)
        if df.content != 0:
            raise ValueError(
                f"file-scan-task data-file has content={df.content}"
            )
        refs: list[DataFile] = []
        for i in t.get("delete-file-references") or []:
            d = deletes[i]
            if (
                d.content == 1
                and d.content_offset is not None
                and d.referenced_data_file is None
            ):
                d = replace(d, referenced_data_file=df.file_path)
            refs.append(d)
        tasks.append((df, refs))
    return tasks, [str(t) for t in result.get("plan-tasks") or []]


def group_scan_tasks(
    tasks: list[tuple[DataFile, list[DataFile]]],
) -> list[tuple[list[DataFile], list[DataFile]]]:
    """Collapse per-task delete applicability into scan groups that
    `scan_with_deletes` executes faithfully WITHOUT true sequence
    numbers (the spec's ContentFile JSON carries none):

    * position deletes (files and DVs) match rows by exact data-file
      path, so they are safe to apply across the whole group — a delete
      naming a file outside the group matches nothing;
    * equality deletes apply by `data.seq < delete.seq`, which the wire
      expresses only as per-task reference sets — so data files are
      grouped by their exact equality-delete set and each group gets
      synthesized sequence numbers (data=1, deletes=2) that reproduce
      the referenced applicability precisely.

    One group (the no-equality-deletes common case) means one scan —
    the identical plan local planning builds. N distinct equality sets
    mean N scan branches unioned; real planners produce NESTED sets
    (applicability is monotone in commit order), so N stays at the
    number of equality-delete commits still unapplied, which table
    maintenance (rewrite_equality_deletes) keeps near zero."""
    groups: dict[tuple[str, ...], tuple[list[DataFile], dict[tuple, DataFile]]] = {}
    for df, refs in tasks:
        eq_key = tuple(sorted(d.file_path for d in refs if d.content == 2))
        data, dels = groups.setdefault(eq_key, ([], {}))
        data.append(replace(df, sequence_number=1))
        for d in refs:
            # one Puffin file carries DV blobs for MANY data files (one
            # entry each, same path): dedupe by the full locator
            k = (d.file_path, d.referenced_data_file, d.content_offset)
            dels.setdefault(k, replace(d, sequence_number=2))
    return [(data, list(dels.values())) for data, dels in groups.values()]


def scan_planned_tasks(
    spark: SparkSession,
    md: dict,
    tasks: list[tuple[DataFile, list[DataFile]]],
) -> DataFrame:
    """Execute server-planned scan tasks: one scan_with_deletes branch
    per equality-applicability group, unioned by name. Empty plans
    produce an empty DataFrame under the table's read schema."""
    from .iceberg_fs import read_schema_for

    groups = group_scan_tasks(tasks)
    if not groups:
        return spark.createDataFrame([], read_schema_for(spark, md))
    parts = [scan_with_deletes(spark, md, data, dels) for data, dels in groups]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df
