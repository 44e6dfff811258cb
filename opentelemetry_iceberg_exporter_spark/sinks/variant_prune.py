"""File-level pruning for predicates on VARIANT paths (Iceberg v3 +
Parquet variant shredding, parquet-format VariantShredding.md).

Spark 4.1 writes variant SHREDDED by default (an inferred per-file
shredding schema puts each object field's typed values in a real parquet
column `col.typed_value.<key>.typed_value` with ordinary row-group
statistics, the type-mismatch residual in `...<key>.value`, and
non-object rows in the top-level `col.value`). Iceberg manifests carry
no bounds for variant columns (no defined ordering), so a predicate like

    try_variant_get(attrs, '$.http.status_code', 'long') >= 500

cannot prune via manifest bounds — but the FILE footers know. This
module recognizes such conjuncts in a DML/scan predicate and drops
candidate files whose shredded statistics PROVE no row can match.

Soundness rests on the shredding spec's exclusivity invariants:
* `value` and `typed_value` are mutually exclusive per row at every
  level; a row whose variant is not an object contributes NULL to every
  object-path extraction (never a predicate match — comparisons with
  NULL are not matches, same rule manifest bound pruning relies on).
* if `typed_value` is an object group, `value` may hold ONLY fields not
  present in the group (VariantShredding.md "Objects") — a shredded
  field's values can never hide in an ancestor's residual.
* the one place a path's value CAN escape its typed leaf is the leaf's
  own `.value` sibling (type-mismatch residual) — so a file is prunable
  only when that residual is absent or all-null in every row group.

One footer read per candidate file (ranged tail read), only when the
predicate actually contains a variant conjunct — otherwise zero cost.
Small candidate lists probe on driver threads; large ones ship through
one executor-side job with only booleans returning to the driver
(sinks/footer_probe.py). At 100 TB the footer pass costs O(candidate
files) small reads and is paid INSTEAD of scanning those files' data
pages.
"""

from __future__ import annotations

import re
from functools import partial
from dataclasses import dataclass
from typing import Any

from .parquet_footer import (
    PHYS_BOOLEAN,
    PHYS_BYTE_ARRAY,
    PHYS_DOUBLE,
    PHYS_FLOAT,
    PHYS_INT32,
    PHYS_INT64,
    _PLAIN_DECODERS,
    footer_row_group_stats,
)

# extraction type -> (acceptable typed-leaf physical types, literal caster)
_INT_TYPES = ("tinyint", "smallint", "int", "integer", "bigint", "long")
_EXTRACT_PHYS: dict[str, tuple[int, ...]] = {
    **{t: (PHYS_INT64, PHYS_INT32) for t in _INT_TYPES},
    # int-typed leaves order-embed into double comparisons exactly enough
    # for bounds (the cast is monotone); the reverse (double leaf, long
    # extraction) is NOT accepted — cast semantics of non-integral values
    # would decide matches, not ordering.
    "double": (PHYS_DOUBLE, PHYS_FLOAT, PHYS_INT64, PHYS_INT32),
    "float": (PHYS_DOUBLE, PHYS_FLOAT, PHYS_INT64, PHYS_INT32),
    "string": (PHYS_BYTE_ARRAY,),
    "boolean": (PHYS_BOOLEAN,),
}

# bracket segments come in two spellings: ['k'] as the path literal
# appears pre-parse inside F.try_variant_get(...), and [''k''] as the
# SAME literal appears RAW inside a SQL `where` string (the engine sees
# the conjunct before SQL unescaping, so the doubled quotes are still
# doubled) — both must prune identically.
_PATH_SEG = r"(?:\.[A-Za-z_][A-Za-z0-9_]*|\[\s*'[^'\[\]]+'\s*\]|\[\s*''[^'\[\]]+''\s*\])"
_VGET = (
    r"(?:try_)?variant_get\(\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*,\s*"
    rf"'(\$(?:{_PATH_SEG})+)'\s*,\s*'([A-Za-z]+)'\s*\)"
)
_LIT = r"(?:'(?:[^']|'')*'|-?\d+(?:\.\d+)?|true|false)"
_VGET_CMP = re.compile(
    rf"^{_VGET}\s*(<=|>=|==|=|<|>)\s*({_LIT})$", re.IGNORECASE
)
_VGET_CMP_FLIP = re.compile(
    rf"^({_LIT})\s*(<=|>=|==|=|<|>)\s*{_VGET}$", re.IGNORECASE
)
_VGET_BETWEEN = re.compile(
    rf"^{_VGET}\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})$", re.IGNORECASE
)
_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "==": "=="}
_SEG_RE = re.compile(_PATH_SEG)


@dataclass(frozen=True)
class VariantPredicate:
    """One mergeable (column, path, extraction type) bound: rows match
    only if the typed extraction lands in [lo, hi] (inclusive; None =
    unbounded side). `<`/`>` are widened to inclusive — boundary files
    are kept, pruning stays sound for every type."""

    column: str
    keys: tuple[str, ...]
    vtype: str
    lo: Any
    hi: Any


def _parse_path(path: str) -> tuple[str, ...] | None:
    """'$.a.b' / "$['a.b'].c" -> ('a','b') / ('a.b','c'); None for
    anything but plain object-key paths (array indices etc. never
    prune)."""
    keys: list[str] = []
    for seg in _SEG_RE.findall(path[1:]):  # strip the '$'
        if seg.startswith("."):
            keys.append(seg[1:])
        else:
            key = seg[seg.index("'") + 1 : seg.rindex("'")]
            if key.startswith("'") and key.endswith("'"):
                key = key[1:-1]  # the SQL-escaped [''k''] spelling
            keys.append(key)
    return tuple(keys) if keys else None


def _parse_literal(text: str, vtype: str) -> Any | None:
    t = text.strip()
    if vtype in _INT_TYPES:
        try:
            return int(t)
        except ValueError:
            return None  # non-integral literal: contribute no pruning
    if vtype in ("double", "float"):
        try:
            return float(t)
        except ValueError:
            return None
    if vtype == "string":
        if len(t) >= 2 and t.startswith("'") and t.endswith("'"):
            return t[1:-1].replace("''", "'")
        return None
    if vtype == "boolean":
        if t.lower() in ("true", "false"):
            return t.lower() == "true"
        return None
    return None


def parse_variant_conjuncts(
    conjuncts: list[str], variant_columns: set[str]
) -> list[VariantPredicate]:
    """The variant-path bounds recognizable in a conjunct list —
    strictly conservative: anything the tight grammar doesn't match
    contributes no pruning. Bounds on the same (column, path, type)
    merge by intersection."""
    bounds: dict[tuple[str, tuple[str, ...], str], list] = {}
    for raw in conjuncts:
        c = raw.strip()
        while c.startswith("(") and c.endswith(")"):
            inner = c[1:-1].strip()
            depth = 0
            ok = True
            for ch in inner:
                depth += ch == "("
                depth -= ch == ")"
                if depth < 0:
                    ok = False
                    break
            if not ok:
                break
            c = inner
        lits: list[str]
        m = _VGET_CMP.match(c)
        if m:
            col, path, vtype, op, lit = m.groups()
            lits = [lit]
        else:
            m = _VGET_CMP_FLIP.match(c)
            if m:
                lit, op, col, path, vtype = m.groups()
                lits = [lit]
                op = _FLIP[op]
            else:
                m = _VGET_BETWEEN.match(c)
                if not m:
                    continue
                col, path, vtype, b_lo, b_hi = m.groups()
                op, lits = "between", [b_lo, b_hi]
        vtype = vtype.lower()
        if col not in variant_columns or vtype not in _EXTRACT_PHYS:
            continue
        keys = _parse_path(path)
        if keys is None:
            continue
        vals = [_parse_literal(lit, vtype) for lit in lits]
        if any(v is None for v in vals):
            continue
        lo, hi = bounds.setdefault((col, keys, vtype), [None, None])
        if op in ("=", "=="):
            lo = vals[0] if lo is None else max(lo, vals[0])
            hi = vals[0] if hi is None else min(hi, vals[0])
        elif op in ("<", "<="):
            hi = vals[0] if hi is None else min(hi, vals[0])
        elif op in (">", ">="):
            lo = vals[0] if lo is None else max(lo, vals[0])
        else:  # between
            lo = vals[0] if lo is None else max(lo, vals[0])
            hi = vals[1] if hi is None else min(hi, vals[1])
        bounds[(col, keys, vtype)] = [lo, hi]
    return [
        VariantPredicate(col, keys, vtype, lo, hi)
        for (col, keys, vtype), (lo, hi) in bounds.items()
        if lo is not None or hi is not None
    ]


def _decode(phys: int, raw: bytes, vtype: str) -> Any | None:
    dec = _PLAIN_DECODERS.get(phys)
    if dec is None:
        return None
    try:
        v = dec(raw)
    except Exception:  # noqa: BLE001 — malformed stat bytes: unknown
        return None
    if vtype == "string":
        if not isinstance(v, bytes):
            return None
        try:
            # UTF-8 byte order == code-point order, so python str
            # comparison below matches Spark's UTF8String ordering
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None  # truncated bound split a char: unknown
    return v


_UNKNOWN = object()  # this row group may hold matches we cannot bound


def _all_null(cols: dict, name: str, n_rows: int | None) -> bool:
    """True when column `name` PROVABLY holds no values in this row
    group: absent from the file schema entirely, or null_count equals
    the group's row count."""
    c = cols.get(name)
    if c is None:
        return True
    return (
        n_rows is not None
        and c["null_count"] is not None
        and c["null_count"] == n_rows
    )


def _rg_range(cols: dict, n_rows: int | None, pred: VariantPredicate):
    """One row group's possible value range for the predicate path:
    None (no row can yield a non-null extraction), _UNKNOWN (values may
    exist that stats cannot bound — keep the file), or (min, max).

    Walks the shredding structure level by level. At each level the
    spec's exclusivity rules mean a key's values live either under its
    own `typed_value.<key>` subtree (when the key is in the shredding
    schema — the parent residual is then BANNED from containing it) or
    inside the parent's `value` residual (key not in the schema)."""
    prefix = pred.column
    for k in pred.keys:
        sub = f"{prefix}.typed_value.{k}"
        in_schema = any(
            n == f"{sub}.typed_value"
            or n == f"{sub}.value"
            or n.startswith(f"{sub}.typed_value.")
            for n in cols
        )
        if in_schema:
            prefix = sub
            continue
        # key not shredded at this level: a non-null extraction needs an
        # object carrying it in THIS level's residual
        return None if _all_null(cols, f"{prefix}.value", n_rows) else _UNKNOWN
    if not _all_null(cols, f"{prefix}.value", n_rows):
        return _UNKNOWN  # type-mismatch residual may hold matches
    typed = cols.get(f"{prefix}.typed_value")
    if typed is None or _all_null(cols, f"{prefix}.typed_value", n_rows):
        return None  # no typed storage (or all-null) and residual empty
    if typed["type"] not in _EXTRACT_PHYS[pred.vtype]:
        return _UNKNOWN
    if typed["min"] is None or typed["max"] is None:
        return _UNKNOWN  # values present but no exact stats
    mn = _decode(typed["type"], typed["min"], pred.vtype)
    mx = _decode(typed["type"], typed["max"], pred.vtype)
    if mn is None or mx is None:
        return _UNKNOWN
    return mn, mx


def file_may_match(path: str, pred: VariantPredicate) -> bool:
    """False only when the footer PROVES no row of the file can satisfy
    the predicate: every row group either cannot yield a non-null
    extraction for the path at all, or bounds it with exact shredded
    stats whose union range is disjoint from [lo, hi]. Any uncertainty
    (unshredded file, missing stats, unreadable footer, physical-type
    mismatch, residual values) keeps the file."""
    try:
        groups = footer_row_group_stats(path)
    except Exception:  # noqa: BLE001 — unreadable footer: keep the file
        return True
    if not groups:
        return False  # zero row groups: no rows, nothing can match
    lo_f: Any = None
    hi_f: Any = None
    any_values = False
    for group in groups:
        r = _rg_range(group["columns"], group["num_rows"], pred)
        if r is _UNKNOWN:
            return True
        if r is None:
            continue
        mn, mx = r
        any_values = True
        lo_f = mn if lo_f is None else min(lo_f, mn)
        hi_f = mx if hi_f is None else max(hi_f, mx)
    if not any_values:
        return False  # every row extracts NULL: no predicate match
    try:
        if pred.lo is not None and hi_f < pred.lo:
            return False
        if pred.hi is not None and lo_f > pred.hi:
            return False
    except TypeError:
        return True  # incomparable decoded/literal pairing: keep
    return True


def _file_provably_matchless(path: str, preds: list[VariantPredicate]) -> bool:
    """Module-level (picklable) dead-file verdict for footer_probe."""
    return not all(file_may_match(path, p) for p in preds)


def prune_files_by_variant_stats(
    files: list, preds: list[VariantPredicate], spark=None
) -> tuple[list, list]:
    """(kept, provably-matchless) split of candidate data files, one
    footer read per file. Small lists probe on driver threads (tiny
    ranged tail reads, I/O bound); with a session and a large
    candidate list the footer reads ship to executors and only
    booleans return (footer_probe.probe_verdicts)."""
    if not preds or not files:
        return files, []
    from .footer_probe import probe_verdicts

    verdict = probe_verdicts(
        [f.file_path for f in files],
        partial(_file_provably_matchless, preds=preds),
        spark=spark,
    )
    kept = [f for f in files if not verdict[f.file_path]]
    dropped = [f for f in files if verdict[f.file_path]]
    return kept, dropped


# ---------------------------------------------------------------------------
# Declared shred paths (catalog.shred_paths): verify post-write that a
# declared hot path's values actually landed as TYPED shredded columns,
# so pruning quality is a checked contract instead of an accident of
# per-file inference.

_FULL_PATH_RE = re.compile(rf"^\$(?:{_PATH_SEG})+$")


def parse_shred_path(path: str) -> tuple[str, ...]:
    """Validate a declared shred path against the same grammar the
    pruner recognizes ($.a.b / $['dotted.key'].c) and return its key
    tuple. Raises ValueError on anything else — a declared path the
    pruner could never use (array index, bare '$') is a config error,
    not a runtime surprise."""
    if not isinstance(path, str) or not _FULL_PATH_RE.match(path):
        raise ValueError(
            f"shred path {path!r} is not an object-key path the variant "
            "pruner can use — expected $.key, $.a.b, or $['dotted.key'] "
            "segments"
        )
    keys = _parse_path(path)
    assert keys is not None  # the regex above guarantees segments
    return keys


def _rg_shred_violation(
    cols: dict, n_rows: int | None, column: str, keys: tuple[str, ...]
) -> str | None:
    """One row group's verdict on a declared path: None when every value
    of the path (if any) is typed-shredded — i.e. walking the keys, each
    level is in the shredding schema, and the leaf's type-mismatch
    residual is empty; a group with NO values for the path anywhere
    (all-null residuals) also passes (nothing escaped typing, and the
    pruner proves such groups matchless for free). Otherwise the reason
    string — values exist that footer stats cannot bound."""
    prefix = column
    for k in keys:
        sub = f"{prefix}.typed_value.{k}"
        in_schema = any(
            n == f"{sub}.typed_value"
            or n == f"{sub}.value"
            or n.startswith(f"{sub}.typed_value.")
            for n in cols
        )
        if not in_schema:
            if _all_null(cols, f"{prefix}.value", n_rows):
                return None  # no values under this level at all
            return (
                f"key {k!r} is not in the file's shredding schema and "
                f"`{prefix}.value` holds residual values"
            )
        prefix = sub
    if not _all_null(cols, f"{prefix}.value", n_rows):
        return (
            f"type-mismatch residual `{prefix}.value` holds values — the "
            "declared path's data escaped its typed column"
        )
    return None


def verify_shred_paths(
    file_paths: list[str], paths_by_column: dict[str, list[str]]
) -> list[tuple[str, str, str, str]]:
    """Check written parquet files against the declared shred paths.
    Returns [(file, column, path, reason)] violations — empty means
    every declared path's values are typed (or provably absent) in
    every row group of every file. An unreadable footer is a violation
    for every declared path (the contract cannot be proven)."""
    from concurrent.futures import ThreadPoolExecutor

    parsed = {
        col: [(p, parse_shred_path(p)) for p in paths]
        for col, paths in paths_by_column.items()
    }

    def check(fp: str) -> list[tuple[str, str, str, str]]:
        out: list[tuple[str, str, str, str]] = []
        try:
            groups = footer_row_group_stats(fp)
        except Exception as exc:  # noqa: BLE001 — unprovable = violation
            for col, pairs in parsed.items():
                for p, _keys in pairs:
                    out.append((fp, col, p, f"unreadable footer: {exc}"))
            return out
        for col, pairs in parsed.items():
            for p, keys in pairs:
                for g in groups:
                    reason = _rg_shred_violation(
                        g["columns"], g["num_rows"], col, keys
                    )
                    if reason is not None:
                        out.append((fp, col, p, reason))
                        break
        return out

    if not file_paths:
        return []
    # ranged tail reads, I/O bound — overlap them (the post-commit
    # check sees O(batch files); the verify-shred AUDIT sees O(table))
    with ThreadPoolExecutor(max_workers=min(16, len(file_paths))) as ex:
        per_file = list(ex.map(check, file_paths))
    return [v for vs in per_file for v in vs]
