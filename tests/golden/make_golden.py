"""Generate golden Iceberg v2 metadata fixtures INDEPENDENTLY of the
package under test.

Every byte emitted here is derived from the public Apache Avro 1.11
specification (binary encoding + object container files) and the public
Apache Iceberg table spec (format-version 2) — NOT from
sinks/avro_ocf.py or sinks/iceberg_fs.py, which must never be imported
here. The fixtures pin the package's on-disk byte format: the test suite
freezes uuids/timestamps/sync markers and asserts the package writes
these exact bytes and reads them back faithfully. A mismatch means
either format drift or a spec misread — both are release blockers for
interop with real Iceberg readers.

Regenerate (should be byte-stable):  python tests/golden/make_golden.py
"""

from __future__ import annotations

import io
import json
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------------------
# frozen inputs (mirrored by tests/test_golden_format.py)
# ---------------------------------------------------------------------------

LOC = "/tmp/spark_graft_golden/wh/otel/gold"
TABLE_UUID = "00000000-0000-4000-8000-00000000abcd"
MANIFEST_UUID_HEX = "11111111111111111111111111111111"
LIST_UUID_HEX = "22222222222222222222222222222222"
T_CREATE_MS = 1700000000000
T_APPEND_MS = 1700000001000
SYNC = bytes(range(16))
SNAPSHOT_SEED = bytes.fromhex("123456789abcdef0")
SNAPSHOT_ID = (int.from_bytes(SNAPSHOT_SEED, "big")) >> 1  # 655884233731895160

FILE_A = f"{LOC}/data/b0/ts_hour=473040/part-00000.parquet"
FILE_B = f"{LOC}/data/b0/ts_hour=__HIVE_DEFAULT_PARTITION__/part-00001.parquet"

# -- second commit: a merge-on-read position delete (Iceberg v2
# "Position Delete Files": content=1 entries in a content=1 manifest) ------
DELETE_MANIFEST_UUID_HEX = "33333333333333333333333333333333"
DELETE_LIST_UUID_HEX = "44444444444444444444444444444444"
T_DELETE_MS = 1700000002000
SNAPSHOT2_SEED = bytes.fromhex("23456789abcdef01")
SNAPSHOT2_ID = (int.from_bytes(SNAPSHOT2_SEED, "big")) >> 1
DELETE_FILE = f"{LOC}/data/deletes-00d0/part-00000.parquet"
DELETE_FILE_SIZE = 321
DELETE_ROW_COUNT = 4

# -- third commit: a merge-on-read EQUALITY delete (Iceberg v2 "Equality
# Delete Files": content=2 entry with equality_ids, in a content=1
# delete manifest) ---------------------------------------------------------
EQ_MANIFEST_UUID_HEX = "55555555555555555555555555555555"
EQ_LIST_UUID_HEX = "66666666666666666666666666666666"
T_EQ_MS = 1700000003000
SNAPSHOT3_SEED = bytes.fromhex("3456789abcdef012")
SNAPSHOT3_ID = (int.from_bytes(SNAPSHOT3_SEED, "big")) >> 1
EQ_FILE = f"{LOC}/data/eq-deletes-00e0/part-00000.parquet"
EQ_FILE_SIZE = 210
EQ_ROW_COUNT = 2
EQ_FIELD_IDS = [1]  # equality on `id`

# -- fourth commit: rewrite_manifests (metadata-only `replace`) — the two
# small delete manifests merge into ONE manifest of status=EXISTING
# entries that keep their ORIGINAL adding snapshot ids and sequence
# numbers (spec: rewritten manifests must carry explicit ids/seqs —
# null-field inheritance only applies inside the adding snapshot's own
# manifest); the single data manifest is carried verbatim -----------------
MERGED_MANIFEST_UUID_HEX = "77777777777777777777777777777777"
MERGED_LIST_UUID_HEX = "88888888888888888888888888888888"
T_REWRITE_MS = 1700000004000
SNAPSHOT4_SEED = bytes.fromhex("56789abcdef01234")
SNAPSHOT4_ID = (int.from_bytes(SNAPSHOT4_SEED, "big")) >> 1

# -- fifth commit: a DELETION-VECTOR delete (Iceberg v3 DVs as a v2
# engine extension): positions {0, 2} of FILE_A as a roaring bitmap in a
# deletion-vector-v1 Puffin blob; the manifest entry carries the spec's
# locator fields 143-145 and file_format PUFFIN ------------------------
DV_PUFFIN_UUID_HEX = "99999999999999999999999999999999"
DV_MANIFEST_UUID_HEX = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
DV_LIST_UUID_HEX = "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb"
T_DV_MS = 1700000005000
SNAPSHOT5_SEED = bytes.fromhex("6789abcdef012345")
SNAPSHOT5_ID = (int.from_bytes(SNAPSHOT5_SEED, "big")) >> 1
DV_POSITIONS = [0, 2]

# -- sixth commit: a SECOND deletion-vector delete on FILE_A — the v3
# spec's one-DV-per-file FOLD-ON-WRITE ("at most one deletion vector
# per data file"; a file's DV is its COMPLETE delete set to external
# readers): new positions {1, 4} are UNIONED with the prior {0, 2} into
# one vector, and the snapshot-5 entry is superseded — rewritten to
# status=DELETED (the spec's removal marker) in the SAME commit --------
DV2_PUFFIN_UUID_HEX = "cccccccccccccccccccccccccccccccc"
DV2_MANIFEST_UUID_HEX = "dddddddddddddddddddddddddddddddd"
SUPERSEDED_MANIFEST_UUID_HEX = "eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"
DV2_LIST_UUID_HEX = "ffffffffffffffffffffffffffffffff"
T_DV2_MS = 1700000006000
SNAPSHOT6_SEED = bytes.fromhex("789abcdef0123456")
SNAPSHOT6_ID = (int.from_bytes(SNAPSHOT6_SEED, "big")) >> 1
DV2_NEW_POSITIONS = [1, 4]
DV2_UNION_POSITIONS = [0, 1, 2, 4]


# ---------------------------------------------------------------------------
# Avro 1.11 binary encoding, written from the spec
# ---------------------------------------------------------------------------


def zigzag_varint(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def avro_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return zigzag_varint(len(raw)) + raw


def avro_opt_long(v: int | None) -> bytes:
    """Union ["null","long"]: branch index (0=null, 1=long) then value."""
    if v is None:
        return zigzag_varint(0)
    return zigzag_varint(1) + zigzag_varint(v)


def avro_opt_int(v: int | None) -> bytes:
    if v is None:
        return zigzag_varint(0)
    return zigzag_varint(1) + zigzag_varint(v)


def ocf(schema_json: str, extra_meta: list[tuple[str, str]], rows: list[bytes]) -> bytes:
    """Object container file: magic, metadata map (avro.schema,
    avro.codec, extras in order), sync, one data block, sync."""
    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta: list[tuple[str, bytes]] = [
        ("avro.schema", schema_json.encode("utf-8")),
        ("avro.codec", b"null"),
    ] + [(k, v.encode("utf-8")) for k, v in extra_meta]
    out.write(zigzag_varint(len(meta)))
    for k, v in meta:
        out.write(avro_str(k))
        out.write(zigzag_varint(len(v)) + v)
    out.write(zigzag_varint(0))  # map terminator
    out.write(SYNC)
    if rows:
        body = b"".join(rows)
        out.write(zigzag_varint(len(rows)))
        out.write(zigzag_varint(len(body)))
        out.write(body)
        out.write(SYNC)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Iceberg v2 table metadata (spec: "Table Metadata" fields)
# ---------------------------------------------------------------------------

SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "ts", "required": False, "type": "timestamptz"},
        {"id": 3, "name": "name", "required": False, "type": "string"},
    ],
}

SPEC_FIELDS = [
    {"name": "ts_hour", "transform": "hours", "source-id": 2, "field-id": 1000}
]

METADATA_V1 = {
    "format-version": 2,
    "table-uuid": TABLE_UUID,
    "location": LOC,
    "last-sequence-number": 0,
    "last-updated-ms": T_CREATE_MS,
    "last-column-id": 3,
    "schemas": [SCHEMA],
    "current-schema-id": 0,
    "partition-specs": [{"spec-id": 0, "fields": SPEC_FIELDS}],
    "default-spec-id": 0,
    "last-partition-id": 1000,
    "sort-orders": [{"order-id": 0, "fields": []}],
    "default-sort-order-id": 0,
    "properties": {"owner": "golden"},
    "current-snapshot-id": -1,
    "snapshots": [],
    "snapshot-log": [],
    "metadata-log": [],
    "refs": {},
}

MANIFEST_PATH = f"{LOC}/metadata/{MANIFEST_UUID_HEX}-m0.avro"
LIST_PATH = f"{LOC}/metadata/snap-{SNAPSHOT_ID}-1-{LIST_UUID_HEX}.avro"
# delete manifests carry the -m1 suffix (the writer's content-group index)
DELETE_MANIFEST_PATH = f"{LOC}/metadata/{DELETE_MANIFEST_UUID_HEX}-m1.avro"
DELETE_LIST_PATH = f"{LOC}/metadata/snap-{SNAPSHOT2_ID}-1-{DELETE_LIST_UUID_HEX}.avro"
EQ_MANIFEST_PATH = f"{LOC}/metadata/{EQ_MANIFEST_UUID_HEX}-m1.avro"
EQ_LIST_PATH = f"{LOC}/metadata/snap-{SNAPSHOT3_ID}-1-{EQ_LIST_UUID_HEX}.avro"
MERGED_MANIFEST_PATH = f"{LOC}/metadata/{MERGED_MANIFEST_UUID_HEX}-m1.avro"
MERGED_LIST_PATH = f"{LOC}/metadata/snap-{SNAPSHOT4_ID}-1-{MERGED_LIST_UUID_HEX}.avro"
DV_PUFFIN_PATH = f"{LOC}/data/dv-{DV_PUFFIN_UUID_HEX}.puffin"
DV_MANIFEST_PATH = f"{LOC}/metadata/{DV_MANIFEST_UUID_HEX}-m1.avro"
DV_LIST_PATH = f"{LOC}/metadata/snap-{SNAPSHOT5_ID}-1-{DV_LIST_UUID_HEX}.avro"
DV2_PUFFIN_PATH = f"{LOC}/data/dv-{DV2_PUFFIN_UUID_HEX}.puffin"
DV2_MANIFEST_PATH = f"{LOC}/metadata/{DV2_MANIFEST_UUID_HEX}-m1.avro"
SUPERSEDED_MANIFEST_PATH = f"{LOC}/metadata/{SUPERSEDED_MANIFEST_UUID_HEX}-m1.avro"
DV2_LIST_PATH = f"{LOC}/metadata/snap-{SNAPSHOT6_ID}-1-{DV2_LIST_UUID_HEX}.avro"


# -- manifest file (spec: "Manifests"; required v2 subset of field IDs
# plus optional lower/upper bounds as map<int, binary>) ---------------------


def _bounds_field(name: str, field_id: int, key_id: int, value_id: int) -> dict:
    return {
        "name": name,
        "type": [
            "null",
            {
                "type": "array",
                "logicalType": "map",
                "items": {
                    "type": "record",
                    "name": f"k{key_id}_v{value_id}",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": key_id},
                        {"name": "value", "type": "bytes", "field-id": value_id},
                    ],
                },
            },
        ],
        "default": None,
        "field-id": field_id,
    }


def manifest_entry(
    path: str,
    size: int,
    count: int,
    ts_hour: int | None,
    *,
    content: int = 0,
    snapshot_id: int = SNAPSHOT_ID,
    seq: int = 1,
    equality_ids: list[int] | None = None,
    status: int = 1,
    first_row_id: int | None | str = "ABSENT",
) -> bytes:
    """One manifest_entry row: record fields in declared order. The
    fixture's data files do not exist on disk, so lower/upper bounds are
    the null union branch (bounds are optional per the spec). content=1
    encodes a position-delete file, content=2 an equality-delete file
    whose equality_ids (spec field 135, array of schema field ids) name
    the columns rows are matched on (v2 merge-on-read). status=0
    (EXISTING) with an explicit foreign snapshot_id/seq is how a
    rewritten manifest records entries from ancestor snapshots."""
    lineage = (
        b"" if first_row_id == "ABSENT" else avro_opt_long(first_row_id)
    )  # v3 row lineage: first_row_id (spec field 142), appended LAST
    if equality_ids is None:
        eq = zigzag_varint(0)  # union: null branch
    else:  # union branch 1, then array: one block then terminator
        eq = (
            zigzag_varint(1)
            + zigzag_varint(len(equality_ids))
            + b"".join(zigzag_varint(i) for i in equality_ids)
            + zigzag_varint(0)
        )
    return b"".join(
        [
            zigzag_varint(status),  # status int: 1 = ADDED, 0 = EXISTING
            avro_opt_long(snapshot_id),
            avro_opt_long(seq),  # sequence_number
            avro_opt_long(seq),  # file_sequence_number
            # data_file record:
            zigzag_varint(content),  # 0 = data, 1 = pos deletes, 2 = eq
            avro_str(path),
            avro_str("PARQUET"),
            avro_opt_int(ts_hour),  # partition record: one optional int
            zigzag_varint(count),
            zigzag_varint(size),
            zigzag_varint(0),  # lower_bounds: null branch
            zigzag_varint(0),  # upper_bounds: null branch
            eq,  # equality_ids
            lineage,
        ]
    )


# data_file fields in spec order: content, file_path, file_format,
# partition, record_count, file_size_in_bytes
MANIFEST_AVRO_SCHEMA = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {
                                        "name": "ts_hour",
                                        "type": ["null", "int"],
                                        "default": None,
                                        "field-id": 1000,
                                    }
                                ],
                            },
                            "field-id": 102,
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        _bounds_field("lower_bounds", 125, 126, 127),
                        _bounds_field("upper_bounds", 128, 129, 130),
                        {
                            "name": "equality_ids",
                            "type": [
                                "null",
                                {"type": "array", "items": "int", "element-id": 136},
                            ],
                            "default": None,
                            "field-id": 135,
                        },
                    ],
                },
                "field-id": 2,
            },
        ],
}


def _manifest_meta(content: str, fv: str = "2") -> list[tuple[str, str]]:
    # metadata key order: schema, partition-spec, partition-spec-id,
    # format-version, content (the keys Iceberg manifests carry)
    return [
        ("schema", json.dumps(SCHEMA)),
        ("partition-spec", json.dumps(SPEC_FIELDS)),
        ("partition-spec-id", "0"),
        ("format-version", fv),
        ("content", content),
    ]


def build_manifest() -> bytes:
    rows = [
        manifest_entry(FILE_A, 1234, 10, 473040),
        manifest_entry(FILE_B, 567, 3, None),
    ]
    return ocf(json.dumps(MANIFEST_AVRO_SCHEMA), _manifest_meta("data"), rows)


def build_delete_manifest() -> bytes:
    """A DELETE manifest: content=1 entries (position-delete files) under
    sequence number 2, tagged content=deletes in its OCF metadata."""
    rows = [
        manifest_entry(
            DELETE_FILE,
            DELETE_FILE_SIZE,
            DELETE_ROW_COUNT,
            None,
            content=1,
            snapshot_id=SNAPSHOT2_ID,
            seq=2,
        )
    ]
    return ocf(json.dumps(MANIFEST_AVRO_SCHEMA), _manifest_meta("deletes"), rows)


# -- manifest list (spec: "Manifest Lists"; required v2 subset) -------------

MANIFEST_LIST_AVRO_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        # spec field 507: one field_summary per partition field of the
        # manifest's spec — the manifest-level pruning index
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "element-id": 508,
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                                "field-id": 509,
                            },
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                                "default": None,
                                "field-id": 518,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 511,
                            },
                        ],
                    },
                },
            ],
            "default": None,
            "field-id": 507,
        },
    ],
}


def field_summaries_col(
    contains_null: bool, lo: bytes | None = None, hi: bytes | None = None
) -> bytes:
    """The `partitions` column bytes for this fixture's single-field
    spec: union branch 1 (array), one field_summary record (spec 509 /
    518 / 510 / 511), array terminator."""

    def opt_bytes(b: bytes | None) -> bytes:
        if b is None:
            return zigzag_varint(0)  # union: null branch
        return zigzag_varint(1) + zigzag_varint(len(b)) + b

    return (
        zigzag_varint(1)  # partitions union: the array branch
        + zigzag_varint(1)  # one summary: the spec has one field
        + (b"\x01" if contains_null else b"\x00")
        + zigzag_varint(0)  # contains_nan: null
        + opt_bytes(lo)
        + opt_bytes(hi)
        + zigzag_varint(0)  # array terminator
    )


# single-value serialization of the ts_hour transform value 473040
# (appendix D: int -> 4-byte little-endian)
TS_HOUR_BOUND = struct.pack("<i", 473040)
# the data manifest: FILE_A at ts_hour=473040 plus FILE_B's null
DATA_PARTITIONS_COL = field_summaries_col(True, TS_HOUR_BOUND, TS_HOUR_BOUND)
# delete manifests: partition tuples are all-null -> no bounds
NULL_PARTITIONS_COL = field_summaries_col(True)


def _data_manifest_row(manifest_len: int) -> bytes:
    return b"".join(
        [
            avro_str(MANIFEST_PATH),
            zigzag_varint(manifest_len),
            zigzag_varint(0),  # partition_spec_id
            zigzag_varint(0),  # content: 0 = data
            zigzag_varint(1),  # sequence_number
            zigzag_varint(1),  # min_sequence_number
            zigzag_varint(SNAPSHOT_ID),
            zigzag_varint(2),  # added_files_count
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(13),  # added_rows_count = 10 + 3
            zigzag_varint(0),
            zigzag_varint(0),
            DATA_PARTITIONS_COL,
        ]
    )


def build_manifest_list(manifest_len: int) -> bytes:
    extra = [
        ("snapshot-id", str(SNAPSHOT_ID)),
        ("parent-snapshot-id", "-1"),
        ("sequence-number", "1"),
        ("format-version", "2"),
    ]
    return ocf(json.dumps(MANIFEST_LIST_AVRO_SCHEMA), extra, [_data_manifest_row(manifest_len)])


def build_delete_manifest_list(delete_manifest_len: int, data_manifest_len: int) -> bytes:
    """Snapshot 2's manifest list: the NEW delete manifest first (the
    writer prepends new manifests), then the parent's data manifest
    carried forward verbatim."""
    extra = [
        ("snapshot-id", str(SNAPSHOT2_ID)),
        ("parent-snapshot-id", str(SNAPSHOT_ID)),
        ("sequence-number", "2"),
        ("format-version", "2"),
    ]
    return ocf(
        json.dumps(MANIFEST_LIST_AVRO_SCHEMA),
        extra,
        [_delete_manifest_row(delete_manifest_len), _data_manifest_row(data_manifest_len)],
    )


def _delete_manifest_row(delete_manifest_len: int) -> bytes:
    return b"".join(
        [
            avro_str(DELETE_MANIFEST_PATH),
            zigzag_varint(delete_manifest_len),
            zigzag_varint(0),  # partition_spec_id
            zigzag_varint(1),  # content: 1 = deletes
            zigzag_varint(2),  # sequence_number
            zigzag_varint(2),  # min_sequence_number
            zigzag_varint(SNAPSHOT2_ID),
            zigzag_varint(1),  # added_files_count
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(DELETE_ROW_COUNT),  # added_rows_count
            zigzag_varint(0),
            zigzag_varint(0),
            NULL_PARTITIONS_COL,
        ]
    )


def build_eq_manifest() -> bytes:
    """A DELETE manifest holding one EQUALITY-delete file: content=2
    entry with equality_ids=[1] (the `id` column), sequence number 3."""
    rows = [
        manifest_entry(
            EQ_FILE,
            EQ_FILE_SIZE,
            EQ_ROW_COUNT,
            None,
            content=2,
            snapshot_id=SNAPSHOT3_ID,
            seq=3,
            equality_ids=EQ_FIELD_IDS,
        )
    ]
    return ocf(json.dumps(MANIFEST_AVRO_SCHEMA), _manifest_meta("deletes"), rows)


def build_eq_manifest_list(
    eq_manifest_len: int, delete_manifest_len: int, data_manifest_len: int
) -> bytes:
    """Snapshot 3's manifest list: the NEW equality-delete manifest
    first, then the parent's manifests carried forward in order."""
    extra = [
        ("snapshot-id", str(SNAPSHOT3_ID)),
        ("parent-snapshot-id", str(SNAPSHOT2_ID)),
        ("sequence-number", "3"),
        ("format-version", "2"),
    ]
    eq_row = b"".join(
        [
            avro_str(EQ_MANIFEST_PATH),
            zigzag_varint(eq_manifest_len),
            zigzag_varint(0),  # partition_spec_id
            zigzag_varint(1),  # content: 1 = deletes (eq files included)
            zigzag_varint(3),  # sequence_number
            zigzag_varint(3),  # min_sequence_number
            zigzag_varint(SNAPSHOT3_ID),
            zigzag_varint(1),  # added_files_count
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(EQ_ROW_COUNT),  # added_rows_count
            zigzag_varint(0),
            zigzag_varint(0),
            NULL_PARTITIONS_COL,
        ]
    )
    return ocf(
        json.dumps(MANIFEST_LIST_AVRO_SCHEMA),
        extra,
        [
            eq_row,
            _delete_manifest_row(delete_manifest_len),
            _data_manifest_row(data_manifest_len),
        ],
    )


def build_merged_manifest() -> bytes:
    """The rewrite_manifests output: both delete-manifest entries in one
    manifest, status EXISTING, each keeping its ORIGINAL adding snapshot
    id and explicit sequence numbers (so equality-delete applicability —
    seq strictly below the delete's — survives the rewrite byte-exactly).
    Entry order follows the source manifest order in snapshot 3's list:
    the equality manifest first, then the position-delete manifest."""
    rows = [
        manifest_entry(
            EQ_FILE,
            EQ_FILE_SIZE,
            EQ_ROW_COUNT,
            None,
            content=2,
            snapshot_id=SNAPSHOT3_ID,
            seq=3,
            equality_ids=EQ_FIELD_IDS,
            status=0,
        ),
        manifest_entry(
            DELETE_FILE,
            DELETE_FILE_SIZE,
            DELETE_ROW_COUNT,
            None,
            content=1,
            snapshot_id=SNAPSHOT2_ID,
            seq=2,
            status=0,
        ),
    ]
    return ocf(json.dumps(MANIFEST_AVRO_SCHEMA), _manifest_meta("deletes"), rows)


def build_merged_manifest_list(merged_manifest_len: int, data_manifest_len: int) -> bytes:
    """Snapshot 4's manifest list: the merged delete manifest (content=1,
    added by the REWRITING snapshot, all files counted as existing,
    min_sequence_number = the oldest merged entry's data seq) followed by
    the untouched data manifest carried verbatim."""
    extra = [
        ("snapshot-id", str(SNAPSHOT4_ID)),
        ("parent-snapshot-id", str(SNAPSHOT3_ID)),
        ("sequence-number", "4"),
        ("format-version", "2"),
    ]
    merged_row = b"".join(
        [
            avro_str(MERGED_MANIFEST_PATH),
            zigzag_varint(merged_manifest_len),
            zigzag_varint(0),  # partition_spec_id
            zigzag_varint(1),  # content: 1 = deletes
            zigzag_varint(4),  # sequence_number (the rewriting commit's)
            zigzag_varint(2),  # min_sequence_number (oldest merged entry)
            zigzag_varint(SNAPSHOT4_ID),
            zigzag_varint(0),  # added_files_count
            zigzag_varint(2),  # existing_files_count
            zigzag_varint(0),
            zigzag_varint(0),  # added_rows_count
            zigzag_varint(EQ_ROW_COUNT + DELETE_ROW_COUNT),  # existing_rows
            zigzag_varint(0),
            NULL_PARTITIONS_COL,
        ]
    )
    return ocf(
        json.dumps(MANIFEST_LIST_AVRO_SCHEMA),
        extra,
        [merged_row, _data_manifest_row(data_manifest_len)],
    )


def _totals(
    records: int, size: int, data_files: int, delete_files: int, pos: int, eq: int
) -> dict:
    """The spec's running SnapshotSummary totals, appended to every
    summary after the per-commit keys (and before caller-supplied
    snapshot properties). total-records counts DATA-file records —
    position-deleted rows stay counted until a rewrite folds them."""
    return {
        "total-records": str(records),
        "total-files-size": str(size),
        "total-data-files": str(data_files),
        "total-delete-files": str(delete_files),
        "total-position-deletes": str(pos),
        "total-equality-deletes": str(eq),
    }


def build_metadata_v2() -> dict:
    snapshot = {
        "snapshot-id": SNAPSHOT_ID,
        "parent-snapshot-id": None,
        "sequence-number": 1,
        "timestamp-ms": T_APPEND_MS,
        "manifest-list": LIST_PATH,
        "summary": {
            "operation": "append",
            "added-data-files": "2",
            "added-records": "13",
            **_totals(13, 1234 + 567, 2, 0, 0, 0),
        },
        "schema-id": 0,
    }
    md = dict(METADATA_V1)
    md["last-sequence-number"] = 1
    md["last-updated-ms"] = T_APPEND_MS
    md["snapshots"] = [snapshot]
    md["current-snapshot-id"] = SNAPSHOT_ID
    md["refs"] = {"main": {"snapshot-id": SNAPSHOT_ID, "type": "branch"}}
    md["snapshot-log"] = [{"timestamp-ms": T_APPEND_MS, "snapshot-id": SNAPSHOT_ID}]
    md["metadata-log"] = [
        {"timestamp-ms": T_CREATE_MS, "metadata-file": f"{LOC}/metadata/v1.metadata.json"}
    ]
    return md


def build_metadata_v3() -> dict:
    """Metadata after the merge-on-read delete commit: a `delete`
    snapshot whose summary counts the delete file and its rows; data
    counts are zero because no data file was added."""
    md_v2 = build_metadata_v2()
    snapshot2 = {
        "snapshot-id": SNAPSHOT2_ID,
        "parent-snapshot-id": SNAPSHOT_ID,
        "sequence-number": 2,
        "timestamp-ms": T_DELETE_MS,
        "manifest-list": DELETE_LIST_PATH,
        "summary": {
            "operation": "delete",
            "added-data-files": "0",
            "added-records": "0",
            "added-delete-files": "1",
            "added-position-deletes": str(DELETE_ROW_COUNT),
            **_totals(13, 1234 + 567 + DELETE_FILE_SIZE, 2, 1, DELETE_ROW_COUNT, 0),
            "deleted-records": str(DELETE_ROW_COUNT),
        },
        "schema-id": 0,
    }
    md = dict(md_v2)
    md["last-sequence-number"] = 2
    md["last-updated-ms"] = T_DELETE_MS
    md["snapshots"] = md_v2["snapshots"] + [snapshot2]
    md["current-snapshot-id"] = SNAPSHOT2_ID
    md["refs"] = {"main": {"snapshot-id": SNAPSHOT2_ID, "type": "branch"}}
    md["snapshot-log"] = md_v2["snapshot-log"] + [
        {"timestamp-ms": T_DELETE_MS, "snapshot-id": SNAPSHOT2_ID}
    ]
    md["metadata-log"] = md_v2["metadata-log"] + [
        {"timestamp-ms": T_APPEND_MS, "metadata-file": f"{LOC}/metadata/v2.metadata.json"}
    ]
    return md


def build_metadata_v4() -> dict:
    """Metadata after the equality-delete commit: another `delete`
    snapshot; the summary counts equality-delete rows (key tuples), not
    position deletes."""
    md_v3 = build_metadata_v3()
    snapshot3 = {
        "snapshot-id": SNAPSHOT3_ID,
        "parent-snapshot-id": SNAPSHOT2_ID,
        "sequence-number": 3,
        "timestamp-ms": T_EQ_MS,
        "manifest-list": EQ_LIST_PATH,
        "summary": {
            "operation": "delete",
            "added-data-files": "0",
            "added-records": "0",
            "added-delete-files": "1",
            "added-equality-deletes": str(EQ_ROW_COUNT),
            **_totals(
                13,
                1234 + 567 + DELETE_FILE_SIZE + EQ_FILE_SIZE,
                2,
                2,
                DELETE_ROW_COUNT,
                EQ_ROW_COUNT,
            ),
            "deleted-key-tuples": str(EQ_ROW_COUNT),
        },
        "schema-id": 0,
    }
    md = dict(md_v3)
    md["last-sequence-number"] = 3
    md["last-updated-ms"] = T_EQ_MS
    md["snapshots"] = md_v3["snapshots"] + [snapshot3]
    md["current-snapshot-id"] = SNAPSHOT3_ID
    md["refs"] = {"main": {"snapshot-id": SNAPSHOT3_ID, "type": "branch"}}
    md["snapshot-log"] = md_v3["snapshot-log"] + [
        {"timestamp-ms": T_EQ_MS, "snapshot-id": SNAPSHOT3_ID}
    ]
    md["metadata-log"] = md_v3["metadata-log"] + [
        {"timestamp-ms": T_DELETE_MS, "metadata-file": f"{LOC}/metadata/v3.metadata.json"}
    ]
    return md


def build_metadata_v5() -> dict:
    """Metadata after rewrite_manifests: a `replace` snapshot (logical
    no-op — skipped by incremental scans and changelogs) whose manifest
    list holds the merged delete manifest + the carried data manifest."""
    md_v4 = build_metadata_v4()
    snapshot4 = {
        "snapshot-id": SNAPSHOT4_ID,
        "parent-snapshot-id": SNAPSHOT3_ID,
        "sequence-number": 4,
        "timestamp-ms": T_REWRITE_MS,
        "manifest-list": MERGED_LIST_PATH,
        "summary": {
            "operation": "replace",
            "operation-detail": "rewrite_manifests",
            "rewritten-manifests": "3",
            "kept-manifests": "2",
            # a metadata-only rewrite: totals are exactly the parent's
            **_totals(
                13,
                1234 + 567 + DELETE_FILE_SIZE + EQ_FILE_SIZE,
                2,
                2,
                DELETE_ROW_COUNT,
                EQ_ROW_COUNT,
            ),
        },
        "schema-id": 0,
    }
    md = dict(md_v4)
    md["last-sequence-number"] = 4
    md["last-updated-ms"] = T_REWRITE_MS
    md["snapshots"] = md_v4["snapshots"] + [snapshot4]
    md["current-snapshot-id"] = SNAPSHOT4_ID
    md["refs"] = {"main": {"snapshot-id": SNAPSHOT4_ID, "type": "branch"}}
    md["snapshot-log"] = md_v4["snapshot-log"] + [
        {"timestamp-ms": T_REWRITE_MS, "snapshot-id": SNAPSHOT4_ID}
    ]
    md["metadata-log"] = md_v4["metadata-log"] + [
        {"timestamp-ms": T_EQ_MS, "metadata-file": f"{LOC}/metadata/v4.metadata.json"}
    ]
    return md


# ---------------------------------------------------------------------------
# Deletion-vector commit (Iceberg v3 "Deletion Vectors" blob + manifest
# locator fields 143-145), every byte derived here from the specs:
# RoaringFormatSpec portable serialization, the DV blob framing (len BE +
# magic 1681511377le + vector + CRC-32 BE), the Puffin container, and the
# Avro manifest with the three optional data_file fields.
# ---------------------------------------------------------------------------


def _dv_vector_bytes(positions=None) -> bytes:
    """64-bit portable roaring bitmap of `positions` (default
    DV_POSITIONS, {0, 2}): one 32-bit bucket (high key 0) holding an
    array container — assembled field by field from RoaringFormatSpec."""
    positions = DV_POSITIONS if positions is None else positions
    bm32 = (
        struct.pack("<I", 12346)  # SERIAL_COOKIE_NO_RUNCONTAINER
        + struct.pack("<I", 1)  # container count
        + struct.pack("<HH", 0, len(positions) - 1)  # key 0, card - 1
        + struct.pack("<I", 16)  # container offset from bitmap start
        + struct.pack(f"<{len(positions)}H", *positions)  # u16le values
    )
    return struct.pack("<Q", 1) + struct.pack("<I", 0) + bm32


def build_dv_payload(positions=None) -> bytes:
    """deletion-vector-v1 blob payload: length(BE) + magic (1681511377
    little-endian = D1 D3 39 64) + vector + CRC-32(BE) of magic+vector."""
    import zlib

    body = struct.pack("<I", 1681511377) + _dv_vector_bytes(positions)
    return struct.pack(">i", len(body)) + body + struct.pack(">I", zlib.crc32(body))


def build_dv_puffin(positions=None, seq: int = 5) -> bytes:
    magic = b"PFA1"
    payload = build_dv_payload(positions)
    blob_meta = [
        {
            "type": "deletion-vector-v1",
            "fields": [],
            "snapshot-id": -1,  # assigned at commit; the manifest locates
            "sequence-number": seq,
            "offset": 4,
            "length": len(payload),
            "properties": {
                "referenced-data-file": FILE_A,
                "cardinality": str(
                    len(DV_POSITIONS if positions is None else positions)
                ),
            },
        }
    ]
    footer_payload = json.dumps(
        {"blobs": blob_meta, "properties": {}},
        sort_keys=True,
        separators=(",", ":"),
    ).encode("utf-8")
    return (
        magic
        + payload
        + magic
        + footer_payload
        + struct.pack("<i", len(footer_payload))
        + b"\x00\x00\x00\x00"
        + magic
    )


def _manifest_schema_with_dv() -> dict:
    """The manifest entry schema with the v3 locator fields appended to
    data_file (ids 143-145) — only manifests carrying a DV use it."""
    schema = json.loads(json.dumps(MANIFEST_AVRO_SCHEMA))  # deep copy
    df_fields = schema["fields"][4]["type"]["fields"]
    df_fields.extend(
        [
            {
                "name": "referenced_data_file",
                "type": ["null", "string"],
                "default": None,
                "field-id": 143,
            },
            {
                "name": "content_offset",
                "type": ["null", "long"],
                "default": None,
                "field-id": 144,
            },
            {
                "name": "content_size_in_bytes",
                "type": ["null", "long"],
                "default": None,
                "field-id": 145,
            },
        ]
    )
    return schema


def _dv_entry_row(
    status: int,
    snapshot_id: int,
    seq: int,
    puffin_path: str,
    card: int,
    puffin_size: int,
    payload_len: int,
) -> bytes:
    """One DV manifest_entry row: content=1, file_format PUFFIN, record
    count = cardinality, plus the locator triple (referenced file,
    blob offset 4, blob length). status=2 (DELETED) with the ORIGINAL
    snapshot id and sequence numbers is how a fold-on-write commit
    supersedes a prior vector (the spec's removal marker)."""
    return b"".join(
        [
            zigzag_varint(status),
            avro_opt_long(snapshot_id),
            avro_opt_long(seq),  # sequence_number
            avro_opt_long(seq),  # file_sequence_number
            zigzag_varint(1),  # content: position deletes
            avro_str(puffin_path),
            avro_str("PUFFIN"),
            avro_opt_int(None),  # partition: ts_hour null
            zigzag_varint(card),  # record_count = cardinality
            zigzag_varint(puffin_size),
            zigzag_varint(0),  # lower_bounds null
            zigzag_varint(0),  # upper_bounds null
            zigzag_varint(0),  # equality_ids null
            zigzag_varint(1) + avro_str(FILE_A),  # referenced_data_file
            avro_opt_long(4),  # content_offset
            avro_opt_long(payload_len),  # content_size_in_bytes
        ]
    )


def build_dv_manifest(dv_puffin_size: int, dv_payload_len: int) -> bytes:
    row = _dv_entry_row(
        1, SNAPSHOT5_ID, 5, DV_PUFFIN_PATH, len(DV_POSITIONS), dv_puffin_size,
        dv_payload_len,
    )
    return ocf(
        json.dumps(_manifest_schema_with_dv()), _manifest_meta("deletes"), [row]
    )


def build_dv2_manifest(dv2_puffin_size: int, dv2_payload_len: int) -> bytes:
    """The fold commit's NEW vector: the UNION of the prior positions
    and the new matches, one ADDED entry under sequence number 6."""
    row = _dv_entry_row(
        1, SNAPSHOT6_ID, 6, DV2_PUFFIN_PATH, len(DV2_UNION_POSITIONS),
        dv2_puffin_size, dv2_payload_len,
    )
    return ocf(
        json.dumps(_manifest_schema_with_dv()), _manifest_meta("deletes"), [row]
    )


def build_superseded_dv_manifest(dv_puffin_size: int, dv_payload_len: int) -> bytes:
    """The snapshot-5 DV manifest REWRITTEN by the fold commit: the
    superseded entry flips to status=DELETED keeping its original
    snapshot id and explicit sequence numbers (inheritance resolved —
    a rewritten manifest belongs to a different snapshot), so readers
    of snapshot 6 skip it while the removal stays visible."""
    row = _dv_entry_row(
        2, SNAPSHOT5_ID, 5, DV_PUFFIN_PATH, len(DV_POSITIONS), dv_puffin_size,
        dv_payload_len,
    )
    return ocf(
        json.dumps(_manifest_schema_with_dv()), _manifest_meta("deletes"), [row]
    )


def build_dv_manifest_list(
    dv_manifest_len: int, merged_manifest_len: int, data_manifest_len: int
) -> bytes:
    """Snapshot 5's manifest list: the new DV manifest first, then the
    rewrite snapshot's manifests carried verbatim."""
    extra = [
        ("snapshot-id", str(SNAPSHOT5_ID)),
        ("parent-snapshot-id", str(SNAPSHOT4_ID)),
        ("sequence-number", "5"),
        ("format-version", "2"),
    ]
    dv_row = b"".join(
        [
            avro_str(DV_MANIFEST_PATH),
            zigzag_varint(dv_manifest_len),
            zigzag_varint(0),
            zigzag_varint(1),  # content: deletes
            zigzag_varint(5),
            zigzag_varint(5),
            zigzag_varint(SNAPSHOT5_ID),
            zigzag_varint(1),  # added_files_count
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(len(DV_POSITIONS)),  # added_rows_count
            zigzag_varint(0),
            zigzag_varint(0),
            NULL_PARTITIONS_COL,
        ]
    )
    return ocf(
        json.dumps(MANIFEST_LIST_AVRO_SCHEMA),
        extra,
        [
            dv_row,
            _merged_manifest_row(merged_manifest_len),
            _data_manifest_row(data_manifest_len),
        ],
    )


def _merged_manifest_row(merged_manifest_len: int) -> bytes:
    return b"".join(
        [
            avro_str(MERGED_MANIFEST_PATH),
            zigzag_varint(merged_manifest_len),
            zigzag_varint(0),
            zigzag_varint(1),
            zigzag_varint(4),
            zigzag_varint(2),
            zigzag_varint(SNAPSHOT4_ID),
            zigzag_varint(0),
            zigzag_varint(2),
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(EQ_ROW_COUNT + DELETE_ROW_COUNT),
            zigzag_varint(0),
            NULL_PARTITIONS_COL,
        ]
    )


def build_dv2_manifest_list(
    dv2_manifest_len: int,
    superseded_manifest_len: int,
    merged_manifest_len: int,
    data_manifest_len: int,
) -> bytes:
    """Snapshot 6's manifest list (the fold commit): the new unioned-DV
    manifest first, then the REWRITTEN superseded manifest (added under
    THIS snapshot, commit seq 6, min seq 5 from its DELETED entry,
    deleted_files_count 1 / deleted_rows_count 2), then the untouched
    carried manifests verbatim."""
    extra = [
        ("snapshot-id", str(SNAPSHOT6_ID)),
        ("parent-snapshot-id", str(SNAPSHOT5_ID)),
        ("sequence-number", "6"),
        ("format-version", "2"),
    ]
    dv2_row = b"".join(
        [
            avro_str(DV2_MANIFEST_PATH),
            zigzag_varint(dv2_manifest_len),
            zigzag_varint(0),
            zigzag_varint(1),  # content: deletes
            zigzag_varint(6),
            zigzag_varint(6),
            zigzag_varint(SNAPSHOT6_ID),
            zigzag_varint(1),  # added_files_count
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(len(DV2_UNION_POSITIONS)),  # added_rows_count
            zigzag_varint(0),
            zigzag_varint(0),
            NULL_PARTITIONS_COL,
        ]
    )
    superseded_row = b"".join(
        [
            avro_str(SUPERSEDED_MANIFEST_PATH),
            zigzag_varint(superseded_manifest_len),
            zigzag_varint(0),
            zigzag_varint(1),  # content: deletes
            zigzag_varint(6),  # sequence_number: the rewriting commit's
            zigzag_varint(5),  # min_sequence_number: the DELETED entry's
            zigzag_varint(SNAPSHOT6_ID),
            zigzag_varint(0),  # added_files_count
            zigzag_varint(0),  # existing_files_count
            zigzag_varint(1),  # deleted_files_count: the superseded DV
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(len(DV_POSITIONS)),  # deleted_rows_count
            NULL_PARTITIONS_COL,
        ]
    )
    return ocf(
        json.dumps(MANIFEST_LIST_AVRO_SCHEMA),
        extra,
        [
            dv2_row,
            superseded_row,
            _merged_manifest_row(merged_manifest_len),
            _data_manifest_row(data_manifest_len),
        ],
    )


def build_metadata_v6(dv_payload_len: int) -> dict:
    """Metadata after the deletion-vector delete: a `delete` snapshot;
    totals count the DV's BLOB SPAN (not the whole shared Puffin)."""
    md_v5 = build_metadata_v5()
    snapshot5 = {
        "snapshot-id": SNAPSHOT5_ID,
        "parent-snapshot-id": SNAPSHOT4_ID,
        "sequence-number": 5,
        "timestamp-ms": T_DV_MS,
        "manifest-list": DV_LIST_PATH,
        "summary": {
            "operation": "delete",
            "added-data-files": "0",
            "added-records": "0",
            "added-delete-files": "1",
            "added-position-deletes": str(len(DV_POSITIONS)),
            **_totals(
                13,
                1234 + 567 + DELETE_FILE_SIZE + EQ_FILE_SIZE + dv_payload_len,
                2,
                3,
                DELETE_ROW_COUNT + len(DV_POSITIONS),
                EQ_ROW_COUNT,
            ),
            "deleted-records": str(len(DV_POSITIONS)),
            "added-dvs": "1",
        },
        "schema-id": 0,
    }
    md = dict(md_v5)
    md["last-sequence-number"] = 5
    md["last-updated-ms"] = T_DV_MS
    md["snapshots"] = md_v5["snapshots"] + [snapshot5]
    md["current-snapshot-id"] = SNAPSHOT5_ID
    md["refs"] = {"main": {"snapshot-id": SNAPSHOT5_ID, "type": "branch"}}
    md["snapshot-log"] = md_v5["snapshot-log"] + [
        {"timestamp-ms": T_DV_MS, "snapshot-id": SNAPSHOT5_ID}
    ]
    md["metadata-log"] = md_v5["metadata-log"] + [
        {"timestamp-ms": T_REWRITE_MS, "metadata-file": f"{LOC}/metadata/v5.metadata.json"}
    ]
    return md


def build_metadata_v7(dv2_payload_len: int) -> dict:
    """Metadata after the FOLD commit: a `delete` snapshot that ADDS the
    unioned vector (position-delete rows 4, blob-span bytes) and
    REMOVES the superseded one (removed-delete-files/-position-deletes)
    — running totals track the LIVE set, so total-delete-files stays 3
    and total-position-deletes becomes plain deletes (4) + union (4)."""
    md_v6 = build_metadata_v6(len(build_dv_payload()))
    snapshot6 = {
        "snapshot-id": SNAPSHOT6_ID,
        "parent-snapshot-id": SNAPSHOT5_ID,
        "sequence-number": 6,
        "timestamp-ms": T_DV2_MS,
        "manifest-list": DV2_LIST_PATH,
        "summary": {
            "operation": "delete",
            "added-data-files": "0",
            "added-records": "0",
            "added-delete-files": "1",
            "added-position-deletes": str(len(DV2_UNION_POSITIONS)),
            "removed-delete-files": "1",
            "removed-position-deletes": str(len(DV_POSITIONS)),
            **_totals(
                13,
                1234 + 567 + DELETE_FILE_SIZE + EQ_FILE_SIZE + dv2_payload_len,
                2,
                3,
                DELETE_ROW_COUNT + len(DV2_UNION_POSITIONS),
                EQ_ROW_COUNT,
            ),
            "deleted-records": str(len(DV2_NEW_POSITIONS)),
            "added-dvs": "1",
        },
        "schema-id": 0,
    }
    md = dict(md_v6)
    md["last-sequence-number"] = 6
    md["last-updated-ms"] = T_DV2_MS
    md["snapshots"] = md_v6["snapshots"] + [snapshot6]
    md["current-snapshot-id"] = SNAPSHOT6_ID
    md["refs"] = {"main": {"snapshot-id": SNAPSHOT6_ID, "type": "branch"}}
    md["snapshot-log"] = md_v6["snapshot-log"] + [
        {"timestamp-ms": T_DV2_MS, "snapshot-id": SNAPSHOT6_ID}
    ]
    md["metadata-log"] = md_v6["metadata-log"] + [
        {"timestamp-ms": T_DV_MS, "metadata-file": f"{LOC}/metadata/v6.metadata.json"}
    ]
    return md


# ---------------------------------------------------------------------------
# A SEPARATE table chain for Iceberg v3 ROW LINEAGE (the main chain has
# live parquet position deletes, which the upgrade ceremony refuses by
# design): create -> upgrade_format_version(3) -> one append. Pins the
# upgrade's metadata shape (format-version 3 + next-row-id), field 142
# first_row_id in the data manifest, and the snapshot's
# first-row-id/added-rows advancing next-row-id.
# ---------------------------------------------------------------------------

LN_LOC = "/tmp/spark_graft_golden/wh/otel/gold3"
LN_TABLE_UUID = "00000000-0000-4000-8000-0000000003ab"
LN_MANIFEST_UUID_HEX = "12121212121212121212121212121212"
LN_LIST_UUID_HEX = "34343434343434343434343434343434"
T_LN_CREATE_MS = 1700000010000
T_LN_UPGRADE_MS = 1700000011000
T_LN_APPEND_MS = 1700000012000
LN_SNAPSHOT_SEED = bytes.fromhex("abcdef0123456789")
LN_SNAPSHOT_ID = (int.from_bytes(LN_SNAPSHOT_SEED, "big")) >> 1
LN_FILE_A = f"{LN_LOC}/data/b0/ts_hour=473042/part-00000.parquet"
LN_FILE_B = f"{LN_LOC}/data/b0/ts_hour=__HIVE_DEFAULT_PARTITION__/part-00001.parquet"
LN_FILE_A_SIZE, LN_FILE_A_ROWS = 777, 6
LN_FILE_B_SIZE, LN_FILE_B_ROWS = 888, 4
LN_MANIFEST_PATH = f"{LN_LOC}/metadata/{LN_MANIFEST_UUID_HEX}-m0.avro"
LN_LIST_PATH = f"{LN_LOC}/metadata/snap-{LN_SNAPSHOT_ID}-1-{LN_LIST_UUID_HEX}.avro"

# the lineage manifest schema: the v2 layout plus optional long
# first_row_id, spec field 142, appended LAST (data manifests carry no
# deletion-vector fields)
MANIFEST_LINEAGE_SCHEMA = json.loads(json.dumps(MANIFEST_AVRO_SCHEMA))
next(
    f for f in MANIFEST_LINEAGE_SCHEMA["fields"] if f["name"] == "data_file"
)["type"]["fields"].append(
    {"name": "first_row_id", "type": ["null", "long"], "default": None, "field-id": 142}
)


def _ln_manifest_meta() -> list[tuple[str, str]]:
    # same key order; location-specific schema/spec are identical by
    # construction (SCHEMA/SPEC_FIELDS are table-shape, not location)
    return _manifest_meta("data", fv="3")


def build_lineage_manifest() -> bytes:
    rows = [
        manifest_entry(
            LN_FILE_A,
            LN_FILE_A_SIZE,
            LN_FILE_A_ROWS,
            473042,
            snapshot_id=LN_SNAPSHOT_ID,
            seq=1,
            first_row_id=0,
        ),
        manifest_entry(
            LN_FILE_B,
            LN_FILE_B_SIZE,
            LN_FILE_B_ROWS,
            None,
            snapshot_id=LN_SNAPSHOT_ID,
            seq=1,
            first_row_id=LN_FILE_A_ROWS,
        ),
    ]
    return ocf(json.dumps(MANIFEST_LINEAGE_SCHEMA), _ln_manifest_meta(), rows)


LN_TS_HOUR_BOUND = struct.pack("<i", 473042)

# the v3 manifest-list schema: the v2 layout plus optional long
# first_row_id, spec field 520, appended LAST — the id-space base a
# reader assigns to ADDED data files whose per-entry field 142 is null
# (lazy inheritance); delete manifests carry null
MANIFEST_LIST_LINEAGE_AVRO_SCHEMA = json.loads(
    json.dumps(MANIFEST_LIST_AVRO_SCHEMA)
)
MANIFEST_LIST_LINEAGE_AVRO_SCHEMA["fields"].append(
    {"name": "first_row_id", "type": ["null", "long"], "default": None, "field-id": 520}
)


def build_lineage_manifest_list(manifest_len: int) -> bytes:
    extra = [
        ("snapshot-id", str(LN_SNAPSHOT_ID)),
        ("parent-snapshot-id", "-1"),
        ("sequence-number", "1"),
        ("format-version", "3"),
    ]
    row = b"".join(
        [
            avro_str(LN_MANIFEST_PATH),
            zigzag_varint(manifest_len),
            zigzag_varint(0),  # partition_spec_id
            zigzag_varint(0),  # content: data
            zigzag_varint(1),
            zigzag_varint(1),
            zigzag_varint(LN_SNAPSHOT_ID),
            zigzag_varint(2),  # added_files_count
            zigzag_varint(0),
            zigzag_varint(0),
            zigzag_varint(LN_FILE_A_ROWS + LN_FILE_B_ROWS),
            zigzag_varint(0),
            zigzag_varint(0),
            field_summaries_col(True, LN_TS_HOUR_BOUND, LN_TS_HOUR_BOUND),
            avro_opt_long(0),  # field 520: id-space base of this manifest
        ]
    )
    return ocf(json.dumps(MANIFEST_LIST_LINEAGE_AVRO_SCHEMA), extra, [row])


# -- tns chain: v3-BIRTH metadata with a NANOSECOND timestamp column --------
# (Iceberg v3 `timestamptz_ns`, spec "Primitive Types"; the engine maps
# it to Spark LongType epoch-nanos — Spark has no ns temporal type —
# and partitions hours over it with exact integer arithmetic)

TNS_TABLE_UUID = "5c9a7e31-44f2-4b8a-9d27-fd0c6b2a8e15"
TNS_LOC = "/tmp/spark_graft_golden/wh/otel/goldns"
T_TNS_CREATE_MS = 1705329000000

TNS_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "ts_ns", "required": False, "type": "timestamptz_ns"},
        {"id": 3, "name": "name", "required": False, "type": "string"},
    ],
}
TNS_SPEC_FIELDS = [
    {"name": "ts_ns_hour", "transform": "hours", "source-id": 2, "field-id": 1000}
]


def build_tns_metadata_v1() -> dict:
    """v3 BIRTH (no upgrade ceremony): format-version 3 in the first
    metadata file, next-row-id present from creation — appended LAST,
    matching the writer's dict-insertion order through JSON."""
    return {
        "format-version": 3,
        "table-uuid": TNS_TABLE_UUID,
        "location": TNS_LOC,
        "last-sequence-number": 0,
        "last-updated-ms": T_TNS_CREATE_MS,
        "last-column-id": 3,
        "schemas": [TNS_SCHEMA],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": TNS_SPEC_FIELDS}],
        "default-spec-id": 0,
        "last-partition-id": 1000,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {"owner": "golden"},
        "current-snapshot-id": -1,
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
        "refs": {},
        "next-row-id": 0,
    }


# -- var chain: v3-BIRTH metadata with a VARIANT column ----------------------
# (Iceberg v3 `variant`, spec "Primitive Types"; the engine maps it to
# Spark 4's VariantType — unshredded parquet VARIANT logical type)

VAR_TABLE_UUID = "9d4b2c80-17e5-4f63-8aa1-3be97cd04f52"
VAR_LOC = "/tmp/spark_graft_golden/wh/otel/goldvar"
T_VAR_CREATE_MS = 1705330000000

VAR_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "ts", "required": False, "type": "timestamptz"},
        {"id": 3, "name": "attrs", "required": False, "type": "variant"},
    ],
}


def build_var_metadata_v1() -> dict:
    md = json.loads(json.dumps(build_tns_metadata_v1()))
    md["table-uuid"] = VAR_TABLE_UUID
    md["location"] = VAR_LOC
    md["last-updated-ms"] = T_VAR_CREATE_MS
    md["schemas"] = [VAR_SCHEMA]
    md["partition-specs"] = [{"spec-id": 0, "fields": []}]
    md["last-partition-id"] = 999
    return md


GEO_TABLE_UUID = "c1f7aa42-6d98-4f02-9b37-51de80aa2c19"
GEO_LOC = "/tmp/spark_graft_golden/wh/otel/goldgeo"
T_GEO_CREATE_MS = 1705340000000

# Iceberg v3 geospatial types (spec "Primitive Types": geometry(C),
# geography(C, A)); type strings serialize WITH their parameters, the
# unparameterized forms mean the spec defaults (CRS OGC:CRS84,
# geography algorithm spherical)
GEO_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "shape", "required": False, "type": "geometry"},
        {
            "id": 3,
            "name": "area",
            "required": False,
            "type": "geometry(srid:3857)",
        },
        {
            "id": 4,
            "name": "route",
            "required": False,
            "type": "geography(OGC:CRS84, karney)",
        },
    ],
}


def build_geo_metadata_v1() -> dict:
    md = json.loads(json.dumps(build_var_metadata_v1()))
    md["table-uuid"] = GEO_TABLE_UUID
    md["location"] = GEO_LOC
    md["last-updated-ms"] = T_GEO_CREATE_MS
    md["schemas"] = [GEO_SCHEMA]
    md["last-column-id"] = 4
    return md


VIEW_UUID = "f0e1d2c3-b4a5-4968-8796-a5b4c3d2e1f0"
VIEW_LOC = "/tmp/spark_graft_golden/wh/otel/goldview"
T_VIEW_CREATE_MS = 1705345000000
VIEW_SQL_TEXT = "SELECT name FROM otel_gvsrc"


def build_view_metadata_v1() -> dict:
    """Iceberg VIEW spec (format-version 1) metadata, assembled from the
    spec's "View Metadata" field list: view-uuid, format-version,
    location, schemas (the SQL's output schema), current-version-id,
    versions (version-id / timestamp-ms / schema-id / summary /
    representations / default-namespace), version-log, properties. The
    representation dialect is "spark" with table references as
    `<namespace>_<table>` (the engine's documented convention)."""
    return {
        "view-uuid": VIEW_UUID,
        "format-version": 1,
        "location": VIEW_LOC,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "name", "required": False, "type": "string"}
                ],
            }
        ],
        "current-version-id": 1,
        "versions": [
            {
                "version-id": 1,
                "timestamp-ms": T_VIEW_CREATE_MS,
                "schema-id": 0,
                "summary": {
                    "engine-name": "opentelemetry-iceberg-exporter-spark",
                    "operation": "create",
                },
                "representations": [
                    {"type": "sql", "sql": VIEW_SQL_TEXT, "dialect": "spark"}
                ],
                "default-namespace": ["otel"],
            }
        ],
        "version-log": [
            {"timestamp-ms": T_VIEW_CREATE_MS, "version-id": 1}
        ],
        "properties": {"comment": "golden view"},
    }


def build_ln_metadata_v1() -> dict:
    md = dict(METADATA_V1)
    md["table-uuid"] = LN_TABLE_UUID
    md["location"] = LN_LOC
    md["last-updated-ms"] = T_LN_CREATE_MS
    return md


def build_ln_metadata_v2() -> dict:
    """The v2 -> v3 upgrade ceremony: format-version updated in place,
    next-row-id (the v3 row-lineage id space) appended as a NEW key —
    last, matching dict-insertion order through a JSON round trip."""
    md = build_ln_metadata_v1()
    md["format-version"] = 3
    md["last-updated-ms"] = T_LN_UPGRADE_MS
    md["metadata-log"] = [
        {
            "timestamp-ms": T_LN_CREATE_MS,
            "metadata-file": f"{LN_LOC}/metadata/v1.metadata.json",
        }
    ]
    md["next-row-id"] = 0
    return md


def build_ln_metadata_v3() -> dict:
    md = build_ln_metadata_v2()
    total_rows = LN_FILE_A_ROWS + LN_FILE_B_ROWS
    snapshot = {
        "snapshot-id": LN_SNAPSHOT_ID,
        "parent-snapshot-id": None,
        "sequence-number": 1,
        "timestamp-ms": T_LN_APPEND_MS,
        "manifest-list": LN_LIST_PATH,
        "summary": {
            "operation": "append",
            "added-data-files": "2",
            "added-records": str(total_rows),
            **_totals(total_rows, LN_FILE_A_SIZE + LN_FILE_B_SIZE, 2, 0, 0, 0),
        },
        "schema-id": 0,
        "first-row-id": 0,
        "added-rows": total_rows,
    }
    md["last-sequence-number"] = 1
    md["last-updated-ms"] = T_LN_APPEND_MS
    md["snapshots"] = [snapshot]
    md["current-snapshot-id"] = LN_SNAPSHOT_ID
    md["refs"] = {"main": {"snapshot-id": LN_SNAPSHOT_ID, "type": "branch"}}
    md["snapshot-log"] = [
        {"timestamp-ms": T_LN_APPEND_MS, "snapshot-id": LN_SNAPSHOT_ID}
    ]
    md["metadata-log"] = md["metadata-log"] + [
        {
            "timestamp-ms": T_LN_UPGRADE_MS,
            "metadata-file": f"{LN_LOC}/metadata/v2.metadata.json",
        }
    ]
    md["next-row-id"] = total_rows
    return md


# ---------------------------------------------------------------------------
# Puffin statistics file ("Puffin file format" spec): Magic Blob Footer,
# Footer == Magic FooterPayload FooterPayloadSize(le i32) Flags(4B) Magic
# ---------------------------------------------------------------------------

PUFFIN_SEQ = 1
PUFFIN_NDV = 5
PUFFIN_K = 64
PUFFIN_HASHES = [3, 11, 42, 900, 123456]  # ascending, < 2^60


def build_puffin() -> bytes:
    magic = b"PFA1"
    # blob payload: engine KMV sketch (KMV1 | k u32le | n u32le | u64le...)
    payload = (
        b"KMV1"
        + struct.pack("<II", PUFFIN_K, len(PUFFIN_HASHES))
        + b"".join(struct.pack("<Q", h) for h in PUFFIN_HASHES)
    )
    blob_meta = [
        {
            "type": "engine-kmv-ndv-v1",
            "fields": [1],
            "snapshot-id": SNAPSHOT_ID,
            "sequence-number": PUFFIN_SEQ,
            "offset": 4,
            "length": len(payload),
            "properties": {"ndv": str(PUFFIN_NDV)},
        }
    ]
    footer_payload = json.dumps(
        {"blobs": blob_meta, "properties": {"created-by": "otel-spark-engine"}},
        sort_keys=True,
        separators=(",", ":"),
    ).encode("utf-8")
    return (
        magic
        + payload
        + magic
        + footer_payload
        + struct.pack("<i", len(footer_payload))
        + b"\x00\x00\x00\x00"  # flags: uncompressed footer
        + magic
    )


def main() -> None:
    manifest = build_manifest()
    mlist = build_manifest_list(len(manifest))
    delete_manifest = build_delete_manifest()
    delete_list = build_delete_manifest_list(len(delete_manifest), len(manifest))
    eq_manifest = build_eq_manifest()
    eq_list = build_eq_manifest_list(
        len(eq_manifest), len(delete_manifest), len(manifest)
    )
    merged_manifest = build_merged_manifest()
    merged_list = build_merged_manifest_list(len(merged_manifest), len(manifest))
    dv_puffin = build_dv_puffin()
    dv_payload_len = len(build_dv_payload())
    dv_manifest = build_dv_manifest(len(dv_puffin), dv_payload_len)
    dv_list = build_dv_manifest_list(
        len(dv_manifest), len(merged_manifest), len(manifest)
    )
    dv2_puffin = build_dv_puffin(DV2_UNION_POSITIONS, seq=6)
    dv2_payload_len = len(build_dv_payload(DV2_UNION_POSITIONS))
    dv2_manifest = build_dv2_manifest(len(dv2_puffin), dv2_payload_len)
    superseded_manifest = build_superseded_dv_manifest(
        len(dv_puffin), dv_payload_len
    )
    dv2_list = build_dv2_manifest_list(
        len(dv2_manifest),
        len(superseded_manifest),
        len(merged_manifest),
        len(manifest),
    )
    out = {
        "manifest.avro": manifest,
        "manifest-list.avro": mlist,
        "delete-manifest.avro": delete_manifest,
        "delete-manifest-list.avro": delete_list,
        "eq-manifest.avro": eq_manifest,
        "eq-manifest-list.avro": eq_list,
        "merged-manifest.avro": merged_manifest,
        "merged-manifest-list.avro": merged_list,
        "dv.puffin": dv_puffin,
        "dv-manifest.avro": dv_manifest,
        "dv-manifest-list.avro": dv_list,
        "dv2.puffin": dv2_puffin,
        "dv2-manifest.avro": dv2_manifest,
        "superseded-dv-manifest.avro": superseded_manifest,
        "dv2-manifest-list.avro": dv2_list,
        "stats.puffin": build_puffin(),
        "ln-manifest.avro": build_lineage_manifest(),
        "ln-manifest-list.avro": build_lineage_manifest_list(
            len(build_lineage_manifest())
        ),
    }
    for name, data in out.items():
        with open(os.path.join(HERE, name), "wb") as f:
            f.write(data)
    for name, md in (
        ("v1.metadata.json", METADATA_V1),
        ("v2.metadata.json", build_metadata_v2()),
        ("v3.metadata.json", build_metadata_v3()),
        ("v4.metadata.json", build_metadata_v4()),
        ("v5.metadata.json", build_metadata_v5()),
        ("v6.metadata.json", build_metadata_v6(dv_payload_len)),
        ("v7.metadata.json", build_metadata_v7(dv2_payload_len)),
        ("ln-v1.metadata.json", build_ln_metadata_v1()),
        ("ln-v2.metadata.json", build_ln_metadata_v2()),
        ("ln-v3.metadata.json", build_ln_metadata_v3()),
        ("tns-v1.metadata.json", build_tns_metadata_v1()),
        ("var-v1.metadata.json", build_var_metadata_v1()),
        ("geo-v1.metadata.json", build_geo_metadata_v1()),
        ("view-v1.metadata.json", build_view_metadata_v1()),
    ):
        with open(os.path.join(HERE, name), "w", encoding="utf-8") as f:
            json.dump(md, f, indent=2)
    print(
        json.dumps(
            {
                "snapshot_id": SNAPSHOT_ID,
                "snapshot2_id": SNAPSHOT2_ID,
                "manifest_bytes": len(manifest),
                "list_bytes": len(mlist),
                "delete_manifest_bytes": len(delete_manifest),
                "delete_list_bytes": len(delete_list),
            }
        )
    )


if __name__ == "__main__":
    main()
