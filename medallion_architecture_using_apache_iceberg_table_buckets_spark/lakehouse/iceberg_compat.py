"""Iceberg v2 metadata adapter: the documented migration boundary.

The engine stores table state as one JSON manifest per snapshot
(``table.py``) because the Iceberg runtime jars are unavailable in
this environment. Capability-wise the two models are isomorphic, and
this module IS the isomorphism: it exports a table's metadata as an
Apache Iceberg **format-version 2** ``TableMetadata`` document (plus
per-snapshot manifest entries) and re-imports the semantic content,
so a migration shim that writes real Avro manifest files has a
single, tested seam to plug into. Field names and value spellings
follow the public Iceberg table spec
(https://iceberg.apache.org/spec/, v2).

Mapping (ours -> Iceberg v2):

=====================  ===========================================
snapshot JSON           ``snapshots[]`` entry
``snapshot_id``         ``snapshot-id`` (also ``sequence-number``:
                        our ids are a dense monotonic commit
                        sequence, which is exactly Iceberg's
                        data-sequence-number contract)
``parent_id``           ``parent-snapshot-id``
``timestamp_ms``        ``timestamp-ms``
``operation``           ``summary.operation`` — Iceberg admits only
                        {append, replace, overwrite, delete}; see
                        ``_OP_MAP`` (create->append of zero files,
                        compaction/rollback->replace: same logical
                        rows, different file set)
``files``               the snapshot's manifest: entries with
                        status EXISTING(0)/ADDED(1); ``removed``
                        files appear as DELETED(2) entries
``stats``               per-file ``lower-bounds``/``upper-bounds``/
                        ``null-value-counts`` (Iceberg stores these
                        binary-encoded per field-id; the shim keeps
                        readable values keyed by field-id)
``schema_json``         ``schemas[]`` with assigned field-ids;
                        Spark TimestampType -> ``timestamptz``,
                        TimestampNTZType -> ``timestamp``
``partition_by``        ``partition-specs[]``: ``bucket(N, c)`` ->
                        transform ``bucket[N]``, ``days(c)`` ->
                        ``day``, else ``identity``. Since r5 the
                        engine's bucket hash IS Iceberg's
                        murmur3_32 (lakehouse/murmur3.py, spec
                        Appendix-B vectors tested), so written
                        bucket partition values are spec-true
``properties``          ``properties`` (verbatim — we already use
                        Iceberg property spellings such as
                        ``write.parquet.compression-codec``)
=====================  ===========================================

Incremental-read parity (reference scripts/bronze-silver.py:149-152):
our ``Table.read_incremental(start, end)`` matches Iceberg's
``option("start-snapshot-id", s).option("end-snapshot-id", e)``
changelog scan — start EXCLUSIVE, end INCLUSIVE, append-only ranges
only. The exported ``snapshot-log`` preserves the id/timestamp pairs
that scan needs.

Since r5 :func:`export_iceberg_dir` writes the REAL on-disk shape —
Avro manifest + manifest-list files through the repo's own OCF codec
(functions/avro_codec.py), binary single-value bounds (spec
Appendix D), typed partition values parsed back from the Hive
directories, and a ``version-hint.text`` pointer. The remaining
jar-gated gaps are enumerated in ``compat_notes()``.
"""

from __future__ import annotations

import uuid
from typing import Any

from pyspark.sql import types as T

from ..schema import schema_to_json
from .table import Snapshot, Table
from .transforms import parse_spec

_OP_MAP = {
    "create": "append",
    "append": "append",
    "overwrite": "overwrite",
    "merge": "overwrite",
    "delete": "delete",
    "rollback": "replace",
    "compact": "replace",
    "replace": "replace",
}

# Iceberg entry status codes (spec: manifest entry `status`)
EXISTING, ADDED, DELETED = 0, 1, 2


def _field_id_assigner():
    next_id = [0]

    def nxt() -> int:
        next_id[0] += 1
        return next_id[0]

    return nxt


def _type_to_iceberg(dt: T.DataType, nxt) -> Any:
    """Spark type -> Iceberg type JSON (spec §Schemas). Nested types
    consume ids for their element/key/value fields, depth-first, the
    same order Iceberg's own Spark conversion assigns them."""
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = nxt()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _type_to_iceberg(f.dataType, nxt),
                }
            )
        return {"type": "struct", "fields": fields}
    if isinstance(dt, T.ArrayType):
        eid = nxt()
        return {
            "type": "list",
            "element-id": eid,
            "element": _type_to_iceberg(dt.elementType, nxt),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = nxt(), nxt()
        return {
            "type": "map",
            "key-id": kid,
            "key": _type_to_iceberg(dt.keyType, nxt),
            "value-id": vid,
            "value": _type_to_iceberg(dt.valueType, nxt),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    simple = {
        T.BooleanType: "boolean",
        T.IntegerType: "int",
        T.ShortType: "int",
        T.ByteType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.DateType: "date",
        T.TimestampType: "timestamptz",
        T.TimestampNTZType: "timestamp",
        T.StringType: "string",
        T.BinaryType: "binary",
    }
    for k, v in simple.items():
        if isinstance(dt, k):
            return v
    # Iceberg has no variant/null/interval primitive pre-v3
    return "string"


def schema_to_iceberg(schema: T.StructType, schema_id: int = 0) -> dict:
    nxt = _field_id_assigner()
    body = _type_to_iceberg(schema, nxt)
    return {"type": "struct", "schema-id": schema_id, "fields": body["fields"]}


def _top_level_field_ids(ice_schema: dict) -> dict[str, int]:
    return {f["name"]: f["id"] for f in ice_schema["fields"]}


def _max_field_id(node) -> int:
    """Highest field id anywhere in an Iceberg schema tree (nested
    element/key/value ids included) — the spec's last-column-id."""
    best = 0
    if isinstance(node, dict):
        if node.get("type") == "struct":
            for f in node["fields"]:
                best = max(best, f["id"], _max_field_id(f["type"]))
        elif node.get("type") == "list":
            best = max(best, node["element-id"], _max_field_id(node["element"]))
        elif node.get("type") == "map":
            best = max(
                best, node["key-id"], node["value-id"],
                _max_field_id(node["key"]), _max_field_id(node["value"]),
            )
    return best


# ---------------------------------------------------------------------------
# Field-id history (Iceberg's schema-evolution id contract): a column
# keeps its id across renames, a dropped id is retired forever, and a
# new column always gets last-column-id + 1. The engine's evolution
# primitives (Table.add_column/rename_column/drop_column) thread every
# change through evolve_field_ids, persisting the id-carrying schema
# in table properties — export then emits HISTORY-true ids instead of
# re-assigning positionally from the current schema (which would give
# a column a different id after any earlier column was dropped).
# ---------------------------------------------------------------------------

FIELD_IDS_PROP = "iceberg.field-ids"


def _ids_doc(prop_json: str | None, schema_before: T.StructType) -> dict:
    import json as _json

    if prop_json:
        return _json.loads(prop_json)
    ice = schema_to_iceberg(schema_before)
    return {"schema": ice, "last-column-id": _max_field_id(ice)}


def evolve_field_ids(
    prop_json: str | None,
    schema_before: T.StructType,
    action: str,
    name: str | None = None,
    new_name: str | None = None,
    dtype: T.DataType | None = None,
) -> str:
    """Apply one evolution action to the persisted id-carrying schema
    and return the new property value. ``schema_before`` seeds the
    document positionally the first time a table without the property
    evolves (its pre-evolution ids were positional by construction,
    so the seed is exact, not a guess)."""
    import json as _json

    doc = _ids_doc(prop_json, schema_before)
    fields = doc["schema"]["fields"]
    if action == "add":
        nid = [doc["last-column-id"]]

        def nxt() -> int:
            nid[0] += 1
            return nid[0]

        fields.append(
            {
                "id": nxt(),
                "name": name,
                "required": False,  # engine adds nullable columns only
                "type": _type_to_iceberg(dtype, nxt),
            }
        )
        doc["last-column-id"] = nid[0]
    elif action == "rename":
        for f in fields:
            if f["name"] == name:
                f["name"] = new_name
                break
        else:
            raise KeyError(f"no column {name!r} in the field-id history")
    elif action == "drop":
        kept = [f for f in fields if f["name"] != name]
        if len(kept) == len(fields):
            raise KeyError(f"no column {name!r} in the field-id history")
        doc["schema"]["fields"] = kept
        # last-column-id is NOT lowered: the dropped ids stay retired
    elif action == "promote":
        # widening type promotion KEEPS the field id (Iceberg's type
        # evolution contract): only the primitive type string changes
        for f in fields:
            if f["name"] == name:
                nid = [doc["last-column-id"]]

                def nxt() -> int:  # primitives consume no new ids
                    nid[0] += 1
                    return nid[0]

                f["type"] = _type_to_iceberg(dtype, nxt)
                break
        else:
            raise KeyError(f"no column {name!r} in the field-id history")
    else:
        raise ValueError(f"unknown field-id action {action!r}")
    return _json.dumps(doc)


def partition_spec_to_iceberg(
    partition_by: list[str],
    ice_schema: dict,
    spec_id: int = 0,
    field_registry: dict | None = None,
) -> dict:
    """Our spec strings -> Iceberg partition-spec JSON. Partition
    field-ids start at 1000 per the spec. ``field_registry`` (shared
    across the specs of one table) maps (source-id, transform) ->
    field-id so an evolved table reuses the SAME id for the same
    partition field across spec versions, as Iceberg does."""
    ids = _top_level_field_ids(ice_schema)
    registry = field_registry if field_registry is not None else {}
    fields = []
    for tr in parse_spec(list(partition_by)):
        if tr.kind == "bucket":
            transform, name = f"bucket[{tr.n}]", f"{tr.col}_bucket"
        elif tr.kind == "days":
            transform, name = "day", f"{tr.col}_day"
        else:
            transform, name = "identity", tr.col
        key = (ids[tr.col], transform)
        if key not in registry:
            registry[key] = 1000 + len(registry)
        fields.append(
            {
                "name": name,
                "transform": transform,
                "source-id": ids[tr.col],
                "field-id": registry[key],
            }
        )
    return {"spec-id": spec_id, "fields": fields}


def all_partition_specs(table: Table) -> list[list[str]]:
    """Ordered unique partition specs across retained history (first
    appearance order). The current snapshot's spec is always present;
    single-spec tables get a one-element list."""
    seen: list[list[str]] = []
    for s in table.snapshots():
        spec = list(s.partition_by)
        if spec not in seen:
            seen.append(spec)
    head = list(table.current_snapshot().partition_by)
    if head not in seen:
        seen.append(head)
    return seen


def snapshot_to_iceberg(
    snap: Snapshot,
    field_ids: dict[str, int],
    prev_delete_files: frozenset | None = None,
) -> dict:
    """One snapshot -> (snapshots[] entry, manifest entries).

    ``prev_delete_files`` (the parent snapshot's live position-delete
    set) classifies delete-file entries as ADDED vs EXISTING and emits
    DELETED rows for materialized ones, mirroring the data-file
    status logic."""
    added = set(snap.added_files)
    entries = []
    for f in sorted(snap.files):
        st = snap.stats.get(f, {})
        # exact row count (nulls included) is collected under the
        # reserved ":rows:" key since r5; the column entries carry
        # [lower, upper, null_count, value_count]
        rows_exact = st.get(":rows:")
        col_stats = {c: v for c, v in st.items() if c != ":rows:"}
        data_file = {
            "content": 0,  # DATA (we rewrite, never delete-files)
            "file-path": f"data/{f}",
            "file-format": "PARQUET",
        }
        if col_stats:
            data_file["lower-bounds"] = {
                field_ids[c]: v[0] for c, v in col_stats.items() if c in field_ids
            }
            data_file["upper-bounds"] = {
                field_ids[c]: v[1] for c, v in col_stats.items() if c in field_ids
            }
            data_file["null-value-counts"] = {
                field_ids[c]: v[2] for c, v in col_stats.items() if c in field_ids
            }
        if rows_exact is None:
            # legacy (pre-r5) manifests: each column's v[3] is
            # value_count + null_count, i.e. already the file row
            # count whenever that column's row groups had complete
            # stats, so max over columns is exact for them
            counts = [v[3] for v in col_stats.values() if v[3] is not None]
            rows_exact = max(counts) if counts else None
        if rows_exact is not None:
            data_file["record-count"] = rows_exact
        entries.append(
            {"status": ADDED if f in added else EXISTING, "data-file": data_file}
        )
    for f in sorted(snap.removed_files):
        entries.append(
            {"status": DELETED, "data-file": {"content": 0,
                                              "file-path": f"data/{f}",
                                              "file-format": "PARQUET"}}
        )
    # position-delete files (Iceberg content=1) alongside the data
    # entries — same ADDED/EXISTING/DELETED status protocol
    prev_dels = prev_delete_files or frozenset()
    for f in sorted(snap.delete_files):
        entries.append(
            {
                "status": ADDED if f not in prev_dels else EXISTING,
                "data-file": {"content": 1, "file-path": f"data/{f}",
                              "file-format": "PARQUET"},
            }
        )
    for f in sorted(prev_dels - set(snap.delete_files)):
        entries.append(
            {"status": DELETED, "data-file": {"content": 1,
                                              "file-path": f"data/{f}",
                                              "file-format": "PARQUET"}}
        )
    summary = {"operation": _OP_MAP.get(snap.operation, "overwrite")}
    summary.update({k: str(v) for k, v in snap.summary.items()})
    # preserve the native spelling so import is lossless
    summary["engine-operation"] = snap.operation
    # per-snapshot spec (evolution makes it vary); '|' cannot appear
    # in a spec string ('bucket(n, col)' / 'days(col)' / identifier)
    summary["engine-partition-by"] = "|".join(snap.partition_by)
    entry = {
        "snapshot-id": snap.snapshot_id,
        "sequence-number": snap.snapshot_id,
        "timestamp-ms": snap.timestamp_ms,
        "summary": summary,
        "manifest-list": f"metadata/snap-{snap.snapshot_id}.avro",
        "schema-id": 0,
    }
    if snap.parent_id is not None:
        entry["parent-snapshot-id"] = snap.parent_id
    return {"snapshot": entry, "manifest": entries}


def _sort_orders(table: Table, field_ids: dict[str, int]) -> list[dict]:
    """Iceberg sort-orders array: the unsorted order 0 plus, when the
    table declares write.sort-order, order 1 with identity-transform
    fields."""
    orders = [{"order-id": 0, "fields": []}]
    fields = []
    for col, desc in table._parse_sort_order():
        if col not in field_ids:
            continue
        fields.append(
            {
                "transform": "identity",
                "source-id": field_ids[col],
                "direction": "desc" if desc else "asc",
                "null-order": "nulls-last" if desc else "nulls-first",
            }
        )
    if fields:
        orders.append({"order-id": 1, "fields": fields})
    return orders


def table_metadata(table: Table) -> dict:
    """Export the full Iceberg v2 TableMetadata document (+ one
    manifest entry list per snapshot under ``manifests``)."""
    import json as _json

    snaps = table.snapshots()
    head = table.current_snapshot()
    ids_prop = head.properties.get(FIELD_IDS_PROP)
    if ids_prop:
        # evolution happened: use the history-true ids (renames keep
        # their id, dropped ids stay retired, adds extend the tail)
        ids_doc = _json.loads(ids_prop)
        ice_schema = ids_doc["schema"]
        last_column_id = ids_doc["last-column-id"]
    else:
        ice_schema = schema_to_iceberg(table.schema)
        last_column_id = _max_field_id(ice_schema)
    field_ids = _top_level_field_ids(ice_schema)
    specs = all_partition_specs(table)
    registry: dict = {}
    spec_docs = [
        partition_spec_to_iceberg(spec, ice_schema, i, registry)
        for i, spec in enumerate(specs)
    ]
    default_spec_id = specs.index(list(head.partition_by))
    exported = []
    prev_dels: frozenset = frozenset()
    for s in snaps:
        exported.append(snapshot_to_iceberg(s, field_ids, prev_dels))
        prev_dels = frozenset(s.delete_files)
    return {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, str(table.root))),
        "location": str(table.root),
        "last-sequence-number": head.snapshot_id,
        "last-updated-ms": head.timestamp_ms,
        "last-column-id": last_column_id,
        "schemas": [ice_schema],
        "current-schema-id": 0,
        "partition-specs": spec_docs,
        "default-spec-id": default_spec_id,
        "last-partition-id": max(
            [999]
            + [f["field-id"] for d in spec_docs for f in d["fields"]]
        ),
        # a declared write.sort-order exports as a real Iceberg sort
        # order (identity transforms; ASC->nulls-first, DESC->
        # nulls-last — the spec's SQL-default null orders)
        "sort-orders": _sort_orders(table, field_ids),
        "default-sort-order-id": (
            1 if len(_sort_orders(table, field_ids)) > 1 else 0
        ),
        # the field-id history is engine plumbing: its content IS the
        # exported "schemas" entry, so don't duplicate it as a prop
        "properties": {
            k: v for k, v in head.properties.items() if k != FIELD_IDS_PROP
        },
        "current-snapshot-id": head.snapshot_id,
        # Iceberg v2 refs map: main mirrors current-snapshot-id, the
        # engine's named branches/tags export with their spec types
        "refs": {
            "main": {
                "snapshot-id": head.snapshot_id,
                "type": "branch",
            },
            **{
                name: {"snapshot-id": r["snapshot_id"], "type": r["type"]}
                for name, r in sorted(table.refs().items())
            },
        },
        "snapshots": [e["snapshot"] for e in exported],
        "snapshot-log": [
            {"snapshot-id": s.snapshot_id, "timestamp-ms": s.timestamp_ms}
            for s in snaps
        ],
        "metadata-log": [],
        "manifests": {
            str(e["snapshot"]["snapshot-id"]): e["manifest"] for e in exported
        },
    }


def snapshot_from_iceberg(snap_entry: dict, manifest: list[dict],
                          schema_json: str, partition_by: list[str],
                          properties: dict[str, str]) -> Snapshot:
    """Import one exported snapshot back into the native shape. The
    semantic fields (ids, lineage, operation, live/added/removed file
    sets) round-trip exactly; per-file stats are not reconstructed
    (a real migration re-derives them from parquet footers)."""
    live, added, removed, dels = [], [], [], []
    for e in manifest:
        path = e["data-file"]["file-path"].removeprefix("data/")
        if e["data-file"].get("content", 0) == 1:
            # position-delete file: live set only (a DELETED entry
            # means it was materialized away — nothing to keep)
            if e["status"] != DELETED:
                dels.append(path)
            continue
        if e["status"] == DELETED:
            removed.append(path)
        else:
            live.append(path)
            if e["status"] == ADDED:
                added.append(path)
    op = snap_entry["summary"].get("engine-operation") or snap_entry[
        "summary"
    ]["operation"]
    if "engine-partition-by" in snap_entry["summary"]:
        partition_by = [
            p
            for p in snap_entry["summary"]["engine-partition-by"].split("|")
            if p
        ]
    return Snapshot(
        version=snap_entry["snapshot-id"],
        snapshot_id=snap_entry["snapshot-id"],
        parent_id=snap_entry.get("parent-snapshot-id"),
        timestamp_ms=snap_entry["timestamp-ms"],
        operation=op,
        files=sorted(live),
        added_files=sorted(added),
        removed_files=sorted(removed),
        schema_json=schema_json,
        partition_by=list(partition_by),
        properties=dict(properties),
        summary={},
        stats={},
        delete_files=sorted(dels),
    )


def _type_from_iceberg(t: Any) -> T.DataType:
    """Iceberg type JSON -> Spark type (inverse of _type_to_iceberg;
    int/short/byte and enum/uuid degrade the same way Iceberg's own
    Spark reader types them)."""
    if isinstance(t, dict):
        if t["type"] == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        _type_from_iceberg(f["type"]),
                        nullable=not f.get("required", False),
                    )
                    for f in t["fields"]
                ]
            )
        if t["type"] == "list":
            return T.ArrayType(
                _type_from_iceberg(t["element"]),
                containsNull=not t.get("element-required", False),
            )
        if t["type"] == "map":
            return T.MapType(
                _type_from_iceberg(t["key"]),
                _type_from_iceberg(t["value"]),
                valueContainsNull=not t.get("value-required", False),
            )
        raise ValueError(f"unknown iceberg type node {t!r}")
    if t.startswith("decimal("):
        p, s = t[8:-1].split(",")
        return T.DecimalType(int(p), int(s))
    simple = {
        "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "date": T.DateType(),
        "timestamptz": T.TimestampType(), "timestamp": T.TimestampNTZType(),
        "string": T.StringType(), "binary": T.BinaryType(),
        "uuid": T.StringType(),
    }
    return simple.get(t, T.StringType())


def import_table_metadata(doc: dict) -> list[Snapshot]:
    """Re-import an exported document: native snapshots in commit
    order, schema/spec/properties attached to each."""
    struct = _type_from_iceberg(
        {"type": "struct", "fields": doc["schemas"][0]["fields"]}
    )
    schema_json = schema_to_json(struct)
    spec = doc["partition-specs"][0]
    partition_by = []
    for f in spec["fields"]:
        tr = f["transform"]
        src = _name_of(doc["schemas"][0], f["source-id"])
        if tr.startswith("bucket["):
            partition_by.append(f"bucket({tr[7:-1]}, {src})")
        elif tr == "day":
            partition_by.append(f"days({src})")
        else:
            partition_by.append(src)
    out = []
    for entry in sorted(doc["snapshots"], key=lambda s: s["snapshot-id"]):
        manifest = doc["manifests"][str(entry["snapshot-id"])]
        out.append(
            snapshot_from_iceberg(
                entry, manifest, schema_json, partition_by, doc["properties"]
            )
        )
    return out


def _name_of(ice_schema: dict, field_id: int) -> str:
    for f in ice_schema["fields"]:
        if f["id"] == field_id:
            return f["name"]
    raise KeyError(field_id)


# ---------------------------------------------------------------------------
# Avro manifest / manifest-list files (spec: "Manifests", "Manifest
# Lists") written through the repo's own OCF codec
# (functions/avro_codec.py) — the on-disk layout a real Iceberg
# reader expects: metadata/vN.metadata.json + snap-<id>.avro
# (manifest list) + manifest-<id>.avro + version-hint.text.
# Field names follow the Java implementation's Avro spellings, field
# ids follow the spec tables.
# ---------------------------------------------------------------------------

_KV_INT_LONG = {
    "type": "array",
    "logicalType": "map",
    "items": {
        "type": "record",
        "name": "k121_v122",
        "fields": [
            {"name": "key", "type": "int", "field-id": 121},
            {"name": "value", "type": "long", "field-id": 122},
        ],
    },
}


def _kv_int_bytes(name: str, kid: int, vid: int) -> dict:
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": "bytes", "field-id": vid},
            ],
        },
    }


def _spec_field_name(tr) -> str:
    """Iceberg partition-field name — same spelling
    partition_spec_to_iceberg exports in the metadata JSON."""
    if tr.kind == "bucket":
        return f"{tr.col}_bucket"
    if tr.kind == "days":
        return f"{tr.col}_day"
    return tr.col


def _avro_partition_type(tr) -> Any:
    """Avro type of one partition field's VALUE (spec: bucket -> int,
    day -> date; identity covered for the scalar source types the
    engine writes partition directories for)."""
    if tr.kind == "bucket":
        return "int"
    if tr.kind == "days":
        return {"type": "int", "logicalType": "date"}
    return "string"  # identity: directory segments are strings


def _manifest_entry_schema(transforms) -> dict:
    part_fields = [
        {
            "name": _spec_field_name(tr),
            "type": ["null", _avro_partition_type(tr)],
            "default": None,
            "field-id": 1000 + i,
        }
        for i, tr in enumerate(transforms)
    ]
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {"type": "record", "name": "r102", "fields": part_fields},
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "null_value_counts", "type": ["null", _KV_INT_LONG],
             "default": None, "field-id": 110},
            {"name": "lower_bounds",
             "type": ["null", _kv_int_bytes("k126_v127", 126, 127)],
             "default": None, "field-id": 125},
            {"name": "upper_bounds",
             "type": ["null", _kv_int_bytes("k129_v130", 129, 130)],
             "default": None, "field-id": 128},
            # set only on content=2 entries (equality delete files):
            # the field ids whose values identify deleted rows
            {"name": "equality_ids",
             "type": ["null", {"type": "array", "items": "int",
                              "element-id": 136}],
             "default": None, "field-id": 135},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


_FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"],
         "default": None, "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 511},
    ],
}

MANIFEST_FILE_SCHEMA = {
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
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions",
         "type": ["null", {"type": "array", "items": _FIELD_SUMMARY}],
         "default": None, "field-id": 507},
    ],
}


def single_value_bytes(value, dt: T.DataType) -> bytes:
    """Iceberg single-value BINARY serialization (spec Appendix D):
    the encoding bounds maps use. Covers the engine's stats-eligible
    types (all fixed-width) plus strings."""
    import datetime
    import decimal
    import struct

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return struct.pack("<i", int(value))
    if isinstance(dt, T.LongType):
        return struct.pack("<q", int(value))
    if isinstance(dt, T.FloatType):
        return struct.pack("<f", float(value))
    if isinstance(dt, T.DoubleType):
        return struct.pack("<d", float(value))
    if isinstance(dt, T.BooleanType):
        return b"\x01" if value in (True, "True", "true") else b"\x00"
    if isinstance(dt, T.DateType):
        d = (
            value
            if isinstance(value, datetime.date)
            else datetime.date.fromisoformat(str(value))
        )
        return struct.pack("<i", (d - datetime.date(1970, 1, 1)).days)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        ts = (
            value
            if isinstance(value, datetime.datetime)
            else datetime.datetime.fromisoformat(str(value))
        )
        if ts.tzinfo is not None:
            epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        else:
            epoch = datetime.datetime(1970, 1, 1)
        delta = ts - epoch
        micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
        return struct.pack("<q", micros)
    if isinstance(dt, T.DecimalType):
        unscaled = int(
            decimal.Decimal(str(value)).scaleb(dt.scale).to_integral_value()
        )
        length = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(length, "big", signed=True)
    if isinstance(dt, T.StringType):
        return str(value).encode("utf-8")
    raise TypeError(f"no single-value serialization for {dt.simpleString()}")


def _partition_value(tr, file_rel: str):
    """Typed partition value of one transform, parsed back from the
    file's Hive directory segments (the writer's own encoding,
    transforms.partition_segment). None = null partition."""
    import datetime

    from .transforms import HIVE_DEFAULT_PARTITION, unescape_path_name

    prefix = f"{tr.partition_col}="
    for seg in file_rel.split("/")[:-1]:
        if seg.startswith(prefix):
            raw = unescape_path_name(seg[len(prefix):])
            if raw == HIVE_DEFAULT_PARTITION:
                return None
            if tr.kind == "bucket":
                return int(raw)
            if tr.kind == "days":
                return datetime.date.fromisoformat(raw)
            return raw
    return None


def _link_rename_if_absent(src, dst) -> bool:
    """POSIX rename-if-absent: hard-link ``src`` to ``dst`` (fails
    atomically with EEXIST when ``dst`` exists — the kernel is the
    arbiter, no read-check-write window), then drop ``src``. This is
    the same commit primitive Iceberg's HadoopTableOperations gets
    from HDFS ``rename`` (which, unlike POSIX rename, does not
    overwrite). Object stores without an atomic create-if-absent
    need a real catalog's conditional put instead — documented in
    the module docstring, not pretended here.
    """
    import os

    try:
        os.link(src, dst)
    except FileExistsError:
        return False
    os.unlink(src)
    return True


def current_metadata_version(meta_dir) -> int:
    """Current committed version: start from ``version-hint.text``
    (best-effort in the HadoopCatalog protocol — a crashed or racing
    writer may leave it stale) and WALK FORWARD while ``v<N+1>``
    exists, exactly like HadoopTableOperations.findVersion(). A
    hint-only read would pin a stale value forever; the walk always
    converges on the true head. 0 when nothing was ever committed."""
    from pathlib import Path

    meta_dir = Path(meta_dir)
    hint = meta_dir / "version-hint.text"
    version = 0
    if hint.exists():
        try:
            v = int(hint.read_text().strip())
            if (meta_dir / f"v{v}.metadata.json").exists():
                version = v
        except ValueError:
            pass
    while (meta_dir / f"v{version + 1}.metadata.json").exists():
        version += 1
    return version


def commit_metadata_atomic(meta_dir, metadata_text: str,
                           max_retries: int = 20) -> int:
    """HadoopTableOperations-protocol commit of one TableMetadata
    document: write to a uniquely named temp file, then CAS it to
    ``v<N+1>.metadata.json`` via rename-if-absent. Losing the race
    means another writer committed N+1 first — re-probe and retry on
    top of the new head (optimistic concurrency, exactly Iceberg's
    contract). The version-hint update afterwards is best-effort and
    non-atomic by design; correctness rests on the CAS alone.

    Returns the committed version number.
    """
    import uuid as _uuid
    from pathlib import Path

    meta_dir = Path(meta_dir)
    meta_dir.mkdir(parents=True, exist_ok=True)
    tmp = meta_dir / f".{_uuid.uuid4().hex}.metadata.json.tmp"
    tmp.write_text(metadata_text)
    try:
        for _ in range(max_retries):
            version = current_metadata_version(meta_dir) + 1
            if _link_rename_if_absent(tmp, meta_dir / f"v{version}.metadata.json"):
                # best-effort hint; never move it backwards for a
                # slow writer that lost many races
                hint = meta_dir / "version-hint.text"
                if current_metadata_version(meta_dir) <= version:
                    hint.write_text(str(version))
                return version
        raise RuntimeError(
            f"metadata commit lost {max_retries} races in {meta_dir}"
        )
    finally:
        tmp.unlink(missing_ok=True)


def export_iceberg_dir(table: Table, dest) -> "Path":
    """Write the full Iceberg-shaped metadata directory for ``table``:

    - ``metadata/manifest-<sid>.avro`` — one v2 manifest per snapshot
      (status/sequence-number/data_file with partition values,
      record counts, and BINARY single-value bounds), through the
      repo's own OCF codec;
    - ``metadata/snap-<sid>.avro`` — the manifest list;
    - ``metadata/v<N>.metadata.json`` — the TableMetadata document
      (manifest-list paths pointing at the snap files);
    - ``metadata/version-hint.text`` — the HadoopCatalog-convention
      current-version pointer.

    The export dir is SELF-CONTAINED: data files are hardlinked
    (copy-free; copy fallback across devices) under ``dest/data/``,
    and pending MOR delta files are translated into Iceberg v2
    equality-delete + data file pairs under ``dest/data/__mor__/``
    with a per-snapshot DELETE manifest (content=1) alongside the
    data manifest. Every ``file_path`` resolves against ``dest``.
    """
    import os
    from pathlib import Path

    from ..functions.avro_codec import write_container_file
    from .transforms import parse_spec

    dest = Path(dest)
    meta_dir = dest / "metadata"
    meta_dir.mkdir(parents=True, exist_ok=True)

    doc = table_metadata(table)
    snaps = table.snapshots()
    ice_schema = doc["schemas"][0]
    field_ids = _top_level_field_ids(ice_schema)
    dtypes = {f.name: f.dataType for f in table.schema.fields}
    # one partition spec per retained layout: after a spec evolution
    # the export writes PER-SPEC manifests (an Avro manifest's
    # partition record type is fixed by its spec), matching files to
    # specs by their path signature
    specs = all_partition_specs(table)
    spec_transforms = [parse_spec(list(s)) for s in specs]
    spec_entry_schema = [
        _manifest_entry_schema(trs) for trs in spec_transforms
    ]
    sig_to_spec: dict[tuple, int] = {}
    for _i, _trs in enumerate(spec_transforms):
        sig_to_spec.setdefault(
            tuple(t.partition_col for t in _trs), _i
        )
    head_spec_id = specs.index(list(table.current_snapshot().partition_by))
    multi_spec = len(specs) > 1

    def _spec_of(rel: str) -> int:
        sig = tuple(seg.split("=", 1)[0] for seg in rel.split("/")[:-1])
        return sig_to_spec.get(sig, head_spec_id)


    # first snapshot each file appeared in = its data sequence number
    first_seq: dict[str, int] = {}
    rows_of: dict[str, int] = {}
    for s in snaps:
        for f in s.files:
            first_seq.setdefault(f, s.snapshot_id)
            st = s.stats.get(f)
            if st and st.get(":rows:") is not None:
                rows_of.setdefault(f, st[":rows:"])

    # ---- MOR delta translation: v2 equality-delete + data pairs ----
    # The engine's merge-delta file holds full rows tagged _op=u/d.
    # Iceberg's spelling of the same state: an equality DELETE file
    # (key values of every delta row — an upsert equality-deletes its
    # older copy too) at the delta's sequence number, plus a plain
    # data file holding the upserted rows. The sequence rule
    # (equality deletes hit data files with seq STRICTLY LESS) gives
    # exactly the engine's newest-sequence-wins resolve, including
    # across chained deltas. Translation happens offline via pyarrow;
    # the translated pair lives under data/__mor__/<snap>/ inside the
    # export dir, with the ORIGINAL relative path flattened into the
    # file name so import can fuse the pair back into a native delta.
    delta_info: dict[str, dict] = {}
    for s in snaps:
        if s.operation == "merge-delta":
            keys = [
                k for k in s.properties.get("merge-on-read.key", "").split(",") if k
            ]
            for f in s.added_files:
                delta_info.setdefault(f, {"snap": s.snapshot_id, "keys": keys})
    if delta_info:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for f, info in delta_info.items():
            tbl = pq.read_table(table.data_root / f)
            # identity-partition key columns live only in the Hive
            # path of a partitioned delta parquet — re-inject them
            # (typed per the table schema) so an equality delete
            # keyed on a partition column exports its key values
            missing = [k for k in info["keys"] if k not in tbl.column_names]
            if missing:
                import pyarrow as pa

                from .transforms import (
                    HIVE_DEFAULT_PARTITION,
                    unescape_path_name,
                )

                pvals: dict[str, str | None] = {}
                for seg in f.split("/")[:-1]:
                    if "=" in seg:
                        c, v = seg.split("=", 1)
                        v = unescape_path_name(v)
                        pvals[c] = (
                            None if v == HIVE_DEFAULT_PARTITION else v
                        )
                stypes = {sf.name: sf.dataType.simpleString()
                          for sf in table.schema.fields}
                for k in missing:
                    if k not in pvals:
                        raise ValueError(
                            f"equality-delete key column {k!r} absent "
                            f"from delta file {f} and its partition path"
                        )
                    raw = pvals[k]
                    st = stypes.get(k, "string")
                    if raw is None:
                        val, typ = None, pa.string()
                    elif st in ("int", "integer"):
                        val, typ = int(raw), pa.int32()
                    elif st in ("bigint", "long"):
                        val, typ = int(raw), pa.int64()
                    elif st == "date":
                        import datetime

                        val = datetime.date.fromisoformat(raw)
                        typ = pa.date32()
                    elif st == "double":
                        val, typ = float(raw), pa.float64()
                    elif st == "float":
                        val, typ = float(raw), pa.float32()
                    elif st == "string":
                        val, typ = raw, pa.string()
                    else:
                        # stringifying silently would never equality-
                        # match the typed data-file side
                        # (_cast_partition) and deleted rows would
                        # resurrect in the round-trip — fail loud,
                        # mirroring _cast_partition's contract
                        raise NotImplementedError(
                            f"equality-delete partition-key"
                            f" re-injection for type {st!r} is not"
                            f" implemented"
                        )
                    tbl = tbl.append_column(
                        k, pa.array([val] * tbl.num_rows, type=typ)
                    )
            flat = f.replace("/", "%2F")
            d = dest / "data" / "__mor__" / str(info["snap"])
            d.mkdir(parents=True, exist_ok=True)
            data_part = tbl.filter(pc.equal(tbl.column("_op"), "u")).drop(["_op"])
            del_part = tbl.select(info["keys"])
            data_rel = f"data/__mor__/{info['snap']}/{flat}.data.parquet"
            del_rel = f"data/__mor__/{info['snap']}/{flat}.eqdel.parquet"
            pq.write_table(data_part, dest / data_rel)
            pq.write_table(del_part, dest / del_rel)
            info.update(
                data_rel=data_rel, del_rel=del_rel,
                data_rows=data_part.num_rows, del_rows=del_part.num_rows,
            )

    # ---- position-delete translation: v2 position-delete files ----
    # The engine's delete file stores (file_name basename, pos);
    # Iceberg wants (file_path, pos) under the RESERVED field-ids
    # 2147483546/2147483545, sorted by (file_path, pos), and
    # PARTITION-SCOPED in a partitioned spec (real readers index
    # deletes by partition value) — so each engine delete file splits
    # into one translated part per target-partition directory.
    posdel_parts: dict[str, list[dict]] = {}
    _posdel_first: dict[str, int] = {}
    for s in snaps:
        for f in s.delete_files:
            _posdel_first.setdefault(f, s.snapshot_id)
    if _posdel_first:
        import pyarrow as pa
        import pyarrow.parquet as pq

        base_rel: dict[str, str] = {}
        for s in snaps:
            for data_f in s.files:
                base_rel.setdefault(data_f.rsplit("/", 1)[-1], data_f)
        pos_schema = pa.schema(
            [
                pa.field("file_path", pa.string(), nullable=False,
                         metadata={b"PARQUET:field_id": b"2147483546"}),
                pa.field("pos", pa.int64(), nullable=False,
                         metadata={b"PARQUET:field_id": b"2147483545"}),
            ]
        )
        for f, first_snap in _posdel_first.items():
            tbl = pq.read_table(table.data_root / f)
            pairs = sorted(
                (base_rel.get(n, n), p)
                for n, p in zip(
                    tbl.column("file_name").to_pylist(),
                    tbl.column("pos").to_pylist(),
                )
            )
            groups: dict[str, list] = {}
            for rel, p in pairs:
                part_dir = rel.rsplit("/", 1)[0] if "/" in rel else ""
                groups.setdefault(part_dir, []).append((rel, p))
            (dest / "data" / "__posdel__" / str(first_snap)).mkdir(
                parents=True, exist_ok=True
            )
            first_seq.setdefault(f, first_snap)
            parts = []
            for k, (_part_dir, rows) in enumerate(sorted(groups.items())):
                rel_out = (
                    f"data/__posdel__/{first_snap}/{f}.{k}.posdel.parquet"
                )
                out = pa.table(
                    {
                        "file_path": [f"data/{r}" for r, _ in rows],
                        "pos": [p for _, p in rows],
                    },
                    schema=pos_schema,
                )
                pq.write_table(out, dest / rel_out)
                parts.append(
                    {"rel": rel_out, "rows": out.num_rows,
                     "sample": rows[0][0]}
                )
            posdel_parts[f] = parts

    # hardlink (copy-free) every untranslated data file into
    # dest/data/ so the export dir is a SELF-CONTAINED Iceberg table:
    # every file_path below resolves against dest, nothing points
    # back into the engine's directory
    all_files: set[str] = set()
    for s in snaps:
        all_files.update(s.files)
        all_files.update(s.removed_files)
    import shutil as _shutil

    for f in all_files - set(delta_info):
        src, dst = table.data_root / f, dest / "data" / f
        if dst.exists() or not src.exists():
            continue
        dst.parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            _shutil.copy2(src, dst)

    def _data_file_record(f: str, snap: Snapshot) -> dict:
        st = {
            c: v
            for c, v in snap.stats.get(f, {}).items()
            if c != ":rows:" and c in field_ids
        }
        part = {
            _spec_field_name(tr): _partition_value(tr, f)
            for tr in spec_transforms[_spec_of(f)]
        }
        path_on_disk = table.data_root / f
        size = os.stat(path_on_disk).st_size if path_on_disk.exists() else 0
        rec: dict = {
            "content": 0,
            "file_path": f"data/{f}",
            "file_format": "PARQUET",
            "partition": part,
            "record_count": rows_of.get(f, 0),
            "file_size_in_bytes": size,
        }
        if st:
            rec["null_value_counts"] = [
                {"key": field_ids[c], "value": v[2]} for c, v in st.items()
            ]
            rec["lower_bounds"] = [
                {"key": field_ids[c],
                 "value": single_value_bytes(v[0], dtypes[c])}
                for c, v in st.items() if v[0] is not None
            ]
            rec["upper_bounds"] = [
                {"key": field_ids[c],
                 "value": single_value_bytes(v[1], dtypes[c])}
                for c, v in st.items() if v[1] is not None
            ]
        return rec

    def _mor_records(f: str):
        """(data-part record | None, delete-part record) for one
        translated delta file. Partition values parse from the
        ORIGINAL relative path (delta files are partition-laid-out);
        file paths point at the translated pair."""
        info = delta_info[f]
        part = {
            _spec_field_name(tr): _partition_value(tr, f)
            for tr in spec_transforms[_spec_of(f)]
        }

        def rec(rel: str, rows: int, content: int) -> dict:
            r = {
                "content": content,
                "file_path": rel,
                "file_format": "PARQUET",
                "partition": part,
                "record_count": rows,
                "file_size_in_bytes": os.stat(dest / rel).st_size,
            }
            if content == 2:
                r["equality_ids"] = [field_ids[k] for k in info["keys"]]
            return r

        data_rec = (
            rec(info["data_rel"], info["data_rows"], 0)
            if info["data_rows"] else None
        )
        return data_rec, rec(info["del_rel"], info["del_rows"], 2)

    def _posdel_record(part: dict) -> dict:
        prt = {
            _spec_field_name(tr): _partition_value(tr, part["sample"])
            for tr in spec_transforms[_spec_of(part["sample"])]
        }
        return {
            "content": 1,  # POSITION_DELETES
            "file_path": part["rel"],
            "file_format": "PARQUET",
            "partition": prt,
            "record_count": part["rows"],
            "file_size_in_bytes": os.stat(dest / part["rel"]).st_size,
        }

    list_records_by_snap: dict[int, list] = {}
    prev_posdel: set[str] = set()
    for snap in snaps:
        added = set(snap.added_files)

        def _entry(status: int, f: str, rec: dict) -> dict:
            seq = first_seq.get(f, snap.snapshot_id)
            return {
                "status": status,
                "snapshot_id": seq if status != DELETED else snap.snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": rec,
                # manifest-grouping tag, popped before the Avro write
                "_spec": _spec_of(f),
            }

        entries: list[dict] = []
        delete_entries: list[dict] = []
        for f in sorted(snap.files):
            status = ADDED if f in added else EXISTING
            if f in delta_info:
                data_rec, del_rec = _mor_records(f)
                if data_rec is not None:
                    entries.append(_entry(status, f, data_rec))
                delete_entries.append(_entry(status, f, del_rec))
            else:
                entries.append(_entry(status, f, _data_file_record(f, snap)))
        for f in sorted(snap.removed_files):
            if f in delta_info:
                data_rec, del_rec = _mor_records(f)
                if data_rec is not None:
                    entries.append(_entry(DELETED, f, data_rec))
                delete_entries.append(_entry(DELETED, f, del_rec))
            else:
                entries.append(
                    _entry(DELETED, f, _data_file_record(f, snap))
                )
        # position-delete entries: ADDED on first appearance,
        # EXISTING while carried, DELETED when a rewrite materializes
        # them away (sequence number = the delete's commit snapshot,
        # which exceeds every target data file's — the v2 rule
        # "applies to data files with seq <= delete seq" holds)
        cur_posdel = set(snap.delete_files)
        for f in sorted(cur_posdel):
            status = ADDED if f not in prev_posdel else EXISTING
            for part in posdel_parts.get(f, []):
                e = _entry(status, f, _posdel_record(part))
                # delete parts group under their TARGET's spec (the
                # engine delete file itself is layout-flat)
                e["_spec"] = _spec_of(part["sample"])
                delete_entries.append(e)
        for f in sorted(prev_posdel - cur_posdel):
            for part in posdel_parts.get(f, []):
                e = _entry(DELETED, f, _posdel_record(part))
                e["_spec"] = _spec_of(part["sample"])
                delete_entries.append(e)
        prev_posdel = cur_posdel
        def _pop_specs(es: list[dict]) -> dict[int, list[dict]]:
            by: dict[int, list[dict]] = {}
            for e in es:
                by.setdefault(e.pop("_spec"), []).append(e)
            return by

        def _summaries(k: int) -> list[dict]:
            """Per-partition-field summaries over THIS spec's live
            files in the snapshot."""
            live = [f for f in snap.files if _spec_of(f) == k]
            out = []
            for tr in spec_transforms[k]:
                vals = [_partition_value(tr, f) for f in live]
                non_null = [v for v in vals if v is not None]
                part_dt = (
                    T.IntegerType() if tr.kind == "bucket"
                    else T.DateType() if tr.kind == "days"
                    else T.StringType()
                )
                out.append(
                    {
                        "contains_null": any(v is None for v in vals),
                        "contains_nan": False,
                        "lower_bound": single_value_bytes(
                            min(non_null), part_dt
                        ) if non_null else None,
                        "upper_bound": single_value_bytes(
                            max(non_null), part_dt
                        ) if non_null else None,
                    }
                )
            return out

        def _list_record(path, man_entries, content: int, k: int) -> dict:
            seqs = [e["sequence_number"] for e in man_entries] or [
                snap.snapshot_id
            ]
            by = {ADDED: [], EXISTING: [], DELETED: []}
            for e in man_entries:
                by[e["status"]].append(e["data_file"]["record_count"])
            return {
                "manifest_path": f"metadata/{path.name}",
                "manifest_length": os.stat(path).st_size,
                "partition_spec_id": k,
                "content": content,  # 0 = data, 1 = deletes
                "sequence_number": snap.snapshot_id,
                "min_sequence_number": min(seqs),
                "added_snapshot_id": snap.snapshot_id,
                "added_data_files_count": len(by[ADDED]),
                "existing_data_files_count": len(by[EXISTING]),
                "deleted_data_files_count": len(by[DELETED]),
                "added_rows_count": sum(by[ADDED]),
                "existing_rows_count": sum(by[EXISTING]),
                "deleted_rows_count": sum(by[DELETED]),
                "partitions": _summaries(k) if spec_transforms[k] else None,
            }

        def _name(k: int, kind: str) -> str:
            # single-spec tables keep the historical flat names
            mid = f"-s{k}" if multi_spec else ""
            return f"manifest-{snap.snapshot_id}{mid}{kind}.avro"

        data_by_spec = _pop_specs(entries)
        if not data_by_spec:
            data_by_spec = {head_spec_id: []}  # empty create snapshot
        recs: list[dict] = []
        for k, es in sorted(data_by_spec.items()):
            p = meta_dir / _name(k, "")
            write_container_file(p, spec_entry_schema[k], es)
            recs.append(_list_record(p, es, 0, k))
        for k, es in sorted(_pop_specs(delete_entries).items()):
            p = meta_dir / _name(k, "-deletes")
            write_container_file(p, spec_entry_schema[k], es)
            recs.append(_list_record(p, es, 1, k))
        list_records_by_snap[snap.snapshot_id] = recs
        write_container_file(
            meta_dir / f"snap-{snap.snapshot_id}.avro",
            MANIFEST_FILE_SCHEMA,
            recs,
        )

    # TableMetadata JSON: drop the engine's inline "manifests"
    # extension — the Avro files are now the real thing
    import json as _json

    doc.pop("manifests", None)
    # sequential version allocated by the HadoopCatalog CAS protocol
    # (rename-if-absent on v<N+1>.metadata.json): re-exports of an
    # evolving table into the same dir commit v1, v2, ... and racing
    # writers serialize without locks
    commit_metadata_atomic(meta_dir, _json.dumps(doc, indent=2, default=str))
    return dest


def import_iceberg_dir(dest) -> list[Snapshot]:
    """Inverse of :func:`export_iceberg_dir`: follow
    version-hint.text -> vN.metadata.json -> snap-<id>.avro manifest
    lists -> manifest-<id>.avro entry files (all read through the
    repo's own OCF codec) and rebuild native snapshots. Proves the
    exported Avro layout is complete enough to reconstruct the table
    without the engine's JSON manifests."""
    import json as _json
    from pathlib import Path

    from ..functions.avro_codec import read_container_file

    meta_dir = Path(dest) / "metadata"
    version = current_metadata_version(meta_dir)  # hint + forward walk
    doc = _json.loads((meta_dir / f"v{version}.metadata.json").read_text())

    manifests: dict[str, list[dict]] = {}
    for snap_entry in doc["snapshots"]:
        sid = snap_entry["snapshot-id"]
        _, mlist = read_container_file(meta_dir / f"snap-{sid}.avro")
        entries_json = []
        seen: set[tuple[int, str]] = set()
        for mf in mlist:
            man_file = meta_dir / Path(mf["manifest_path"]).name
            _, entries = read_container_file(man_file)
            for e in entries:
                path = e["data_file"]["file_path"]
                # fuse a translated MOR pair (data/__mor__/<snap>/
                # <flattened-orig>.{data,eqdel}.parquet) back into the
                # single native delta file it came from: both halves
                # carry the original relative path in their flattened
                # file name
                content = e["data_file"].get("content", 0)
                if path.startswith("data/__mor__/"):
                    flat = path.rsplit("/", 1)[-1]
                    for suffix in (".data.parquet", ".eqdel.parquet"):
                        if flat.endswith(suffix):
                            flat = flat.removesuffix(suffix)
                    path = "data/" + flat.replace("%2F", "/")
                    content = 0  # fused back to the native delta file
                if path.startswith("data/__posdel__/"):
                    # fuse the per-partition translated parts
                    # (<orig>.<k>.posdel.parquet) back to the single
                    # native delete file they came from
                    flat = path.rsplit("/", 1)[-1]
                    stem = flat.rsplit(".posdel.parquet", 1)[0]
                    stem = stem.rsplit(".", 1)[0]  # strip part index
                    path = "data/" + stem
                    content = 1
                key = (e["status"], path)
                if key in seen:
                    continue
                seen.add(key)
                entries_json.append(
                    {
                        "status": e["status"],
                        "data-file": {"file-path": path,
                                      "content": content},
                    }
                )
        manifests[str(sid)] = entries_json
    doc = dict(doc)
    doc["manifests"] = manifests
    return import_table_metadata(doc)


def read_exported_table(dest):
    """Spec-following EXTERNAL reader: reconstruct the CURRENT rows of
    an exported directory from the Iceberg-convention artifacts ONLY —
    version-hint.text / vN.metadata.json / snap-*.avro manifest lists /
    manifest Avro files / parquet data+delete files. No engine JSON,
    no native :class:`Table`. Returns a pandas DataFrame (column order
    per the Iceberg schema; row order unspecified).

    This is the round-trip test's proof that a reader implementing the
    published v2 protocol discovers and resolves the table with
    nothing engine-specific (the engine's own scan path is
    ``Table.scan``; this function deliberately shares no code with
    it). Protocol implemented:

    - catalog pointer: ``current_metadata_version`` (version-hint +
      HadoopTableOperations forward walk) names the metadata document;
    - ``current-snapshot-id`` picks the snapshot; its ``manifest-list``
      Avro names the manifests;
    - live entries (status != DELETED) of content=0 manifests are the
      data files; content=1 manifests carry delete files;
    - position deletes (record content=1) drop ``(file_path, pos)``
      rows from data files with ``sequence_number <=`` the delete's;
    - equality deletes (record content=2) drop rows matching the
      delete rows' ``equality_ids`` columns from data files with
      ``sequence_number`` STRICTLY below the delete's;
    - identity partition values (path-only in the data files, Spark
      ``partitionBy`` layout) are re-injected from each entry's
      manifest ``partition`` record and cast per the Iceberg schema —
      exactly what a spec reader does with metadata-only columns.

    Driver-side pyarrow/pandas by design: it is the verification twin
    for modest fixtures, not a scale path.
    """
    import json as _json
    from pathlib import Path

    import pandas as pd
    import pyarrow.parquet as _pq

    from ..functions.avro_codec import read_container_file

    dest = Path(dest)
    meta_dir = dest / "metadata"
    version = current_metadata_version(meta_dir)
    doc = _json.loads((meta_dir / f"v{version}.metadata.json").read_text())
    cur_id = doc["current-snapshot-id"]
    snap_entry = next(
        s for s in doc["snapshots"] if s["snapshot-id"] == cur_id
    )

    # resolve the CURRENT schema by id (a spec reader never assumes
    # schemas[0] is current — schema evolution appends)
    cur_schema_id = doc.get("current-schema-id", 0)
    schema_doc = next(
        (s for s in doc["schemas"] if s.get("schema-id") == cur_schema_id),
        doc["schemas"][0],
    )
    schema_fields = schema_doc["fields"]
    fid_to_name = {f["id"]: f["name"] for f in schema_fields}
    col_order = [f["name"] for f in schema_fields]
    col_type = {f["name"]: f["type"] for f in schema_fields}

    _, mlist = read_container_file(dest / snap_entry["manifest-list"])
    data_entries: list[dict] = []
    pos_deletes: list[dict] = []
    eq_deletes: list[dict] = []
    for mf in mlist:
        _, entries = read_container_file(dest / mf["manifest_path"])
        for e in entries:
            if e["status"] == DELETED:
                continue
            rec = e["data_file"]
            # v2 sequence-number inheritance: an ADDED entry may leave
            # sequence_number null and inherit the manifest's own
            # sequence number from the manifest list
            seq = e.get("sequence_number")
            if seq is None:
                seq = mf.get("sequence_number")
            item = {
                "path": rec["file_path"],
                "seq": seq,
                "partition": rec.get("partition") or {},
                "equality_ids": rec.get("equality_ids"),
            }
            content = rec.get("content", 0)
            (data_entries if content == 0
             else pos_deletes if content == 1
             else eq_deletes).append(item)

    # (file_path -> [(pos, delete_seq)]) from every live position-
    # delete file; applied per target data file below
    posmap: dict[str, list[tuple[int, int]]] = {}
    for d in pos_deletes:
        t = _pq.read_table(dest / d["path"])
        for fp, p in zip(t.column("file_path").to_pylist(),
                         t.column("pos").to_pylist()):
            posmap.setdefault(fp, []).append((p, d["seq"]))

    # equality deletes: the delete rows' key tuples + their seq
    eqs = []
    for d in eq_deletes:
        cols = [fid_to_name[i] for i in d["equality_ids"]]
        t = _pq.read_table(dest / d["path"], columns=cols)
        keys = set(zip(*(t.column(c).to_pylist() for c in cols)))
        eqs.append({"seq": d["seq"], "cols": cols, "keys": keys})

    def _cast_partition(val, ice_type):
        if val is None or not isinstance(val, str):
            return val  # already typed (bucket int / days date)
        if ice_type in ("int", "long"):
            return int(val)
        if ice_type == "date":
            import datetime

            return datetime.date.fromisoformat(val)
        if ice_type == "float":
            # quantize through float32 so the injected value compares
            # equal to float32 values read from parquet (0.1 as
            # float64 != 0.1 as float32)
            import struct

            return struct.unpack("f", struct.pack("f", float(val)))[0]
        if ice_type == "double":
            return float(val)
        if ice_type == "string":
            return val
        raise NotImplementedError(
            f"identity partition re-injection for Iceberg type "
            f"{ice_type!r} not needed by any fixture yet"
        )

    frames = []
    for de in data_entries:
        pdf = _pq.read_table(dest / de["path"]).to_pandas()
        pdf.index = range(len(pdf))  # row ordinal IS the spec 'pos'
        drop = {
            p for p, dseq in posmap.get(de["path"], []) if de["seq"] <= dseq
        }
        if drop:
            pdf = pdf[~pdf.index.isin(drop)]
        # metadata-only identity partition columns — injected BEFORE
        # equality deletes so a delete keyed on a partition column
        # sees its values (the spec reads these from manifest
        # partition metadata exactly like any other column)
        for pname, pval in de["partition"].items():
            if pname not in pdf.columns and pname in col_type:
                pdf[pname] = _cast_partition(pval, col_type[pname])
        for eq in eqs:
            if de["seq"] < eq["seq"] and len(pdf):
                missing = [c for c in eq["cols"] if c not in pdf.columns]
                if missing:
                    # silently skipping would resurrect deleted rows
                    raise ValueError(
                        f"equality-delete key column(s) {missing} absent "
                        f"from data file {de['path']}"
                    )
                keyvals = list(zip(*(pdf[c] for c in eq["cols"])))
                pdf = pdf[[kv not in eq["keys"] for kv in keyvals]]
        frames.append(pdf)

    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=col_order
    )
    return out[[c for c in col_order if c in out.columns]]


def compat_notes() -> list[str]:
    """The enumerated gap list a real-Iceberg migration shim must
    close (everything else round-trips through this module).

    Closed in r5 (no longer listed): murmur3 bucket hashing (the
    engine's bucket transform IS the spec hash, lakehouse/murmur3.py);
    Avro manifest/manifest-list files + binary single-value bounds +
    version-hint.text (export_iceberg_dir); the catalog pointer's
    ATOMIC swap (commit_metadata_atomic — HadoopTableOperations'
    rename-if-absent CAS with findVersion forward-walk; POSIX/HDFS
    semantics — an object store without atomic create-if-absent still
    needs a real catalog's conditional put); schema-history field-ids
    (evolve_field_ids + FIELD_IDS_PROP — renames keep their id,
    dropped ids are retired forever, adds take last-column-id + 1,
    threaded through every ALTER primitive and preferred at export);
    MOR equality deletes (pending merge-delta files translate to v2
    equality-delete + data pairs with per-snapshot DELETE manifests —
    the sequence rule reproduces newest-wins resolve exactly).

    Closed later in r5: position deletes — ``write.delete.mode =
    merge-on-read`` DELETEs commit native (file_name, pos) delete
    files which export as v2 position-delete parquet (reserved
    field-ids 2147483546/2147483545, sorted, split per target
    partition value) under content=1 DELETE manifests."""
    return [
        "pre-existing tables that evolved before this engine version "
        "have no recorded id history; their first post-upgrade ALTER "
        "seeds ids positionally from the then-current schema",
    ]
