"""Schema history — offset-versioned table schemas (DDL side channel).

The reference parses DDL from the log and keeps an embedded schema history
so every change event deserializes against the schema THAT WAS CURRENT AT
ITS OFFSET (FlinkDatabaseHistory.java, FlinkJsonTableChangeSerializer.java,
EmbeddedFlinkDatabaseHistory.java; per-split schemas in
SnapshotSplit.tableSchemas). Spark pins one schema per query, so the v1
design is:

  - DDL events land in a SIDE TABLE ``(offset, database, table, ddl)``
    instead of the row stream (SURVEY §2.A "schema-change capture");
  - ``SchemaHistory`` replays them into an offset-versioned registry:
    ``schema_at(db, table, offset)`` returns the StructType in force at
    that offset — what a reader uses to decode a split whose offset range
    predates/postdates a DDL;
  - serialization round-trips through JSON (the checkpointable form,
    FlinkJsonTableChangeSerializer analog).

Supported DDL: CREATE TABLE (full column list), ADD COLUMN, DROP COLUMN,
RENAME COLUMN — the evolutions Spark can express by projection — and
MODIFY COLUMN (a type change). A type change versions the schema like any
other DDL (the reference serializes full ``TableChanges`` including
column-type edits — FlinkJsonTableChangeSerializer.java's
toDocument/fromDocument round-trip), but it additionally marks a
RE-SNAPSHOT boundary (``type_change_offsets``): existing row images were
decoded under the old type, so the capture must re-read the table at the
DDL offset — the suspend/backfill/resume machinery
(MySqlSourceReader.java:147-240) is the vehicle, executed by
``HybridCdcSource.resnapshot`` and driver-checked by the
``cdc_type_change_resnapshot`` key.
"""

from __future__ import annotations

import json
import re
from bisect import bisect_right
from dataclasses import dataclass, field

from pyspark.sql import types as T

from flink_cdc_connectors_spark.sources.types import map_source_type

_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<name>\S+)\s*\((?P<cols>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ADD = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\S+)\s+ADD\s+(?:COLUMN\s+)?(?P<col>\w+)\s+(?P<type>.+?)\s*$",
    re.IGNORECASE,
)
_DROP = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\S+)\s+DROP\s+(?:COLUMN\s+)?(?P<col>\w+)\s*$",
    re.IGNORECASE,
)
_RENAME = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\S+)\s+RENAME\s+(?:COLUMN\s+)?(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*$",
    re.IGNORECASE,
)
_MODIFY = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\S+)\s+MODIFY\s+(?:COLUMN\s+)?(?P<col>\w+)\s+(?P<type>.+?)\s*$",
    re.IGNORECASE,
)


def _split_cols(cols: str) -> list[tuple[str, str]]:
    """'id BIGINT, name VARCHAR(64)' -> [(name, decl)] (paren-aware)."""
    out, depth, cur = [], 0, []
    for ch in cols + ",":
        if ch == "," and depth == 0:
            piece = "".join(cur).strip()
            if piece:
                name, _, decl = piece.partition(" ")
                out.append((name.strip(), decl.strip()))
            cur = []
        else:
            depth += ch == "("
            depth -= ch == ")"
            cur.append(ch)
    return out


@dataclass
class SchemaHistory:
    """Offset-versioned schemas per (database, table)."""

    # (db, table) -> sorted [(offset, StructType)]
    _versions: dict[tuple[str, str], list[tuple[int, T.StructType]]] = field(
        default_factory=dict
    )
    # (db, table) -> offsets whose version is a COLUMN TYPE CHANGE — the
    # re-snapshot boundaries (see module docstring)
    _type_changes: dict[tuple[str, str], list[int]] = field(default_factory=dict)

    def apply_ddl(self, database: str, table: str, offset: int, ddl: str) -> None:
        """Replay one DDL event at ``offset`` (events must arrive in offset
        order per table, as the log guarantees)."""
        key = (database, table)
        if m := _CREATE.match(ddl):
            st = T.StructType(
                [
                    T.StructField(n, map_source_type(d), True)
                    for n, d in _split_cols(m.group("cols"))
                ]
            )
        else:
            cur = self.schema_at(database, table, offset)
            if cur is None:
                raise ValueError(f"ALTER before CREATE for {key}: {ddl!r}")
            if m := _ADD.match(ddl):
                st = T.StructType(
                    list(cur.fields)
                    + [T.StructField(m.group("col"), map_source_type(m.group("type")), True)]
                )
            elif m := _DROP.match(ddl):
                st = T.StructType([f for f in cur.fields if f.name != m.group("col")])
            elif m := _RENAME.match(ddl):
                st = T.StructType(
                    [
                        T.StructField(m.group("new"), f.dataType, f.nullable)
                        if f.name == m.group("old")
                        else f
                        for f in cur.fields
                    ]
                )
            elif m := _MODIFY.match(ddl):
                col = m.group("col")
                if col not in cur.fieldNames():
                    raise ValueError(f"MODIFY of unknown column {col!r}: {ddl!r}")
                st = T.StructType(
                    [
                        T.StructField(col, map_source_type(m.group("type")), f.nullable)
                        if f.name == col
                        else f
                        for f in cur.fields
                    ]
                )
                # a type change invalidates every previously-decoded row
                # image -> re-snapshot boundary (no-op MODIFY to the same
                # type is not a boundary)
                if st != cur:
                    self._type_changes.setdefault(key, []).append(offset)
            else:
                raise ValueError(f"unsupported DDL (v1): {ddl!r}")
        self._versions.setdefault(key, []).append((offset, st))

    def schema_at(self, database: str, table: str, offset: int) -> T.StructType | None:
        """The schema in force at ``offset`` (latest version with
        version_offset <= offset), or None if the table doesn't exist yet."""
        versions = self._versions.get((database, table), [])
        idx = bisect_right([o for o, _ in versions], offset)
        return versions[idx - 1][1] if idx else None

    def tables(self) -> list[tuple[str, str]]:
        return sorted(self._versions)

    def version_offsets(self, database: str, table: str) -> list[int]:
        """Sorted offsets at which this table's schema changed — the DDL
        boundaries a reader must not let a split span."""
        return sorted(o for o, _ in self._versions.get((database, table), []))

    def type_change_offsets(self, database: str, table: str) -> list[int]:
        """Sorted offsets whose DDL changed a COLUMN TYPE — the
        re-snapshot boundaries: projection alone cannot conform row images
        decoded under the old type, so the capture must suspend, re-read
        the table at the DDL offset, and resume (the reference's
        newly-added-tables suspend/backfill/resume machinery,
        MySqlSourceReader.java:147-240, is the vehicle). Multiple type
        edits at one offset (one ALTER batch) are one boundary."""
        return sorted(set(self._type_changes.get((database, table), [])))

    # -- checkpointable form (FlinkJsonTableChangeSerializer analog) -------

    def to_json(self) -> str:
        return json.dumps(
            {
                "versions": {
                    f"{db} {tb}": [(o, st.json()) for o, st in versions]
                    for (db, tb), versions in self._versions.items()
                },
                "type_changes": {
                    f"{db} {tb}": offs
                    for (db, tb), offs in self._type_changes.items()
                },
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "SchemaHistory":
        h = cls()
        d = json.loads(s)
        # pre-round-6 documents are the bare versions map (no type-change
        # tracking existed); current documents wrap both maps
        versions = d["versions"] if "versions" in d else d
        for key, vers in versions.items():
            db, tb = key.split(" ")
            h._versions[(db, tb)] = [
                (o, T.StructType.fromJson(json.loads(stj))) for o, stj in vers
            ]
        for key, offs in d.get("type_changes", {}).items() if "versions" in d else ():
            db, tb = key.split(" ")
            h._type_changes[(db, tb)] = list(offs)
        return h
