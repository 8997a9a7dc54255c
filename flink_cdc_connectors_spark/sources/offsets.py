"""Composite binlog offsets with the reference's multi-component ordering.

The reference's restart position is not a scalar: `BinlogOffset.compareTo`
(flink-connector-mysql-cdc/.../source/offset/BinlogOffset.java:173-255)
resolves, in order:

  1. NON_STOPPING kind is the +infinity offset (equal to itself, after
     everything else).
  2. If BOTH sides carry GTID sets, the comparison is entirely GTID-based:
     equal sets fall through to events-to-skip; otherwise set containment
     decides (contained-within => before).
  3. If exactly ONE side carries a GTID set, the GTID-less side is assumed
     OLDER (GTIDs are often enabled, rarely disabled — the Debezium
     HistoryRecordComparator assumption).
  4. Different server_ids have unrelated binlog coordinates — compare
     timestamps only.
  5. Same server: binlog filename (case-insensitive), then position, then
     events-to-skip, then rows-to-skip.

GTID sets use MySQL's wire format `uuid:a-b[:c-d...][,uuid:...]`;
containment is per-uuid interval-set inclusion (GtidSet.isContainedWithin).
All reimplemented from the published SEMANTICS — no code translation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import total_ordering

# Offset kinds (BinlogOffsetKind.java): EARLIEST/LATEST/TIMESTAMP resolve to
# concrete SPECIFIC offsets once the log is consulted; NON_STOPPING is the
# internal +infinity used as a never-ending reader's stop condition.
EARLIEST = "earliest"
LATEST = "latest"
TIMESTAMP = "timestamp"
SPECIFIC = "specific"
NON_STOPPING = "non-stopping"

_KINDS = (EARLIEST, LATEST, TIMESTAMP, SPECIFIC, NON_STOPPING)


class GtidSet:
    """A MySQL GTID set: `uuid:1-5:7[,uuid2:1-3]` -> {uuid: [(lo, hi), ...]}.

    Intervals are normalized (sorted, merged) on parse, so equality is
    structural and containment is a per-uuid interval sweep."""

    def __init__(self, text: str | None):
        self.intervals: dict[str, list[tuple[int, int]]] = {}
        for part in (text or "").split(","):
            part = part.strip()
            if not part:
                continue
            uuid, *ranges = part.split(":")
            if not ranges:
                raise ValueError(f"GTID component without intervals: {part!r}")
            ivs = self.intervals.setdefault(uuid.strip().lower(), [])
            for r in ranges:
                lo, _, hi = r.partition("-")
                a = int(lo)
                b = int(hi) if hi else a
                if b < a:
                    raise ValueError(f"inverted GTID interval: {r!r}")
                ivs.append((a, b))
        for uuid, ivs in self.intervals.items():
            ivs.sort()
            merged: list[tuple[int, int]] = []
            for a, b in ivs:
                if merged and a <= merged[-1][1] + 1:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], b))
                else:
                    merged.append((a, b))
            self.intervals[uuid] = merged

    def __eq__(self, other: object) -> bool:
        return isinstance(other, GtidSet) and self.intervals == other.intervals

    def __hash__(self) -> int:
        return hash(str(self))

    def is_contained_within(self, other: "GtidSet") -> bool:
        """True iff every transaction id in self is also in other."""
        for uuid, ivs in self.intervals.items():
            theirs = other.intervals.get(uuid)
            if not theirs and ivs:
                return False
            for a, b in ivs:
                # every point of [a, b] must lie inside one of their merged
                # intervals (merged intervals are disjoint and sorted, so a
                # single containing interval must cover the whole span)
                if not any(ta <= a and b <= tb for ta, tb in theirs):
                    return False
        return True

    def __str__(self) -> str:
        return ",".join(
            f"{uuid}:" + ":".join(
                f"{a}-{b}" if b > a else f"{a}" for a, b in ivs
            )
            for uuid, ivs in sorted(self.intervals.items())
        )


@total_ordering
@dataclass(frozen=True)
class BinlogOffset:
    """Composite restartable position (BinlogOffset.java analog)."""

    kind: str = SPECIFIC
    gtid_set: str | None = None
    server_id: int = 0
    ts_sec: int = 0
    file: str = ""
    pos: int = 0
    skip_events: int = 0  # events to skip within the transaction on restart
    skip_rows: int = 0  # rows to skip within the event on restart

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown offset kind: {self.kind!r}")

    # -- ordering (compareTo, BinlogOffset.java:173-255) -------------------

    def _cmp(self, that: "BinlogOffset") -> int:
        if self.kind == NON_STOPPING and that.kind == NON_STOPPING:
            return 0
        if self.kind == NON_STOPPING:
            return 1
        if that.kind == NON_STOPPING:
            return -1
        if that.gtid_set:
            if self.gtid_set:
                mine, theirs = GtidSet(self.gtid_set), GtidSet(that.gtid_set)
                if mine == theirs:
                    return (self.skip_events > that.skip_events) - (
                        self.skip_events < that.skip_events
                    )
                return -1 if mine.is_contained_within(theirs) else 1
            return -1  # GTID-less side assumed older
        elif self.gtid_set:
            return 1
        if self.server_id != that.server_id:
            # unrelated binlog coordinates: timestamps are all we have
            return (self.ts_sec > that.ts_sec) - (self.ts_sec < that.ts_sec)
        for a, b in (
            (self.file.lower(), that.file.lower()),
            (self.pos, that.pos),
            (self.skip_events, that.skip_events),
            (self.skip_rows, that.skip_rows),
        ):
            if a != b:
                return 1 if a > b else -1
        return 0

    def __lt__(self, that: "BinlogOffset") -> bool:
        return self._cmp(that) < 0

    def __eq__(self, that: object) -> bool:
        return isinstance(that, BinlogOffset) and self._cmp(that) == 0

    def __hash__(self) -> int:
        return hash((self.kind, self.gtid_set, self.server_id, self.file, self.pos))

    def is_at_or_before(self, that: "BinlogOffset") -> bool:
        return self._cmp(that) <= 0

    def is_before(self, that: "BinlogOffset") -> bool:
        return self._cmp(that) < 0

    def is_at_or_after(self, that: "BinlogOffset") -> bool:
        return self._cmp(that) >= 0

    def is_after(self, that: "BinlogOffset") -> bool:
        return self._cmp(that) > 0

    # -- wire form (offset JSON in checkpoints / split state) --------------

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "gtids": self.gtid_set,
            "server_id": self.server_id,
            "ts_sec": self.ts_sec,
            "file": self.file,
            "pos": self.pos,
            "skip_events": self.skip_events,
            "skip_rows": self.skip_rows,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "BinlogOffset":
        return cls(
            kind=d.get("kind", SPECIFIC),
            gtid_set=d.get("gtids"),
            server_id=int(d.get("server_id", 0)),
            ts_sec=int(d.get("ts_sec", 0)),
            file=d.get("file", ""),
            pos=int(d.get("pos", 0)),
            skip_events=int(d.get("skip_events", 0)),
            skip_rows=int(d.get("skip_rows", 0)),
        )

    @classmethod
    def from_json(cls, s: str) -> "BinlogOffset":
        return cls.from_dict(json.loads(s))

    # -- constructors mirroring BinlogOffsetBuilder ------------------------

    @classmethod
    def non_stopping(cls) -> "BinlogOffset":
        return cls(kind=NON_STOPPING)

    @classmethod
    def earliest(cls) -> "BinlogOffset":
        return cls(kind=EARLIEST)

    @classmethod
    def specific(cls, file: str, pos: int, **kw) -> "BinlogOffset":
        return cls(kind=SPECIFIC, file=file, pos=pos, **kw)

    @classmethod
    def from_envelope_source(cls, db_file: str, pos: int, ts_ms: int) -> "BinlogOffset":
        """Offset of one envelope row from its `source` struct — the fixture
        generator emits (file, pos, ts_ms) exactly like the Debezium source
        block."""
        return cls(kind=SPECIFIC, file=db_file, pos=pos, ts_sec=ts_ms // 1000)


# --- MongoDB change-stream offsets ------------------------------------------
#
# The Mongo side orders by CLUSTER TIME, not binlog coordinates: a
# ChangeStreamOffset is {timestamp, resumeToken} where the timestamp is the
# BsonTimestamp packed value ((seconds << 32) | increment) decoded from the
# resume token's `_data` keystring, and comparison uses the timestamp ONLY
# (the token is opaque server state carried along for exact resumption).
# Reference: ChangeStreamOffset.java:37-103 (offset map, compareTo on
# timestamp, NO_STOPPING = max BsonTimestamp), ResumeTokenUtils.java:30-45
# (keystring: kType byte 0x82 then big-endian seconds/increment),
# MongoRecordUtils.maximumBsonTimestamp. Reimplemented from the published
# semantics — no code translation.

_K_TIMESTAMP = 130  # resume-token keystring type tag for BsonTimestamp

_BSON_TS_MAX = (0x7FFFFFFF << 32) | 0x7FFFFFFF


def bson_timestamp(seconds: int, increment: int = 0) -> int:
    """Pack a BsonTimestamp into its 64-bit comparable value."""
    if not (0 <= seconds <= 0xFFFFFFFF and 0 <= increment <= 0xFFFFFFFF):
        raise ValueError(f"BsonTimestamp out of range: ({seconds}, {increment})")
    return (seconds << 32) | increment


def decode_resume_token_timestamp(data: bytes | str) -> int:
    """Packed BsonTimestamp from a resume token's `_data` keystring —
    binary or hex-string form (ResumeTokenUtils.decodeTimestamp)."""
    raw = bytes.fromhex(data) if isinstance(data, str) else bytes(data)
    if len(raw) < 9:
        raise ValueError(f"resume token keystring too short: {len(raw)} bytes")
    if raw[0] != _K_TIMESTAMP:
        raise ValueError(f"unknown keyType of timestamp: {raw[0]}")
    seconds = int.from_bytes(raw[1:5], "big")
    increment = int.from_bytes(raw[5:9], "big")
    return bson_timestamp(seconds, increment)


@total_ordering
@dataclass(frozen=True)
class ChangeStreamOffset:
    """Mongo change-stream restart position (ChangeStreamOffset.java analog).

    ``timestamp`` is the packed BsonTimestamp; ``resume_token`` is the
    token's `_data` keystring (hex) when known, else None (a
    timestamp-only offset, e.g. startup at an operation time). Ordering is
    by timestamp alone; equality is on the whole offset map, mirroring the
    reference's equals-vs-compareTo split."""

    timestamp: int
    resume_token: str | None = None

    @classmethod
    def from_resume_token(cls, data: bytes | str) -> "ChangeStreamOffset":
        hex_data = data.hex() if isinstance(data, (bytes, bytearray)) else data.lower()
        return cls(decode_resume_token_timestamp(data), hex_data)

    @classmethod
    def from_timestamp(cls, seconds: int, increment: int = 0) -> "ChangeStreamOffset":
        return cls(bson_timestamp(seconds, increment))

    @classmethod
    def from_epoch_millis(cls, epoch_ms: int) -> "ChangeStreamOffset":
        """Startup-at-timestamp offset (bsonTimestampFromEpochMillis: whole
        seconds, increment 1)."""
        return cls(bson_timestamp(epoch_ms // 1000, 1))

    @classmethod
    def no_stopping(cls) -> "ChangeStreamOffset":
        """The +infinity offset (maximumBsonTimestamp)."""
        return cls(_BSON_TS_MAX)

    @property
    def seconds(self) -> int:
        return self.timestamp >> 32

    @property
    def increment(self) -> int:
        return self.timestamp & 0xFFFFFFFF

    def update_position(self, data: bytes | str) -> "ChangeStreamOffset":
        """New offset at a later resume token (updatePosition; frozen
        dataclass, so this returns the advanced offset)."""
        return ChangeStreamOffset.from_resume_token(data)

    # ordering: timestamp only (ChangeStreamOffset.compareTo). __eq__ must
    # match the comparison key — total_ordering derives >/<=/>= from
    # (__lt__, __eq__), and a stricter equality (whole offset map) makes
    # compare-equal offsets satisfy BOTH a > b and b > a. Whole-map
    # equality (the reference's equals()) is ``same_position``.
    def __lt__(self, that: "ChangeStreamOffset") -> bool:
        return self.timestamp < that.timestamp

    def __eq__(self, that: object) -> bool:
        return (
            isinstance(that, ChangeStreamOffset)
            and self.timestamp == that.timestamp
        )

    def __hash__(self) -> int:
        return hash(self.timestamp)

    def same_position(self, that: "ChangeStreamOffset") -> bool:
        return (
            self.timestamp == that.timestamp
            and self.resume_token == that.resume_token
        )

    def is_at_or_before(self, that: "ChangeStreamOffset") -> bool:
        return self.timestamp <= that.timestamp

    def is_after(self, that: "ChangeStreamOffset") -> bool:
        return self.timestamp > that.timestamp

    # wire form: the reference's offset map {timestamp, resumeToken}
    def to_dict(self) -> dict:
        return {"timestamp": str(self.timestamp), "resumeToken": self.resume_token}

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "ChangeStreamOffset":
        return cls(int(d["timestamp"]), d.get("resumeToken"))

    @classmethod
    def from_json(cls, s: str) -> "ChangeStreamOffset":
        return cls.from_dict(json.loads(s))


_LONG_MIN = -(1 << 63)


@total_ordering
@dataclass(frozen=True)
class RedoLogOffset:
    """Oracle LogMiner redo-log offset — SCN-ordered
    (RedoLogOffset.java:29-95).

    The reference keys the offset map on a stringified SCN
    (``SCN_KEY='scn'``, commit SCN carried alongside but NOT part of the
    ordering); ``INITIAL_OFFSET`` is SCN 0 and ``NO_STOPPING_OFFSET`` is
    ``Long.MIN_VALUE`` used as the MAX sentinel. compareTo semantics
    replicated exactly: NO_STOPPING beats everything; an absent/empty SCN
    sorts below any present SCN; otherwise numeric SCN order
    (Scn.compareTo — Oracle SCNs are unsigned numerics)."""

    scn: int | None
    commit_scn: int = 0

    def _is_no_stopping(self) -> bool:
        return self.scn == _LONG_MIN

    # compareTo (RedoLogOffset.java:69-95). __eq__ must agree with it:
    # total_ordering derives >/<=/>= from (__lt__, __eq__), so an equality
    # stricter than the comparison key (e.g. including commit_scn) makes
    # compare-equal offsets satisfy BOTH a > b and b > a. Wire-level
    # equality is ``same_position``; the BinlogOffset class above uses the
    # identical _cmp pattern for the same reason.
    def _cmp(self, that: "RedoLogOffset") -> int:
        if self._is_no_stopping() and that._is_no_stopping():
            return 0
        if self._is_no_stopping():
            return 1
        if that._is_no_stopping():
            return -1
        if that.scn is not None:
            if self.scn is not None:
                return (self.scn > that.scn) - (self.scn < that.scn)
            return -1  # empty scn < present scn (RedoLogOffset.java:89)
        return 1 if self.scn is not None else 0

    def __lt__(self, that: "RedoLogOffset") -> bool:
        return self._cmp(that) < 0

    def __eq__(self, that: object) -> bool:
        return isinstance(that, RedoLogOffset) and self._cmp(that) == 0

    def same_position(self, that: "RedoLogOffset") -> bool:
        """Whole-map equality (the reference's ``equals()``, which is
        deliberately stricter than its compareTo)."""
        return self.scn == that.scn and self.commit_scn == that.commit_scn

    def __hash__(self) -> int:
        return hash(self.scn)

    def to_dict(self) -> dict:
        return {
            "scn": "" if self.scn is None else str(self.scn),
            "commit_scn": str(self.commit_scn),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "RedoLogOffset":
        scn = d.get("scn", "")
        return cls(int(scn) if scn not in ("", None) else None,
                   int(d.get("commit_scn", 0)))


RedoLogOffset.INITIAL = RedoLogOffset(0)
RedoLogOffset.NO_STOPPING = RedoLogOffset(_LONG_MIN)


@total_ordering
@dataclass(frozen=True)
class TxLogLsn:
    """SQL Server transaction-log sequence number — the offset unit of the
    reference's SQL Server connector (legacy embedded-Debezium path,
    `SqlServerSource.java`; the capture-table reads order on the 10-byte
    LSN). Standard textual form ``XXXXXXXX:XXXXXXXX:XXXX`` = (VLF id,
    log-block offset, slot), compared as the numeric triple — identical to
    byte-wise comparison of the 10-byte binary form."""

    vlf: int
    block: int
    slot: int

    @classmethod
    def parse(cls, text: str) -> "TxLogLsn":
        a, b, c = text.split(":")
        return cls(int(a, 16), int(b, 16), int(c, 16))

    def __str__(self) -> str:
        return f"{self.vlf:08X}:{self.block:08X}:{self.slot:04X}"

    def __lt__(self, that: "TxLogLsn") -> bool:
        return (self.vlf, self.block, self.slot) < (that.vlf, that.block, that.slot)

    def to_bytes(self) -> bytes:
        """The 10-byte binary LSN (byte-wise order == tuple order)."""
        return (
            self.vlf.to_bytes(4, "big")
            + self.block.to_bytes(4, "big")
            + self.slot.to_bytes(2, "big")
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TxLogLsn":
        return cls(
            int.from_bytes(data[0:4], "big"),
            int.from_bytes(data[4:8], "big"),
            int.from_bytes(data[8:10], "big"),
        )
