"""Pre-flight server validation + replication-slot lifecycle.

The reference validates server configuration BEFORE starting a source so
misconfiguration fails fast with an actionable message instead of a
half-run stream:

  - MySQL (MySqlValidator.java:68-140): version >= 5.6, binlog_format=ROW,
    binlog_row_image=FULL (pre-5.6 servers assumed FULL), and the server's
    UTC offset must match the configured `server-time-zone`.
  - Postgres: logical decoding requires wal_level=logical and a named
    replication slot (PostgreSQLTableFactory.java:97 'slot.name';
    docs/content/connectors/postgres-cdc.md); the connector manages the
    slot and leaked slots retain WAL forever — the operational footgun the
    reference warns about (PostgreSQLSource.java:163 wires slot.name into
    the embedded engine).

There is no live database in this engine's test environment, so the
checks are modeled as pure predicates over a :class:`ServerInfo` snapshot
(exactly the values the reference reads via `SELECT VERSION()` /
`SHOW GLOBAL VARIABLES` / `TIME_TO_SEC(TIMEDIFF(NOW(), UTC_TIMESTAMP()))`).
A real deployment fills ServerInfo from one round-trip and gets the same
fail-fast behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from flink_cdc_connectors_spark.sources.source_config import SourceConfig


class ValidationError(ValueError):
    """Server configuration rejected (the reference's ValidationException)."""


@dataclass(frozen=True)
class ServerInfo:
    """The server-side facts pre-flight validation reads."""

    version: str = ""  # SELECT VERSION(), e.g. "8.0.34" / "15.2"
    binlog_format: str | None = None  # SHOW GLOBAL VARIABLES LIKE 'binlog_format'
    binlog_row_image: str | None = None  # ... 'binlog_row_image' (None pre-5.6 => FULL)
    utc_offset_seconds: int | None = None  # TIME_TO_SEC(TIMEDIFF(NOW(), UTC_TIMESTAMP()))
    wal_level: str | None = None  # postgres SHOW wal_level


def _major_minor(version: str) -> tuple[int, int]:
    parts = version.split(".")
    try:
        major = int(parts[0])
        minor = int(parts[1]) if len(parts) > 1 else 0
    except (ValueError, IndexError):
        raise ValidationError(f"unparseable server version: {version!r}") from None
    return major, minor


def _zone_offset_seconds(zone: str) -> int | None:
    """Configured zone -> UTC offset in seconds (None if unknown zone)."""
    from datetime import datetime, timezone
    from zoneinfo import ZoneInfo, ZoneInfoNotFoundError

    if zone.upper() == "UTC":
        return 0
    try:
        off = datetime.now(ZoneInfo(zone)).utcoffset()
    except (ZoneInfoNotFoundError, ValueError):
        return None
    return int(off.total_seconds()) if off is not None else None


def validate_mysql_server(info: ServerInfo, cfg: SourceConfig) -> None:
    """MySqlValidator.validate(): version / binlog format / row image /
    timezone, each raising the reference's message shape."""
    major, minor = _major_minor(info.version)
    if (major, minor) < (5, 6):
        raise ValidationError(
            f"MySQL CDC requires server version >= 5.6, but actual is "
            f"{major}.{minor}."
        )
    fmt = (info.binlog_format or "").upper()
    if fmt != "ROW":
        raise ValidationError(
            f"The MySQL server is configured with binlog_format {fmt or '<unset>'} "
            f"rather than ROW, which is required for this connector to work "
            f"properly. Change the MySQL configuration to use binlog_format=ROW "
            f"and restart the connector."
        )
    # introduced in 5.6 with default FULL; older servers assumed FULL
    row_image = (info.binlog_row_image or "FULL").upper()
    if row_image != "FULL":
        raise ValidationError(
            f"The MySQL server is configured with binlog_row_image {row_image} "
            f"rather than FULL, which is required for this connector to work "
            f"properly. Change the MySQL configuration to use "
            f"binlog_row_image=FULL and restart the connector."
        )
    if info.utc_offset_seconds is not None:
        expected = _zone_offset_seconds(cfg.server_time_zone)
        # a DST-shifted server may sit one hour from the zone's current
        # offset (MySqlValidator.timeDiffMatchesZoneOffset tolerance)
        if expected is not None and abs(info.utc_offset_seconds - expected) > 3600:
            raise ValidationError(
                f"The MySQL server has a timezone offset "
                f"({abs(info.utc_offset_seconds)} seconds "
                f"{'ahead of' if info.utc_offset_seconds >= 0 else 'behind'} UTC) "
                f"which does not match the configured timezone "
                f"{cfg.server_time_zone}. Specify the right server-time-zone to "
                f"avoid inconsistencies for time-related fields."
            )


def validate_postgres_server(info: ServerInfo, cfg: SourceConfig) -> None:
    """Postgres logical-decoding preconditions: wal_level=logical and a
    configured slot name (postgres-cdc.md; slot.name option)."""
    if (info.wal_level or "").lower() != "logical":
        raise ValidationError(
            f"The PostgreSQL server is configured with wal_level "
            f"{info.wal_level or '<unset>'} rather than logical, which is "
            f"required for logical decoding. Set wal_level=logical and restart "
            f"the server."
        )
    if not getattr(cfg, "slot_name", None):
        raise ValidationError(
            "postgres-cdc requires a 'slot.name' option: the server streams "
            "changes through a named logical replication slot."
        )


_VALIDATORS = {
    "mysql-cdc": validate_mysql_server,
    "postgres-cdc": validate_postgres_server,
}


def validate_server(connector: str, info: ServerInfo, cfg: SourceConfig) -> None:
    """Connector-dispatching pre-flight hook (the DataSourceDialect
    validation step). Unknown connectors validate trivially — their
    preconditions are wire-protocol specific and not modeled."""
    v = _VALIDATORS.get(connector)
    if v is not None:
        v(info, cfg)


@dataclass
class ReplicationSlotRegistry:
    """Replication-slot lifecycle bookkeeping (the operational contract of
    PostgreSQLSource: the slot is created on first start, must be dropped
    when the source is retired, and a leaked slot pins WAL retention).

    In-memory stand-in for the server's pg_replication_slots view: create /
    drop / leak detection are the checkable behaviors; a real deployment
    would execute the matching pg_create_logical_replication_slot /
    pg_drop_replication_slot statements."""

    slots: dict[tuple[str, str], bool] = field(default_factory=dict)  # (db, slot) -> active

    def create(self, database: str, slot_name: str) -> None:
        key = (database, slot_name)
        if self.slots.get(key):
            raise ValidationError(
                f"replication slot {slot_name!r} already active on "
                f"{database!r} — each source needs its own slot "
                f"(slot.name must be unique per database)."
            )
        self.slots[key] = True

    def drop(self, database: str, slot_name: str) -> None:
        key = (database, slot_name)
        if key not in self.slots:
            raise ValidationError(
                f"replication slot {slot_name!r} does not exist on {database!r}"
            )
        del self.slots[key]

    def leaked(self, active_sources: set[tuple[str, str]]) -> list[tuple[str, str]]:
        """Slots no live source owns — the WAL-retention leak the reference
        warns operators about."""
        return sorted(k for k in self.slots if k not in active_sources)


@dataclass(frozen=True)
class ServerIdRange:
    """MySQL replica server-id range, inclusive bounds
    (ServerIdRange.java:30-90): each source subtask registers with its own
    server id (start + subtask), so the range must be at least as large as
    the source parallelism — the reference throws at subtask assignment
    time; here the same rule is a checkable precondition."""

    start: int
    end: int

    @classmethod
    def parse(cls, text: str) -> "ServerIdRange":
        t = text.strip()
        try:
            if "-" in t:
                lo, hi = (p.strip() for p in t.split("-", 1))
                r = cls(int(lo), int(hi))
            else:
                r = cls(int(t), int(t))
        except ValueError:
            raise ValidationError(
                f"server-id '{text}' is not a number or a range like "
                f"'5400-6400'."
            ) from None
        if r.end < r.start:
            raise ValidationError(
                f"server-id range '{text}' is empty: the 'server-id' must be "
                f"a range like '5400-6400', and the range must be larger than "
                f"the parallelism."
            )
        return r

    @property
    def size(self) -> int:
        return self.end - self.start + 1

    def server_id(self, subtask: int) -> int:
        if subtask < 0:
            raise ValidationError(f"Subtask ID {subtask} shouldn't be a negative number.")
        if subtask >= self.size:
            raise ValidationError(
                f"Subtask ID {subtask} is out of server id range {self}, "
                f"please adjust the server id range to make the number of "
                f"server id larger than the source parallelism."
            )
        return self.start + subtask

    def __str__(self) -> str:
        return str(self.start) if self.start == self.end else f"{self.start}-{self.end}"


def validate_server_id_range(server_id: str, parallelism: int) -> ServerIdRange:
    """Pre-flight form of the reference's assignment-time check: the
    declared range must cover every reader (MySqlSourceOptions.java:77-101
    '... the range must be larger than the parallelism')."""
    r = ServerIdRange.parse(server_id)
    if r.size < parallelism:
        raise ValidationError(
            f"The server-id range {r} covers {r.size} server ids but the "
            f"source parallelism is {parallelism}; every reader registers as "
            f"its own replica, so the range must be at least as large as the "
            f"parallelism."
        )
    return r
