"""Declarative CDC source configuration — the connector options surface.

Mirrors the reference's option set (MySqlSourceOptions.java:30-247 and the
generic SourceOptions.java:40-113): connection, table regex lists, startup
mode, chunk sizing, fetch size. ``SourceConfig`` validates once and
compiles into the Spark-side physical artifacts:

  - ``snapshot_predicates()``: per-chunk WHERE clauses for
    ``spark.read.jdbc(url, table, predicates=[...])`` — the exact split
    scan queries of StatementUtils.buildSplitScanQuery:132-225, one
    partition per chunk, executed in parallel by executors;
  - ``startup_predicate()``: the offset predicate of the five startup
    modes (StartupMode.java:24-33);
  - ``jdbc_options()``: fetchsize etc. for the DataFrameReader.

No database is required to *plan*; tests assert the generated SQL. At
runtime the same config drives either a real JDBC read or the parquet
fixtures (the engine consumes whatever source produces the envelope).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# StartupMode.java:24-33
STARTUP_MODES = ("initial", "earliest-offset", "latest-offset", "specific-offset", "timestamp")


@dataclass(frozen=True)
class SourceConfig:
    """Validated source options (MySqlSourceConfig analog)."""

    hostname: str = "localhost"
    port: int = 3306
    username: str = "cdc"
    password: str = ""
    database_pattern: str = ".*"  # database-name regex (MySqlSourceOptions.java:56-60)
    # table-name regex (:62-66) — shard merging; None = the DDL carried no
    # table-name option (legal for mongodb-cdc), rejected at binding time
    table_pattern: str | None = ".*"
    startup_mode: str = "initial"  # :137-185
    startup_offset: int | None = None  # specific-offset file/pos value
    # specific-offset's GTID form (MySqlSourceOptions.java:160-166
    # 'scan.startup.specific-offset.gtid-set'): the reference accepts
    # EITHER a binlog file/pos pair OR a GTID set for this mode; the set
    # string is validated by parsing (offsets.py::GtidSet wire format).
    startup_gtid_set: str | None = None
    # events/rows to skip past the resolved offset
    # (:168-181, BinlogOffset skip components)
    startup_skip_events: int = 0
    startup_skip_rows: int = 0
    startup_timestamp_ms: int | None = None  # timestamp mode
    snapshot_chunk_size: int = 8096  # scan.incremental.snapshot.chunk.size (SourceOptions.java:92-98)
    fetch_size: int = 1024  # scan.snapshot.fetch.size (:110-115)
    # chunk-meta.group.size (MySqlSourceOptions.java:198-203): split-meta
    # records ship to stream readers in groups of this size
    # (operators/cdc.py::next_meta_group_id / next_meta_group)
    split_meta_group_size: int = 1000
    distribution_factor_upper: float = 1000.0  # chunk-key-even-distribution.factor.upper-bound (:99-113)
    distribution_factor_lower: float = 0.05
    server_time_zone: str = "UTC"  # MySqlSourceOptions.java:68-74
    # postgres logical-decoding slot (PostgreSQLTableFactory.java:97
    # 'slot.name'; PostgreSQLSource Builder default "flink"). None for
    # connectors without slot semantics.
    slot_name: str | None = None
    # MySQL replica server-id, single or inclusive range '5400-6400'
    # (MySqlSourceOptions.java:77-101): each reader subtask registers
    # start+subtask, so the range must cover the parallelism — parsed and
    # validated by validation.py::ServerIdRange at construction.
    server_id: str | None = None
    # scan.incremental.snapshot.chunk.key-column (MySqlSourceOptions.java:
    # 240-247; JdbcSourceOptions.java:106-113): user-chosen snapshot split
    # column, validated against the table's primary key at resolution time
    # (operators/cdc.py::get_chunk_key_column). None = first PK column.
    chunk_key_column: str | None = None
    # debezium.max.batch.size passthrough (the reference forwards
    # 'debezium.*' to the embedded engine; max.batch.size caps events per
    # poll): stream-phase offsets advance by at most this many per
    # micro-batch, so a long tail drains as genuine increments.
    max_batch_size: int | None = None
    # MongoDB legacy initial load (mongodb-cdc.md 'copy.existing', default
    # true in the reference): token-first copy-then-tail, modeled
    # end-to-end by queries/tier_a_ext2.py::cdc_mongo_copy_existing. The
    # incremental-snapshot path ignores it (same as the reference when
    # scan.incremental.snapshot.enabled=true).
    copy_existing: bool = True
    # scan.newly-added-table.enabled (MySqlSourceOptions.java:232-238): at
    # a checkpoint restore, tables newly matched by the capture pattern get
    # snapshot splits — the suspend/backfill/resume protocol. The streaming
    # binding expresses the capture set as explicit half-open key ranges
    # (the single-table fixture's table axis, one range per "table") via
    # ``captured_key_ranges``; restarting the same checkpoint with a WIDER
    # list drives the protocol through the DSv2 offset v3 capture-set diff
    # (sources/datasource.py), a NARROWER list stops the dropped range.
    scan_newly_added_table: bool = False
    # repo extension option 'scan.captured.key-ranges': JSON [[lo, hi], ...]
    captured_key_ranges: str | None = None

    def __post_init__(self) -> None:
        if self.startup_mode not in STARTUP_MODES:
            raise ValueError(
                f"startup mode must be one of {STARTUP_MODES}, got {self.startup_mode!r}"
            )
        if (
            self.startup_mode == "specific-offset"
            and self.startup_offset is None
            and not (self.startup_gtid_set or "").strip()
        ):
            raise ValueError(
                "specific-offset mode requires startup_offset (file/pos) "
                "or a non-empty startup_gtid_set"
            )
        if self.startup_gtid_set is not None:
            if not self.startup_gtid_set.strip():
                # an empty set parses but positions the stream nowhere — a
                # config with no usable startup position must fail at
                # construction, not at stream start
                raise ValueError("startup_gtid_set must be a non-empty GTID set")
            # parse-validate the wire format (uuid:a-b[,uuid:c-d...])
            from flink_cdc_connectors_spark.sources.offsets import GtidSet

            GtidSet(self.startup_gtid_set)
        if self.server_id is not None:
            from flink_cdc_connectors_spark.sources.validation import ServerIdRange

            ServerIdRange.parse(self.server_id)
        if self.startup_skip_events < 0 or self.startup_skip_rows < 0:
            raise ValueError("skip-events/skip-rows must be non-negative")
        if self.startup_mode == "timestamp" and self.startup_timestamp_ms is None:
            raise ValueError("timestamp mode requires startup_timestamp_ms")
        if self.snapshot_chunk_size <= 0:
            raise ValueError("snapshot_chunk_size must be positive")
        re.compile(self.database_pattern)
        if self.table_pattern is not None:
            re.compile(self.table_pattern)
        if self.captured_key_ranges is not None:
            # parse-validate at construction (factory-time failure, not a
            # stream-thread one): JSON [[lo, hi], ...], lo < hi, disjoint
            import json

            ranges = sorted(
                (int(lo), int(hi)) for lo, hi in json.loads(self.captured_key_ranges)
            )
            if any(hi <= lo for lo, hi in ranges) or any(
                b[0] < a[1] for a, b in zip(ranges, ranges[1:])
            ):
                raise ValueError(
                    f"captured key ranges must be disjoint half-open lo<hi: {ranges}"
                )

    # -- discovery ---------------------------------------------------------

    def discover(self, catalog: dict[str, list[str]]) -> list[tuple[str, str]]:
        """Filter a {database: [tables]} catalog by the regex pair — the
        captured-table discovery of TableDiscoveryUtils/DataSourceDialect
        (:44-52). Sharded physical tables matching one pattern merge into
        one logical stream downstream (set_union_all)."""
        if self.table_pattern is None:
            # connectors whose required options omit table-name (mongodb's
            # hosts-only form) validate, but DISCOVERY without a pattern
            # would interpolate the literal string 'None' into the regex —
            # matching a table literally named "None" and nothing else
            raise ValueError(
                "table discovery requires a 'table-name' pattern "
                "(this config has none)"
            )
        db_re = re.compile(f"^(?:{self.database_pattern})$")
        tb_re = re.compile(f"^(?:{self.table_pattern})$")
        return [
            (db, tb)
            for db, tables in sorted(catalog.items())
            if db_re.match(db)
            for tb in sorted(tables)
            if tb_re.match(tb)
        ]

    # -- snapshot planning -------------------------------------------------

    def chunk_bounds(self, key_min: int, key_max: int, row_count: int) -> list[tuple[int | None, int | None]]:
        """Evenly-sized chunk boundaries [(lo, hi], ...] with the
        distribution-factor guard (MySqlChunkSplitter.java:201-302,
        354-422): step = chunk_size * (max-min+1)/count, first chunk
        (-inf, min+step], last (x, +inf)."""
        factor = (key_max - key_min + 1) / max(row_count, 1)
        if not (self.distribution_factor_lower <= factor <= self.distribution_factor_upper):
            raise ValueError(
                f"distribution factor {factor:.4f} outside "
                f"[{self.distribution_factor_lower}, {self.distribution_factor_upper}]"
                " — use uneven chunking"
            )
        step = max(int(self.snapshot_chunk_size * factor), 1)
        bounds: list[tuple[int | None, int | None]] = []
        lo = key_min + step
        bounds.append((None, lo))
        while lo + step <= key_max:
            bounds.append((lo, lo + step))
            lo += step
        bounds.append((lo, None))
        return bounds

    def snapshot_predicates(self, key: str, key_min: int, key_max: int, row_count: int) -> list[str]:
        """Per-chunk WHERE clauses for spark.read.jdbc(predicates=...) —
        buildSplitScanQuery:132-225: ``key > lo AND key <= hi`` with
        open-ended first/last chunks."""
        preds = []
        for lo, hi in self.chunk_bounds(key_min, key_max, row_count):
            if lo is None:
                preds.append(f"{key} <= {hi}")
            elif hi is None:
                preds.append(f"{key} > {lo}")
            else:
                preds.append(f"{key} > {lo} AND {key} <= {hi}")
        return preds

    # -- startup -----------------------------------------------------------

    def startup_predicate(self, offset_col: str = "event_id", ts_col: str = "ts") -> str:
        """Offset predicate of the five startup positions
        (StartupMode.java:24-33; seek filter SeekBinlogToTimestampFilter).
        'initial' reads everything (snapshot + log); 'latest-offset' is
        resolved by the caller against the current max offset."""
        if self.startup_mode in ("initial", "earliest-offset"):
            return "1=1"
        if self.startup_mode == "latest-offset":
            return f"{offset_col} > __CURRENT_MAX_OFFSET__"
        if self.startup_mode == "specific-offset":
            return f"{offset_col} > {self.startup_offset}"
        return f"{ts_col} >= to_timestamp({self.startup_timestamp_ms} / 1000.0)"

    # -- reader options ----------------------------------------------------

    def jdbc_options(self) -> dict[str, str]:
        """DataFrameReader options (fetch batching = scan.snapshot.fetch.size;
        connection pooling is per-executor in Spark, JdbcConnectionPools
        analog not needed)."""
        return {
            "url": f"jdbc:mysql://{self.hostname}:{self.port}/?serverTimezone={self.server_time_zone}",
            "user": self.username,
            "password": self.password,
            "fetchsize": str(self.fetch_size),
            "sessionInitStatement": "SET TIME_ZONE = '+00:00'",
        }
