"""`cdc_binlog` — a PySpark DataSource V2 streaming source for changelogs.

The real thing SURVEY §7 step 5 calls for: `spark.readStream
.format("cdc_binlog").load()` backed by the two-phase incremental-snapshot
protocol, on Spark 4's Python DataSource API:

  - micro-batch 1 = the SNAPSHOT phase: every key-range chunk becomes an
    ``InputPartition`` read in parallel by executors — the reference's
    parallel lock-free snapshot (MySqlSnapshotSplitReadTask; chunks from
    MySqlChunkSplitter), each chunk normalized to its consistent state at
    the snapshot high watermark;
  - subsequent micro-batches = the STREAM phase: one ordered reader tails
    the log past the watermark (BinlogSplitReader), emitting raw change
    events;
  - the offset is a JSON dict {phase, hw, off} mirroring
    ``HybridPendingSplitsState`` — checkpointable, resumable.

The "database" is a parquet changelog file (the simulated binlog fixture).
A real deployment swaps ``_read_slice`` for a JDBC chunk select + a log
tailer; the protocol, offsets, and partition planning stay identical.

Executor-side reads return Arrow RecordBatches (zero row-by-row Python
cost). Downstream, ``materialize_latest_state`` or ``changelog_normalize``
consume the stream exactly as they consume the file-based envelope stream.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "op string, user_id bigint, value double, props string, "
    "ts timestamp, event_id bigint"
)

# op mapping pinned in sources/envelope.py (EVENT_TYPE_TO_OP)
_OP_SQL = (
    "CASE WHEN event_type = 'signup' THEN 'insert' "
    "WHEN event_type = 'error' THEN 'delete' ELSE 'update' END"
)


@dataclass
class ChunkPartition(InputPartition):
    """Snapshot split: consistent chunk state at the high watermark."""

    path: str
    key_lo: int
    key_hi: int
    hw: int


@dataclass
class StreamPartition(InputPartition):
    """Log range (from_off, to_off] — the single ordered stream reader.

    ``chunk_hws``: [(key_lo, key_hi, hw)] — the finished-split metadata the
    reference ships to its binlog reader (FinishedSnapshotSplitInfo);
    ``shouldEmit`` = emit iff the event's offset is past the HW of the
    chunk containing its key (BinlogSplitReader.java:210-254)."""

    path: str
    from_off: int
    to_off: int
    chunk_hws: tuple = ()


def _duck(path: str, sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW log AS SELECT * FROM '{path}'")
    return con.execute(sql)


class CdcBinlogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_binlog requires option 'path'")
        self.num_chunks = int(options.get("numchunks", 4))
        # snapshot watermark: fraction of the log covered by the snapshot
        # phase (1.0 = everything; lower values leave a stream tail)
        frac = float(options.get("snapshotfraction", 1.0))
        # staggerChunks simulates DML landing while earlier chunks were
        # read: chunk i snapshots at a LOWER offset than chunk i+1, so the
        # stream phase must apply the per-chunk shouldEmit filter — full
        # DBLog fidelity rather than a single global watermark.
        self.stagger = str(options.get("staggerchunks", "false")).lower() == "true"
        key_lo, key_hi, max_off = _duck(
            self.path, "SELECT min(user_id), max(user_id), max(event_id) FROM log"
        ).fetchone()
        self.key_lo, self.key_hi = int(key_lo), int(key_hi) + 1
        self.max_off = int(max_off)
        self.hw = int(max_off * frac)
        # Startup modes (StartupMode.java:24-33): 'initial' = snapshot +
        # stream; 'earliest-offset' = whole log, no snapshot; 'latest-offset'
        # = only new changes; 'specific-offset'/'timestamp' = log from a
        # position. Non-initial modes skip the snapshot phase entirely.
        self.startup_mode = options.get("startupmode", "initial")
        if self.startup_mode not in (
            "initial", "earliest-offset", "latest-offset", "specific-offset", "timestamp"
        ):
            raise ValueError(f"unknown startupMode {self.startup_mode!r}")
        if self.startup_mode == "specific-offset":
            self.start_off = int(options["startupoffset"])
        elif self.startup_mode == "timestamp":
            ts_ms = int(options["startuptimestampms"])
            row = _duck(
                self.path,
                f"SELECT coalesce(min(event_id), {self.max_off} + 1) FROM log "
                f"WHERE ts >= to_timestamp({ts_ms} / 1000.0)",
            ).fetchone()
            self.start_off = int(row[0]) - 1
        elif self.startup_mode == "earliest-offset":
            self.start_off = -1
        elif self.startup_mode == "latest-offset":
            self.start_off = self.max_off
        else:
            self.start_off = None  # initial: snapshot phase decides

    def _chunk_plan(self, base_hw: int) -> list[tuple[int, int, int]]:
        """[(key_lo, key_hi, hw)] for every snapshot chunk."""
        step = max(
            (self.key_hi - self.key_lo + self.num_chunks - 1) // self.num_chunks, 1
        )
        plan = []
        for i in range(self.num_chunks):
            lo = self.key_lo + i * step
            if lo >= self.key_hi:
                break
            hw = (
                int(base_hw * (i + 1) / self.num_chunks) if self.stagger else base_hw
            )
            plan.append((lo, min(lo + step, self.key_hi), hw))
        return plan

    # -- offsets (HybridPendingSplitsState analog) -------------------------

    def initialOffset(self) -> dict:
        if self.startup_mode == "initial":
            return {"phase": "snapshot", "hw": self.hw, "off": -1}
        # log-only modes: start the stream at the resolved offset, no
        # snapshot chunks (SeekBinlogToTimestampFilter analog for
        # 'timestamp'; binlog seek for the offset modes)
        return {"phase": "stream", "hw": self.start_off, "off": self.start_off}

    def latestOffset(self) -> dict:
        # snapshot not yet emitted -> the next batch is the whole snapshot
        # (all chunks in parallel); afterwards the stream tail advances to
        # the current log end (static fixture: max_off).
        return {"phase": "stream", "hw": self.hw, "off": self.max_off}

    def partitions(self, start: dict, end: dict):
        parts: list[InputPartition] = []
        chunk_plan = tuple(self._chunk_plan(start["hw"]))
        if start["phase"] == "snapshot":
            for lo, hi, hw in chunk_plan:
                parts.append(ChunkPartition(self.path, lo, hi, hw))
        # The stream starts at the MIN chunk watermark
        # (MySqlHybridSplitAssigner.createBinlogSplit:189-227); shouldEmit
        # drops events a chunk's backfill already covered.
        min_hw = min((hw for _, _, hw in chunk_plan), default=start["hw"])
        stream_from = min_hw if start["phase"] == "snapshot" else start["off"]
        if end["off"] > stream_from:
            parts.append(
                StreamPartition(self.path, stream_from, end["off"], chunk_plan)
            )
        if not parts:
            # Spark requires >=1 partition; an empty log range reads nothing
            parts.append(StreamPartition(self.path, end["off"], end["off"]))
        return parts

    def read(self, partition: InputPartition):
        # Executor-side: DuckDB over the parquet slice -> Arrow batches.
        # Chunk reads push the key-range + offset predicates into the scan
        # (the reference's per-split WHERE clause); the normalize is the
        # upsertBinlog reconciliation collapsed into SQL.
        if isinstance(partition, ChunkPartition):
            sql = f"""
            SELECT 'insert' AS op, user_id,
                   value, props, CAST(ts AS TIMESTAMP) AS ts, event_id
            FROM (
              SELECT *, {_OP_SQL} AS __op,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM log
              WHERE user_id >= {partition.key_lo} AND user_id < {partition.key_hi}
                AND event_id <= {partition.hw}
            ) WHERE rn = 1 AND __op <> 'delete'
            """
        else:
            # shouldEmit: past the containing chunk's HW (keys outside any
            # chunk range are not captured; with uniform HWs the predicate
            # degenerates to the plain offset range)
            emit = (
                " OR ".join(
                    f"(user_id >= {lo} AND user_id < {hi} AND event_id > {hw})"
                    for lo, hi, hw in partition.chunk_hws
                )
                or "TRUE"
            )
            sql = f"""
            SELECT {_OP_SQL} AS op, user_id, value, props,
                   CAST(ts AS TIMESTAMP) AS ts, event_id
            FROM log
            WHERE event_id > {partition.from_off} AND event_id <= {partition.to_off}
              AND ({emit})
            ORDER BY event_id
            """
        reader = _duck(partition.path, sql).fetch_record_batch()
        while True:
            try:
                yield reader.read_next_batch()
            except StopIteration:
                break

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing external to ack


class CdcBinlogDataSource(DataSource):
    """spark.readStream.format("cdc_binlog").option("path", ...).load()

    Options: ``path`` (changelog parquet), ``numChunks`` (snapshot splits,
    default 4), ``snapshotFraction`` (log fraction covered by the snapshot
    phase, default 1.0 — lower leaves a stream tail), ``staggerChunks``
    (each chunk snapshots at a different watermark, exercising the
    per-chunk shouldEmit filter — the DBLog concurrent-DML scenario),
    ``startupMode`` (initial | earliest-offset | latest-offset |
    specific-offset + ``startupOffset`` | timestamp + ``startupTimestampMs``
    — StartupMode.java:24-33; non-initial modes skip the snapshot phase).
    """

    @classmethod
    def name(cls) -> str:
        return "cdc_binlog"

    def schema(self) -> str:
        # schema() runs at load()-analysis time on the driver — validate
        # here so a missing path fails fast, not asynchronously inside the
        # stream thread.
        if not self.options.get("path"):
            raise ValueError(
                "cdc_binlog requires .option('path', <changelog parquet>)"
            )
        return SCHEMA_DDL

    def streamReader(self, schema: StructType) -> CdcBinlogStreamReader:
        return CdcBinlogStreamReader(schema, self.options)


def register(spark) -> None:
    """Register the source with a session (idempotent)."""
    spark.dataSource.register(CdcBinlogDataSource)
