"""Composite-offset ordering tests (BinlogOffset.java:173-255 semantics).

Property tests pin the restore-ordering invariants the reference's
HistoryRecordComparator-derived compareTo guarantees: total order within a
server's binlog coordinates, GTID containment dominating scalar
components, NON_STOPPING as +infinity, and wire-form round-trips (what a
checkpoint restore exercises).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_cdc_connectors_spark.sources.offsets import (
    NON_STOPPING,
    BinlogOffset,
    GtidSet,
)

UUIDS = ["aaaa-1111", "bbbb-2222", "cccc-3333"]


def coords():
    return st.tuples(
        st.sampled_from(["binlog.000001", "binlog.000002", "binlog.000010"]),
        st.integers(0, 1 << 20),
        st.integers(0, 5),
        st.integers(0, 5),
    )


def offset_from(c) -> BinlogOffset:
    f, p, e, r = c
    return BinlogOffset.specific(file=f, pos=p, skip_events=e, skip_rows=r)


@st.composite
def gtid_sets(draw):
    parts = []
    for uuid in draw(st.sets(st.sampled_from(UUIDS), min_size=1)):
        lo = draw(st.integers(1, 50))
        hi = draw(st.integers(lo, lo + 100))
        parts.append(f"{uuid}:{lo}-{hi}")
    return ",".join(parts)


# -- same-server scalar coordinates: a total order ---------------------------


@given(coords(), coords())
@settings(max_examples=200, deadline=None)
def test_same_server_order_matches_tuple_order(a, b):
    """(file, pos, skip_events, skip_rows) lexicographic — the reference's
    fallback chain — must agree with Python tuple comparison."""
    oa, ob = offset_from(a), offset_from(b)
    ka = (a[0].lower(), a[1], a[2], a[3])
    kb = (b[0].lower(), b[1], b[2], b[3])
    assert (oa < ob) == (ka < kb)
    assert (oa == ob) == (ka == kb)
    assert oa.is_at_or_before(ob) == (ka <= kb)


@given(coords(), coords(), coords())
@settings(max_examples=100, deadline=None)
def test_transitivity(a, b, c):
    oa, ob, oc = offset_from(a), offset_from(b), offset_from(c)
    if oa.is_at_or_before(ob) and ob.is_at_or_before(oc):
        assert oa.is_at_or_before(oc)


# -- restore: wire-form round trip -------------------------------------------


@given(coords())
@settings(max_examples=100, deadline=None)
def test_json_round_trip_preserves_order_identity(a):
    o = offset_from(a)
    restored = BinlogOffset.from_json(o.to_json())
    assert restored == o
    assert not restored.is_after(o) and not restored.is_before(o)


@given(st.lists(coords(), min_size=2, max_size=8))
@settings(max_examples=100, deadline=None)
def test_restore_preserves_sort_order(cs):
    """A checkpoint's split list restored through JSON sorts identically —
    the assigner's restart invariant."""
    offs = [offset_from(c) for c in cs]
    restored = [BinlogOffset.from_json(o.to_json()) for o in offs]
    assert sorted(offs) == sorted(restored)


# -- GTID semantics ----------------------------------------------------------


@given(gtid_sets())
@settings(max_examples=100, deadline=None)
def test_gtid_subset_is_before(gs):
    """Dropping one transaction from a GTID set makes the offset strictly
    earlier (containment dominates all scalar components)."""
    full = GtidSet(gs)
    uuid, ivs = next(iter(full.intervals.items()))
    lo, hi = ivs[0]
    if hi == lo:
        return  # single-transaction interval: cannot shrink
    smaller_text = str(full).replace(f"{lo}-{hi}", f"{lo}-{hi - 1}")
    behind = BinlogOffset(
        gtid_set=smaller_text, file="binlog.000099", pos=1 << 30
    )  # scalars LATER on purpose
    ahead = BinlogOffset(gtid_set=gs, file="binlog.000001", pos=0)
    assert behind.is_before(ahead)
    assert ahead.is_after(behind)


@given(gtid_sets())
@settings(max_examples=50, deadline=None)
def test_gtid_equal_sets_fall_through_to_skip_events(gs):
    a = BinlogOffset(gtid_set=gs, skip_events=1)
    b = BinlogOffset(gtid_set=gs, skip_events=3)
    assert a.is_before(b) and b.is_after(a)
    assert BinlogOffset(gtid_set=gs) == BinlogOffset(gtid_set=gs)


@given(gtid_sets(), coords())
@settings(max_examples=50, deadline=None)
def test_gtid_less_side_assumed_older(gs, c):
    with_gtid = BinlogOffset(gtid_set=gs)
    without = offset_from(c)
    assert without.is_before(with_gtid)
    assert with_gtid.is_after(without)


def test_gtid_containment_basics():
    a = GtidSet("aaaa-1111:1-10")
    b = GtidSet("aaaa-1111:1-20,bbbb-2222:1-5")
    assert a.is_contained_within(b)
    assert not b.is_contained_within(a)
    # interval merge: 1-3 + 4-6 == 1-6
    assert GtidSet("aaaa-1111:1-3:4-6") == GtidSet("aaaa-1111:1-6")
    # disjoint intervals are not covered by a gap
    assert not GtidSet("aaaa-1111:1-10").is_contained_within(
        GtidSet("aaaa-1111:1-4:7-10")
    )


def test_non_stopping_is_max():
    inf = BinlogOffset.non_stopping()
    big = BinlogOffset(gtid_set="aaaa-1111:1-1000000", file="binlog.999999", pos=1 << 40)
    assert big.is_before(inf) and inf.is_after(big)
    assert inf == BinlogOffset.non_stopping()
    assert inf.kind == NON_STOPPING


def test_different_servers_compare_by_timestamp():
    a = BinlogOffset(server_id=1, ts_sec=100, file="binlog.000009", pos=999)
    b = BinlogOffset(server_id=2, ts_sec=200, file="binlog.000001", pos=0)
    assert a.is_before(b)  # despite later file/pos


# -- wiring: hybrid source state carries composite offsets -------------------


def test_hybrid_state_round_trips_composite(spark, sf_dir):
    import json

    from flink_cdc_connectors_spark.sources.hybrid_source import (
        HybridCdcSource,
        HybridSourceState,
    )
    from flink_cdc_connectors_spark.sources.loaders import load_table

    src = HybridCdcSource(spark, load_table(spark, sf_dir, "events"), num_chunks=3)
    while src.next_snapshot_batch() is not None:
        pass
    wire = src.state.to_json()
    d = json.loads(wire)
    # composite form present and consistent with the scalar form
    assert d["stream_offset_binlog"]["pos"] == d["stream_offset"]
    assert all(c["hw_binlog"]["pos"] == c["hw"] for c in d["chunks"])
    restored = HybridSourceState.from_json(wire)
    assert restored.stream_offset == src.state.stream_offset
    assert [vars(c) for c in restored.chunks] == [vars(c) for c in src.state.chunks]


# -- MongoDB change-stream offsets (ChangeStreamOffset.java:37-103,
#    ResumeTokenUtils.java:30-45) --------------------------------------------

from hypothesis import given, strategies as st

from flink_cdc_connectors_spark.sources.offsets import (
    ChangeStreamOffset,
    bson_timestamp,
    decode_resume_token_timestamp,
)


def _keystring(sec: int, inc: int, trailer: bytes = b"") -> bytes:
    return bytes([130]) + sec.to_bytes(4, "big") + inc.to_bytes(4, "big") + trailer


def test_resume_token_decode_binary_and_hex():
    tok = _keystring(1700000000, 7, b"opaque-id-material")
    assert decode_resume_token_timestamp(tok) == bson_timestamp(1700000000, 7)
    # hex-encoded v0/v1 string form decodes identically
    assert decode_resume_token_timestamp(tok.hex()) == bson_timestamp(1700000000, 7)


def test_resume_token_rejects_unknown_keytype():
    import pytest

    with pytest.raises(ValueError, match="keyType"):
        decode_resume_token_timestamp(bytes([99]) + bytes(8))


def test_changestream_orders_by_cluster_time_only():
    # different tokens, same cluster time -> equal order position
    a = ChangeStreamOffset.from_resume_token(_keystring(100, 5, b"aa"))
    b = ChangeStreamOffset.from_resume_token(_keystring(100, 5, b"bb"))
    assert not a.is_after(b) and not b.is_after(a)
    assert a.is_at_or_before(b)
    # == follows the comparison key (total_ordering consistency: a
    # stricter __eq__ would make compare-equal offsets both > each other);
    # whole-offset-map identity (reference equals()) is same_position
    assert a == b and not a.same_position(b)
    assert not a > b and not b > a  # derived comparisons stay consistent
    # increment breaks ties within the same second
    c = ChangeStreamOffset.from_timestamp(100, 6)
    assert b < c and c.is_after(b)


def test_changestream_no_stopping_is_max():
    inf = ChangeStreamOffset.no_stopping()
    late = ChangeStreamOffset.from_timestamp(0x7FFFFFFF - 1, 0xFFFFFFFF)
    assert late < inf and inf.is_after(late)
    assert inf == ChangeStreamOffset.no_stopping()


@given(
    st.integers(min_value=0, max_value=0xFFFFFFFF),
    st.integers(min_value=0, max_value=0xFFFFFFFF),
    st.integers(min_value=0, max_value=0xFFFFFFFF),
    st.integers(min_value=0, max_value=0xFFFFFFFF),
)
def test_changestream_order_matches_lexicographic_pairs(s1, i1, s2, i2):
    """Restore ordering == (seconds, increment) lexicographic — the
    BsonTimestamp packing must never invert a comparison."""
    a = ChangeStreamOffset.from_timestamp(s1, i1)
    b = ChangeStreamOffset.from_timestamp(s2, i2)
    assert (a < b) == ((s1, i1) < (s2, i2))
    assert a.seconds == s1 and a.increment == i1


@given(
    st.integers(min_value=0, max_value=0xFFFFFFFF),
    st.integers(min_value=0, max_value=0xFFFFFFFF),
    st.binary(max_size=24),
)
def test_changestream_token_roundtrip_and_update(sec, inc, trailer):
    tok = _keystring(sec, inc, trailer)
    o = ChangeStreamOffset.from_resume_token(tok)
    assert ChangeStreamOffset.from_json(o.to_json()) == o
    # updatePosition to a strictly later token advances the order position
    later = _keystring(sec, inc, trailer).hex()
    adv = o.update_position(_keystring(min(sec + 1, 0xFFFFFFFF), inc))
    if sec < 0xFFFFFFFF:
        assert adv.is_after(o)
    assert o.update_position(later) .timestamp == o.timestamp


class TestRedoLogOffset:
    def test_scn_numeric_order(self):
        from flink_cdc_connectors_spark.sources.offsets import RedoLogOffset

        assert RedoLogOffset(5) < RedoLogOffset(9)
        assert RedoLogOffset(0) == RedoLogOffset.INITIAL
        assert not RedoLogOffset(9) < RedoLogOffset(5)

    def test_no_stopping_is_max(self):
        from flink_cdc_connectors_spark.sources.offsets import RedoLogOffset

        big = RedoLogOffset(1 << 40)
        assert big < RedoLogOffset.NO_STOPPING
        assert not RedoLogOffset.NO_STOPPING < big
        assert RedoLogOffset.NO_STOPPING == RedoLogOffset.NO_STOPPING

    def test_empty_scn_sorts_below_present(self):
        # RedoLogOffset.java:82-94: empty vs present -> -1; both empty -> 0
        from flink_cdc_connectors_spark.sources.offsets import RedoLogOffset

        assert RedoLogOffset(None) < RedoLogOffset(0)
        assert not RedoLogOffset(0) < RedoLogOffset(None)
        assert not RedoLogOffset(None) < RedoLogOffset(None)

    def test_wire_roundtrip(self):
        from flink_cdc_connectors_spark.sources.offsets import RedoLogOffset

        o = RedoLogOffset(12345, 12000)
        assert RedoLogOffset.from_dict(o.to_dict()) == o
        assert RedoLogOffset.from_dict({"scn": ""}).scn is None


class TestTxLogLsn:
    def test_parse_format_roundtrip(self):
        from flink_cdc_connectors_spark.sources.offsets import TxLogLsn

        t = "00000025:00000448:0001"
        assert str(TxLogLsn.parse(t)) == t

    def test_tuple_order_equals_bytewise(self):
        import itertools

        from flink_cdc_connectors_spark.sources.offsets import TxLogLsn

        samples = [
            TxLogLsn(0x25, 0x448, 1),
            TxLogLsn(0x25, 0x448, 2),
            TxLogLsn(0x25, 0x450, 0),
            TxLogLsn(0x26, 0, 0),
            TxLogLsn(0, 0xFFFFFFFF, 0xFFFF),
        ]
        for a, b in itertools.permutations(samples, 2):
            assert (a < b) == (a.to_bytes() < b.to_bytes())

    def test_bytes_roundtrip(self):
        from flink_cdc_connectors_spark.sources.offsets import TxLogLsn

        o = TxLogLsn(0x1234, 0xABCD, 0x11)
        assert TxLogLsn.from_bytes(o.to_bytes()) == o


def test_gtid_failover_query_agrees_with_gtidset_algebra(spark, sf_dir):
    """Bridge the set algebra and the query semantics: for every log event,
    emission by cdc_gtid_failover must equal NON-containment of the
    event's single-transaction GTID set within the restored set (the
    BinlogOffset.compareTo GTID path, applied row-wise)."""
    import duckdb

    from flink_cdc_connectors_spark.queries.tier_a_ext import _LOGGED_SQL
    from flink_cdc_connectors_spark.registry import all_queries
    from flink_cdc_connectors_spark.sources.offsets import GtidSet

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    log = con.execute(
        f"""WITH logged AS ({_LOGGED_SQL})
        SELECT event_id,
               CASE WHEN event_id % 2 = 0 THEN 'uuid-a' ELSE 'uuid-b' END AS server_uuid,
               event_id // 2 + 1 AS seq
        FROM logged"""
    ).fetchdf()
    raw = con.execute(
        """SELECT CASE WHEN event_id % 2 = 0 THEN 'uuid-a' ELSE 'uuid-b' END AS server_uuid,
                  event_id // 2 + 1 AS seq FROM events"""
    ).fetchdf()
    bounds = {
        u: int((raw[raw.server_uuid == u].seq.max()) * f)
        for u, f in (("uuid-a", 0.6), ("uuid-b", 0.4))
    }
    restored = GtidSet(
        f"uuid-a:1-{bounds['uuid-a']},uuid-b:1-{bounds['uuid-b']}"
    )
    emitted_oracle = con.execute(
        all_queries()["cdc_gtid_failover"].oracle
    ).fetchdf()
    # row-wise replay through the set algebra
    want = {"uuid-a": 0, "uuid-b": 0}
    for r in log.itertuples(index=False):
        txn = GtidSet(f"{r.server_uuid}:{int(r.seq)}")
        if not txn.is_contained_within(restored):
            want[r.server_uuid] += 1
    got = dict(zip(emitted_oracle.server_uuid, emitted_oracle.n_emitted))
    assert {k: int(v) for k, v in got.items()} == want


def test_resume_token_reference_fixtures():
    """The three resume tokens from the reference's own unit suite
    (ResumeTokenUtilsTest.java:28-57 — BinData base64, hex v0, hex v1)
    decode to the exact BsonTimestamps the reference asserts."""
    import base64

    from flink_cdc_connectors_spark.sources.offsets import (
        bson_timestamp,
        decode_resume_token_timestamp,
    )

    bin_tok = base64.b64decode(
        "gmNXqzwAAAABRmRfaWQAZGNXqj41xq4H4ebHNwBaEATmzwG2DzpOl4tpOyYEG9zABA=="
    )
    assert decode_resume_token_timestamp(bin_tok) == bson_timestamp(1666689852, 1)
    assert decode_resume_token_timestamp(
        "826357B0840000000129295A1004461ECCED47A6420D9713A513565036074664"
        "5F696400646357B05F35C6AE07E1E6C7390004"
    ) == bson_timestamp(1666691204, 1)
    assert decode_resume_token_timestamp(
        "82612E8513000000012B022C0100296E5A1004A5093ABB38FE4B9EA67F01BB1A"
        "96D812463C5F6964003C5F5F5F78000004"
    ) == bson_timestamp(1630438675, 1)


def test_gtid_reference_wire_strings():
    """The GTID strings from the reference's serializer suite
    (SerializerUtilsTest.java:83-105): the canonical uuid:1-19 form parses
    and orders by containment; the degenerate 'foo-gtid' string rides the
    BinlogOffset wire form OPAQUELY (the reference serializes it without
    interpreting it)."""
    from flink_cdc_connectors_spark.sources.offsets import BinlogOffset, GtidSet

    g19 = GtidSet("24DA167-0C0C-11E8-8442-00059A3C7B00:1-19")
    g10 = GtidSet("24DA167-0C0C-11E8-8442-00059A3C7B00:1-10")
    assert str(g19) == "24da167-0c0c-11e8-8442-00059a3c7b00:1-19"
    assert g10.is_contained_within(g19) and not g19.is_contained_within(g10)

    o = BinlogOffset.from_dict({"gtids": "foo-gtid", "file": "", "pos": 0})
    assert o.gtid_set == "foo-gtid"
    assert BinlogOffset.from_json(o.to_json()).gtid_set == "foo-gtid"
