"""Property-based round-trip tests for the KPL packer (hypothesis).

Generalizes the reference's round-trip oracle pattern (reference
aggregator_test.go:118-138 packs then decodes with an independent
deaggregation library) and its fuzzing wishlist (reference TODO.md): for
ANY sequence of bodies/keys, packing then deaggregating must reproduce
every record byte-exactly, in order, with its effective partition key, and
every packed frame must satisfy the structural invariants (magic, MD5
trailer, dictionary indices in range, size bound).
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from nsq2kinesis_spark.streaming.kpl import (
    DEFAULT_TARGET_SIZE,
    KPL_MAGIC,
    KplAggregator,
    deaggregate,
    effective_partition_key,
    is_aggregated,
)

bodies = st.binary(min_size=0, max_size=2_000)
# keys include non-ASCII text: partition-key size accounting is in UTF-8
# BYTES (a 255-char CJK key is 765 wire bytes), so the round-trip must
# hold when chars != bytes
keys = st.one_of(
    st.none(),
    st.text(min_size=0, max_size=300, alphabet=st.characters(codec="ascii")),
    st.text(min_size=0, max_size=100, alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",))),
)


def pack_all(records: list[tuple[bytes, str | None]]):
    agg = KplAggregator()
    for data, key in records:
        agg.put(data, key)
    return agg.drain()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(bodies, keys), max_size=60))
def test_roundtrip_any_sequence(records):
    entries = pack_all(records)
    got: list[tuple[str, bytes]] = []
    for e in entries:
        if is_aggregated(e.data):
            got.extend(deaggregate(e.data))
        else:
            got.append((e.partition_key, e.data))
    expected = [(effective_partition_key(d, k), d) for d, k in records]
    assert got == expected  # byte-exact, order-preserving, keys resolved


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(bodies, keys), min_size=1, max_size=60))
def test_frame_invariants(records):
    for e in pack_all(records):
        if not is_aggregated(e.data):
            # pass-through: body larger than target — never framed
            assert len(e.data) > 0 or e.data == b""
            continue
        frame = e.data
        assert frame[:4] == KPL_MAGIC
        proto, md5 = frame[4:-16], frame[-16:]
        assert hashlib.md5(proto).digest() == md5
        recs = deaggregate(frame)
        assert len(recs) >= 1
        # packed frames respect the greedy size bound: data + first-seen keys
        seen: set[str] = set()
        size = 0
        for pk, data in recs:
            if pk not in seen:
                seen.add(pk)
                size += len(pk)
            size += len(data)
        assert size <= DEFAULT_TARGET_SIZE
        # the frame's partition key is the first key in its table
        assert e.partition_key == recs[0][0]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(bodies, keys), max_size=40))
def test_slot_mapping_covers_all_inputs(records):
    """Every input ordinal appears in exactly one entry's ``slots``, in
    order, and maps to its own body — the contract the sink's selective
    retry depends on (reference kinesis_writer.go:66-75 slot→messages map;
    here put() returns the input ordinal and PackedEntry.slots carries the
    entry→inputs mapping)."""
    agg = KplAggregator()
    ordinals = [agg.put(d, k) for d, k in records]
    entries = agg.drain()
    assert ordinals == list(range(len(records)))  # put returns input ordinals
    covered = [s for e in entries for s in e.slots]
    assert covered == ordinals  # partition of inputs, in order
    for e in entries:
        datas = (
            [d for _, d in deaggregate(e.data)]
            if is_aggregated(e.data)
            else [e.data]
        )
        assert datas == [records[s][0] for s in e.slots]


@given(
    msg_id=st.text(min_size=1, max_size=32),
    attempts=st.integers(min_value=1, max_value=65_535),
    base=st.integers(min_value=1, max_value=10_000),
    cap=st.integers(min_value=1, max_value=600_000),
)
@settings(max_examples=200, deadline=None)
def test_requeue_delay_invariants(msg_id, attempts, base, cap):
    """Backoff policy holds for ANY message id / attempts / config: delay
    is deterministic, inside [exp/2, exp) for exp = min(base·2^(a−1), cap),
    and never exceeds the cap (uint16 attempts must not overflow)."""
    from nsq2kinesis_spark.sources.nsq import requeue_delay_ms

    d = requeue_delay_ms(msg_id, attempts, base, cap)
    assert d == requeue_delay_ms(msg_id, attempts, base, cap)  # deterministic
    exp = min(base << min(attempts - 1, 20), cap)  # base, cap >= 1 → exp >= 1
    assert exp // 2 <= d < exp or d == exp // 2  # half-jitter band (exp=1 → d=0)
    assert 0 <= d <= cap
