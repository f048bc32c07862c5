"""KPL packer unit tests — mirrors the reference's aggregator test suite
(reference pkg/aggregator/aggregator_test.go) including the packing-ratio
invariants and byte-exact round-trip oracle."""

from __future__ import annotations

import random

import pytest

from nsq2kinesis_spark.streaming.kpl import (
    KPL_MAGIC,
    KplAggregator,
    deaggregate,
    default_partition_key,
    effective_partition_key,
    encode_aggregated,
    fnv64a,
    is_aggregated,
)


def test_fnv64a_known_vectors():
    # public FNV-64a test vectors
    assert fnv64a(b"") == 0xCBF29CE484222325
    assert fnv64a(b"a") == 0xAF63DC4C8601EC8C
    assert fnv64a(b"foobar") == 0x85944171F73967E8


def test_default_partition_key_is_hex():
    key = default_partition_key(b"hello")
    assert key == f"{fnv64a(b'hello'):x}"
    assert len(key) <= 16


@pytest.mark.parametrize(
    "key,expected_own",
    [("ok", True), ("", False), (None, False), ("x" * 255, True), ("x" * 256, False)],
)
def test_effective_partition_key_fallback(key, expected_own):
    # reference aggregator.go:124-130: valid = non-empty and <= 255 chars
    got = effective_partition_key(b"body", key)
    assert (got == key) == expected_own


def test_two_small_records_frame_is_78_bytes():
    """Reference aggregator_test.go:87-92: two 5-byte records with default
    (16-hex-char) keys frame to exactly 78 bytes = 4 magic + 58 protobuf +
    16 md5."""
    agg = KplAggregator()
    agg.put(b"hello")
    agg.put(b"world")
    entries = agg.drain()
    assert len(entries) == 1
    assert len(entries[0].data) == 78
    # size accounting: 10 data + 32 keys
    agg2 = KplAggregator()
    agg2.put(b"hello")
    agg2.put(b"world")
    assert agg2.size == 42  # 10 data + 2×16 keys


def test_key_dictionary_dedup():
    """Repeated keys are dictionary-encoded once (aggregator_test.go:156-173)."""
    agg = KplAggregator()
    agg.put(b"aaaaa", "p1")
    agg.put(b"bbbbb", "p1")
    assert agg.size == 10 + 2  # data + key once
    entries = agg.drain()
    assert len(entries) == 1
    assert deaggregate(entries[0].data) == [("p1", b"aaaaa"), ("p1", b"bbbbb")]


def test_oversize_passthrough():
    """Bodies > target skip packing (aggregator_test.go:175-188)."""
    agg = KplAggregator()
    big = b"x" * 26_000
    agg.put(b"small", "k")
    agg.put(big, "big")
    agg.put(b"small2", "k")
    entries = agg.drain()
    datas = [e.data for e in entries]
    assert big in datas  # raw, unframed
    assert not is_aggregated(big)
    packed = [e for e in entries if is_aggregated(e.data)]
    assert len(packed) == 1
    assert [d for _, d in deaggregate(packed[0].data)] == [b"small", b"small2"]


def test_target_size_crossing_starts_new_aggregate():
    """Adding a record that would exceed target flushes first
    (aggregator_test.go:140-154)."""
    agg = KplAggregator()
    agg.put(b"x" * 24_994, "rand")  # 24_994 + 4 = 24_998 ≤ 25_000
    assert agg.size == 24_998
    agg.put(b"y" * 10, "rand2")  # would be 24_998 + 15 > 25_000 → flush
    entries = agg.drain()
    assert len(entries) == 2


def test_packing_invariant_1000x1kb_is_42_records():
    """The reference's benchmark-asserted invariant
    (aggregator_test.go:218-223, 239-244): 1000×1000 B bodies, key 'a' →
    exactly 42 entries; 100 → exactly 5."""
    rng = random.Random(42)
    agg = KplAggregator()
    for _ in range(1000):
        agg.put(bytes(rng.getrandbits(8) for _ in range(1000)), "a")
    assert len(agg.drain()) == 42
    for _ in range(100):
        agg.put(bytes(rng.getrandbits(8) for _ in range(1000)), "a")
    assert len(agg.drain()) == 5


def test_roundtrip_bytes_exact():
    """Round-trip oracle (aggregator_test.go:118-138): pack then decode with
    the independent decoder; user records survive byte-exact, in order."""
    rng = random.Random(7)
    bodies = [bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 2000))) for _ in range(100)]
    keys = [None if i % 3 == 0 else f"key{i % 7}" for i in range(100)]
    agg = KplAggregator()
    slots = [agg.put(b, k) for b, k in zip(bodies, keys)]
    assert slots == list(range(100))
    entries = agg.drain()
    recovered = []
    covered_slots = []
    for e in entries:
        covered_slots.extend(e.slots)
        if is_aggregated(e.data):
            for pk, data in deaggregate(e.data):
                recovered.append((pk, data))
        else:
            recovered.append((e.partition_key, e.data))
    assert [d for _, d in recovered] == bodies
    assert sorted(covered_slots) == list(range(100))
    for (pk, data), key in zip(recovered, keys):
        assert pk == effective_partition_key(data, key)


def test_drain_resets_state():
    agg = KplAggregator()
    agg.put(b"one")
    assert agg.drain()
    assert agg.drain() == []  # empty drain (aggregator_test.go:110-116)
    assert agg.size == 0
    assert agg.count == 0


def test_corrupt_frame_rejected():
    frame = encode_aggregated(["k"], [(0, b"data")])
    deaggregate(frame)  # sanity
    with pytest.raises(ValueError, match="checksum"):
        deaggregate(frame[:-1] + bytes([frame[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="magic"):
        deaggregate(b"nope" + frame[4:])
