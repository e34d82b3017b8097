"""gRPC over raw-socket HTTP/2 (sources/http2grpc.py, r7): the wire
protocol implemented from RFC 7540/7541 + the gRPC framing spec, with
no grpcio anywhere. These tests pin HPACK both ways, the frame layer's
flow control on >64 KB bodies, error trailers, and the REAL reference
poll loop (FeedPoller) crossing an actual TCP connection."""

from __future__ import annotations

import pytest

from hephaestus_spark.sources.http2grpc import (
    HpackDecoder,
    HpackEncoder,
    Http2GrpcClient,
    _int_decode,
    _int_encode,
    grpc_unwrap,
    grpc_wrap,
)
from hephaestus_spark.sources.grpc_source import (
    InProcessTransport,
    SocketGrpcTransport,
    serve_transport,
)
from hephaestus_spark.sources import protodecode as pc


def test_hpack_integer_prefix_coding():
    for value in [0, 1, 30, 31, 126, 127, 128, 300, 16_383, 2_000_000]:
        for prefix in (4, 5, 6, 7):
            enc = _int_encode(value, prefix, 0)
            got, pos = _int_decode(enc, 0, prefix)
            assert (got, pos) == (value, len(enc)), (value, prefix)


def test_hpack_round_trip_request_headers():
    headers = [
        (":method", "POST"),
        (":scheme", "http"),
        (":path", "/olympus.ScraperService/GetEmployees"),
        (":authority", "127.0.0.1:50051"),
        ("content-type", "application/grpc"),
        ("te", "trailers"),
        ("x-custom-header", "some value"),
    ]
    block = HpackEncoder().encode(headers)
    assert HpackDecoder().decode(block) == headers
    # exact static matches compress to ONE byte (indexed representation)
    assert len(HpackEncoder().encode([(":method", "POST")])) == 1


def test_hpack_decoder_handles_incremental_indexing():
    """Our encoder never uses the dynamic table, but a conforming peer
    may: literal-with-incremental-indexing (0x40) must be stored and
    then resolvable by dynamic index."""
    name, value = b"x-tok", b"abc"
    block = (
        bytes([0x40, len(name)]) + name + bytes([len(value)]) + value
        + bytes([0x80 | 62])  # dynamic table slot 1 = static size + 1
    )
    dec = HpackDecoder()
    assert dec.decode(block) == [("x-tok", "abc"), ("x-tok", "abc")]


def test_hpack_decoder_rejects_huffman():
    with pytest.raises(ValueError, match="Huffman"):
        HpackDecoder().decode(bytes([0x00, 0x81, 0xFF, 0x00]))


def test_grpc_framing_round_trip():
    for msg in (b"", b"x", b"payload" * 1000):
        assert grpc_unwrap(grpc_wrap(msg)) == msg
    with pytest.raises(ValueError, match="compressed"):
        grpc_unwrap(b"\x01\x00\x00\x00\x01x")
    with pytest.raises(ValueError, match="mismatch"):
        grpc_unwrap(b"\x00\x00\x00\x00\x05abc")


@pytest.fixture()
def socket_pair():
    upstream = InProcessTransport(
        employee_payloads=[
            pc.encode_message(
                {"id": i, "fullname": f"Emp {i}", "shortname": f"e{i}",
                 "position": "eng", "email": f"e{i}@x.com", "phone": "123"},
                pc.EMPLOYEE_FIELDS,
            )
            for i in range(5)
        ],
        task_payloads_by_date={
            "2024-03-01": [
                pc.encode_message(
                    {"id": 7, "type": "repair", "description": "d",
                     "executors": [1, 2], "is_closed": False},
                    pc.TASK_FIELDS,
                )
            ]
        },
        task_types=["repair", "install"],
    )
    server = serve_transport(upstream)
    transport = SocketGrpcTransport("127.0.0.1", server.port)
    yield upstream, transport
    transport.close()
    server.stop()


def test_unary_calls_over_real_socket(socket_pair):
    upstream, transport = socket_pair
    # employees: full feed, then hash short-circuit ON THE WIRE
    r1 = transport.get_employees(None)
    assert len(r1.payloads) == 5 and r1.new_hash
    assert pc.decode_message(r1.payloads[0], pc.EMPLOYEE_FIELDS)["fullname"] == "Emp 0"
    r2 = transport.get_employees(r1.new_hash)
    assert r2.payloads == [] and r2.new_hash == r1.new_hash
    # tasks by date + types
    t = transport.get_daily_tasks(None, "2024-03-01")
    assert len(t.payloads) == 1
    assert pc.decode_message(t.payloads[0], pc.TASK_FIELDS)["type"] == "repair"
    assert transport.get_daily_tasks(None, "2099-01-01").payloads == []
    assert transport.get_task_types() == ["repair", "install"]


def test_large_body_streams_through_flow_control(socket_pair):
    """A feed bigger than the 65535-byte initial window AND the 16 KB
    frame size: multi-frame DATA + WINDOW_UPDATE replenishment both
    directions."""
    upstream, transport = socket_pair
    big = [b"\x12" + bytes([200]) + bytes(200) for _ in range(900)]  # ~180 KB
    upstream.employee_payloads = big
    r = transport.get_employees(None)
    assert len(r.payloads) == 900
    assert all(p == big[0] for p in r.payloads)


def test_unknown_method_surfaces_grpc_status(socket_pair):
    _, transport = socket_pair
    with pytest.raises(ConnectionError, match="grpc-status 12"):
        transport._client.call("/olympus.ScraperService/NoSuchMethod", b"")


def test_feed_poller_end_to_end_over_socket(spark, tmp_path, socket_pair):
    """The reference poll loop (A1) across a real TCP connection:
    retry-wrapped RPC -> wire decode -> parquet feed file, second poll
    hash-skips without landing a file."""
    import datetime

    from hephaestus_spark.sources.grpc_source import FeedPoller

    _, transport = socket_pair
    poller = FeedPoller(
        transport=transport, employee_feed_dir=str(tmp_path / "feed")
    )
    n = poller.poll_employees_once(spark, feed_date=datetime.date(2024, 3, 1))
    assert n == 5
    df = spark.read.parquet(str(tmp_path / "feed"))
    assert df.count() == 5
    assert {r["fullname"] for r in df.collect()} == {f"Emp {i}" for i in range(5)}
    assert poller.poll_employees_once(spark, feed_date=datetime.date(2024, 3, 2)) == 0
    assert df.count() == 5  # no second file landed


# --------------------------------------------------------------------------
# property fuzz: HPACK + prefix integers under hypothesis
# --------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st

_header_name = st.one_of(
    st.sampled_from([n for n, _ in __import__(
        "hephaestus_spark.sources.http2grpc", fromlist=["HPACK_STATIC"]
    ).HPACK_STATIC]),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=24
    ),
)
_header_value = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=64,
)


@given(headers=st.lists(st.tuples(_header_name, _header_value), max_size=12))
@settings(max_examples=300, deadline=None)
def test_hpack_encode_decode_round_trips_any_headers(headers):
    block = HpackEncoder().encode(headers)
    assert HpackDecoder().decode(block) == headers


@given(value=st.integers(min_value=0, max_value=2**40), prefix=st.integers(4, 8))
@settings(max_examples=500, deadline=None)
def test_prefix_integer_round_trips(value, prefix):
    enc = _int_encode(value, prefix, 0)
    got, pos = _int_decode(enc, 0, prefix)
    assert (got, pos) == (value, len(enc))
