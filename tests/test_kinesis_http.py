"""The real-endpoint seam, finally executed: the stdlib SigV4 HTTP client
drives a live kinesalite-shaped local endpoint through the sink's actual
retry path, with the endpoint re-verifying every signature from the raw
wire bytes (tests/fake_kinesis_http.py). Mirrors the reference's manual
docker-compose + kinesalite test mode (main.go:80-97) without boto3/docker.
"""

from __future__ import annotations

import pytest

from nsq2kinesis_spark.streaming.kinesis_http import HttpKinesisClient, sign_request
from nsq2kinesis_spark.streaming.kinesis_sink import send_entries
from nsq2kinesis_spark.streaming.kpl import KplAggregator, deaggregate

from .fake_kinesis_http import FakeKinesisHTTP


def test_sigv4_golden_vector():
    """Signing is a pure function; pin an exact Authorization string so any
    canonicalization drift (header order, hashing, key chain) is caught
    without a network."""
    headers = sign_request(
        host="127.0.0.1:4567",
        target="Kinesis_20131202.PutRecords",
        body=b'{"StreamName":"s","Records":[]}',
        region="us-east-1",
        access_key="test",
        secret_key="test",
        amz_date="20260101T000000Z",
    )
    assert headers["Authorization"] == (
        "AWS4-HMAC-SHA256 Credential=test/20260101/us-east-1/kinesis/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date;x-amz-target, "
        "Signature=6efa4d12cfeaeec4a6b74124ffd26f91039b40a1870846e6e6f8a2837651842b"
    )


def test_sigv4_matches_botocore_independent_implementation():
    """Cross-check against botocore's SigV4Auth (an independent
    implementation): sign the identical request with both
    implementations and require identical Authorization headers. botocore
    stamps its own X-Amz-Date; we read it back and feed the same instant to
    our signer, so the comparison is exact without clock freezing."""
    botocore_auth = pytest.importorskip("botocore.auth")
    from botocore.awsrequest import AWSRequest
    from botocore.credentials import Credentials

    body = b'{"StreamName":"events","Records":[]}'
    req = AWSRequest(
        method="POST",
        url="http://127.0.0.1:4567/",
        data=body,
        headers={
            "Content-Type": "application/x-amz-json-1.1",
            "X-Amz-Target": "Kinesis_20131202.PutRecords",
        },
    )
    botocore_auth.SigV4Auth(
        Credentials("test", "test"), "kinesis", "us-east-1"
    ).add_auth(req)
    ours = sign_request(
        host="127.0.0.1:4567",
        target="Kinesis_20131202.PutRecords",
        body=body,
        region="us-east-1",
        access_key="test",
        secret_key="test",
        amz_date=req.headers["X-Amz-Date"],
    )
    assert ours["Authorization"] == req.headers["Authorization"]


def _pack(payloads: list[bytes]):
    agg = KplAggregator()
    for p in payloads:
        agg.put(p)
    return agg.drain()


@pytest.mark.slow
def test_http_endpoint_end_to_end_with_retry():
    # ~1.3 kB payloads so the packer emits several aggregated entries and
    # the injected failures hit distinct slots of one PutRecords call
    payloads = [f"msg-{i:04d}".encode() * 150 for i in range(200)]
    entries = _pack(payloads)
    assert len(entries) >= 3
    # fail two slots of the first call; the sink must selectively resend
    with FakeKinesisHTTP(fail_plan={0: {0, 1}}) as srv:
        # trailing slash on purpose: the client must normalize to "/"
        client = HttpKinesisClient(endpoint_url=srv.endpoint_url + "/")
        client.create_stream(StreamName="events", ShardCount=1)
        n_calls, n_retried = send_entries(
            client, "events", entries, sleep=lambda _: None
        )
        assert srv.created_streams == ["events"]
        assert srv.auth_failures == [], srv.auth_failures
        assert n_calls == 2 and n_retried == 2  # one resend call, two slots
        # byte-exact delivery: deaggregate everything the endpoint stored
        got = [
            data for _, frame in srv.records for _, data in deaggregate(frame)
        ]
        assert sorted(got) == sorted(payloads)


@pytest.mark.slow
def test_http_endpoint_rejects_bad_secret():
    with FakeKinesisHTTP(secret_key="other") as srv:
        client = HttpKinesisClient(endpoint_url=srv.endpoint_url)
        with pytest.raises(RuntimeError, match="HTTP 403"):
            client.create_stream(StreamName="events")
        assert srv.auth_failures, "endpoint must have rejected the signature"


@pytest.mark.slow
def test_boto3_client_against_live_endpoint(monkeypatch):
    """The reference's kinesalite recipe (docker-compose.yml + main.go test
    mode), executed fully in-image: the REAL boto3 client, configured by the
    CLI factory in TEST MODE (static creds + custom endpoint), delivers
    through send_entries to the live endpoint, which verifies boto3's own
    SigV4 signatures (incl. the amz-sdk-* headers boto3 signs)."""
    import argparse

    pytest.importorskip("boto3")
    from nsq2kinesis_spark.__main__ import make_client_factory

    # a developer machine may export real AWS credentials; the endpoint
    # only knows the static test pair
    for var in (
        "AWS_REGION",
        "AWS_DEFAULT_REGION",
        "AWS_ACCESS_KEY_ID",
        "AWS_SECRET_ACCESS_KEY",
        "AWS_SESSION_TOKEN",
        "AWS_PROFILE",
    ):
        monkeypatch.delenv(var, raising=False)
    payloads = [f"b3-{i:04d}".encode() * 150 for i in range(100)]
    entries = _pack(payloads)
    with FakeKinesisHTTP(fail_plan={0: {0}}) as srv:
        # trailing slash on purpose: the client must normalize to "/"
        args = argparse.Namespace(
            spool_dir=None, kinesis_endpoint=srv.endpoint_url + "/", test=True
        )
        client = make_client_factory(args)()
        client.create_stream(StreamName="events", ShardCount=1)
        n_calls, n_retried = send_entries(
            client, "events", entries, sleep=lambda _: None
        )
        assert srv.auth_failures == [], srv.auth_failures
        assert srv.created_streams == ["events"]
        assert n_calls == 2 and n_retried == 1
        got = [
            data for _, frame in srv.records for _, data in deaggregate(frame)
        ]
        assert sorted(got) == sorted(payloads)


def test_cli_factory_falls_back_to_http_client_without_boto3(monkeypatch):
    """--kinesis-endpoint in a boto3-less image must wire the stdlib HTTP
    client instead of refusing to run (boto3 IS present here, so simulate
    its absence)."""
    import argparse
    import sys

    from nsq2kinesis_spark.__main__ import make_client_factory

    monkeypatch.setitem(sys.modules, "boto3", None)  # import boto3 -> ImportError
    args = argparse.Namespace(
        spool_dir=None, kinesis_endpoint="http://127.0.0.1:1", test=True
    )
    client = make_client_factory(args)()
    assert isinstance(client, HttpKinesisClient)
    assert client.endpoint_url == "http://127.0.0.1:1"
    # outside test mode, missing env credentials must refuse upfront with a
    # clear error instead of silently signing as "test"
    for var in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY"):
        monkeypatch.delenv(var, raising=False)
    args = argparse.Namespace(
        spool_dir=None, kinesis_endpoint="http://127.0.0.1:1", test=False
    )
    with pytest.raises(SystemExit, match="no AWS credentials"):
        make_client_factory(args)()


def test_sigv4_property_matches_botocore():
    """Fuzz the signer against botocore's independent SigV4 implementation:
    for ANY body bytes and operation name, both must produce the identical
    Authorization header (same canonicalization, key chain, and hashing) —
    the property the single golden vector can't give."""
    botocore_auth = pytest.importorskip("botocore.auth")
    from botocore.awsrequest import AWSRequest
    from botocore.credentials import Credentials
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        body=st.binary(min_size=0, max_size=4_000),
        op=st.sampled_from(
            ["PutRecords", "CreateStream", "DescribeStream", "ListShards"]
        ),
        region=st.sampled_from(["us-east-1", "eu-central-1", "ap-southeast-2"]),
        secret=st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=40,
        ),
    )
    def check(body: bytes, op: str, region: str, secret: str) -> None:
        target = f"Kinesis_20131202.{op}"
        req = AWSRequest(
            method="POST",
            url="http://127.0.0.1:4567/",
            data=body,
            headers={
                "Content-Type": "application/x-amz-json-1.1",
                "X-Amz-Target": target,
            },
        )
        botocore_auth.SigV4Auth(
            Credentials("AKID", secret), "kinesis", region
        ).add_auth(req)
        ours = sign_request(
            host="127.0.0.1:4567",
            target=target,
            body=body,
            region=region,
            access_key="AKID",
            secret_key=secret,
            amz_date=req.headers["X-Amz-Date"],
        )
        assert ours["Authorization"] == req.headers["Authorization"]

    check()


@pytest.mark.slow
def test_session_token_is_carried_and_signed():
    """STS temporary credentials: the x-amz-security-token header must be
    both sent and included in the signed header set — the live endpoint
    verifies the signature over exactly the declared SignedHeaders."""
    with FakeKinesisHTTP() as srv:
        client = HttpKinesisClient(
            endpoint_url=srv.endpoint_url, session_token="tok-123"
        )
        client.create_stream(StreamName="events")
        assert srv.auth_failures == [], srv.auth_failures
        assert srv.created_streams == ["events"]
    headers = sign_request(
        host="h",
        target="Kinesis_20131202.PutRecords",
        body=b"{}",
        region="us-east-1",
        access_key="test",
        secret_key="test",
        amz_date="20260101T000000Z",
        session_token="tok-123",
    )
    assert headers["X-Amz-Security-Token"] == "tok-123"
    assert "x-amz-security-token" in headers["Authorization"]


def test_sigv4_trimall_header_values_match_botocore():
    """Signed header values carrying leading/trailing/internal whitespace
    runs (some STS tokens do) must canonicalize per the spec's trimall
    rule — cross-checked against botocore on a whitespace-heavy token."""
    botocore_auth = pytest.importorskip("botocore.auth")
    from botocore.awsrequest import AWSRequest
    from botocore.credentials import Credentials

    token = "  AQoDYXdzEJr  \t doubled   spaces  "
    req = AWSRequest(
        method="POST",
        url="http://127.0.0.1:4567/",
        data=b"{}",
        headers={
            "Content-Type": "application/x-amz-json-1.1",
            "X-Amz-Target": "Kinesis_20131202.PutRecords",
            "X-Amz-Security-Token": token,
        },
    )
    botocore_auth.SigV4Auth(
        Credentials("AKID", "SECRET"), "kinesis", "us-east-1"
    ).add_auth(req)
    ours = sign_request(
        host="127.0.0.1:4567",
        target="Kinesis_20131202.PutRecords",
        body=b"{}",
        region="us-east-1",
        access_key="AKID",
        secret_key="SECRET",
        amz_date=req.headers["X-Amz-Date"],
        session_token=token,
    )
    assert ours["Authorization"] == req.headers["Authorization"]


def test_endpoint_with_path_component_is_rejected_eagerly():
    """sign_request covers canonical URI "/" only; an endpoint URL with a
    path (reverse-proxy style) would sign "/" but post elsewhere — an
    opaque 403. The client must refuse upfront with the actual reason."""
    from nsq2kinesis_spark.streaming.kinesis_http import HttpKinesisClient

    client = HttpKinesisClient(endpoint_url="http://127.0.0.1:4567/kinesis")
    with pytest.raises(ValueError, match="path component"):
        client.create_stream(StreamName="s")
