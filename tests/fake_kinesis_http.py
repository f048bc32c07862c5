"""Live HTTP Kinesis endpoint for tests: kinesalite-shaped, plus signature
re-verification kinesalite itself skips.

Accepts the ``application/x-amz-json-1.1`` POSTs the engine's
HttpKinesisClient sends, dispatches on ``X-Amz-Target``, stores PutRecords
payloads, and — unlike kinesalite — recomputes the SigV4 signature from the
received raw body + headers with the known static secret and rejects any
mismatch with 403, so the e2e test proves the client's canonicalization of
the actual wire bytes, not just that requests arrive.

Failure injection mirrors FakeKinesisClient.fail_plan: call ordinal → entry
indices to fail with ProvisionedThroughputExceededException, exercising the
sink's selective-retry path over real HTTP.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

class FakeKinesisHTTP:
    def __init__(
        self,
        fail_plan: dict[int, set[int]] | None = None,
        access_key: str = "test",
        secret_key: str = "test",
        region: str = "us-east-1",
    ) -> None:
        self.fail_plan = fail_plan or {}
        self.access_key, self.secret_key, self.region = access_key, secret_key, region
        self.records: list[tuple[str, bytes]] = []
        self.calls: list[int] = []  # record count per PutRecords call
        self.created_streams: list[str] = []
        self.auth_failures: list[str] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self) -> None:
                body = self.rfile.read(int(self.headers.get("Content-Length", "0")))
                target = self.headers.get("X-Amz-Target", "")
                # re-verify the signature against the received raw bytes,
                # honoring whatever header set the client chose to sign
                # (boto3 signs amz-sdk-* headers our client doesn't send)
                err = outer._verify_sigv4(
                    self.headers.get("Authorization", ""), self.headers, body
                )
                if err:
                    outer.auth_failures.append(err)
                    self._reply(403, {"__type": "IncompleteSignatureException"})
                    return
                req = json.loads(body)
                if target.endswith("CreateStream"):
                    outer.created_streams.append(req["StreamName"])
                    self._reply(200, {})
                    return
                if target.endswith("PutRecords"):
                    call_no = len(outer.calls)
                    failed = outer.fail_plan.get(call_no, set())
                    outer.calls.append(len(req["Records"]))
                    results, n_failed = [], 0
                    for i, rec in enumerate(req["Records"]):
                        if i in failed:
                            n_failed += 1
                            results.append(
                                {
                                    "ErrorCode": "ProvisionedThroughputExceededException",
                                    "ErrorMessage": "injected",
                                }
                            )
                        else:
                            outer.records.append(
                                (rec["PartitionKey"], base64.b64decode(rec["Data"]))
                            )
                            results.append(
                                {
                                    "SequenceNumber": str(len(outer.records)),
                                    "ShardId": "shardId-000000000000",
                                }
                            )
                    self._reply(
                        200, {"FailedRecordCount": n_failed, "Records": results}
                    )
                    return
                self._reply(400, {"__type": "UnknownOperationException"})

            def _reply(self, code: int, payload: dict) -> None:
                raw = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint_url = f"http://127.0.0.1:{self._server.server_port}"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def _verify_sigv4(self, authorization: str, headers, body: bytes) -> str | None:
        """Recompute the SigV4 signature from the received raw request for
        the exact SignedHeaders the client declared; return an error string
        on mismatch (None = verified). Generic: validates both the engine's
        stdlib client and real botocore-signed requests."""
        import hashlib
        import hmac as hmac_mod
        import re

        # independent key derivation (deliberately NOT imported from the
        # production module, so a chain-order/service-string bug there
        # cannot self-verify)
        def derive(secret: str, datestamp: str, region: str, service: str) -> bytes:
            k = ("AWS4" + secret).encode()
            for part in (datestamp, region, service, "aws4_request"):
                k = hmac_mod.new(k, part.encode(), hashlib.sha256).digest()
            return k

        m = re.match(
            r"AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/([^/]+)/aws4_request, "
            r"SignedHeaders=([^,]+), Signature=([0-9a-f]{64})",
            authorization,
        )
        if not m:
            return f"unparseable Authorization: {authorization!r}"
        access_key, datestamp, region, service, signed, signature = m.groups()
        if access_key != self.access_key:
            return f"unknown access key {access_key!r}"
        # pin the service AND region strings: deriving the key from the
        # client-declared scope would let a wrong SERVICE constant or a
        # mis-plumbed region in the production module self-verify (real
        # Kinesis rejects a wrong scope with SignatureDoesNotMatch)
        if service != "kinesis":
            return f"wrong credential-scope service {service!r}"
        if region != self.region:
            return f"wrong credential-scope region {region!r}"
        signed_list = signed.split(";")
        canonical_headers = "".join(
            f"{h}:{(headers.get(h) or '').strip()}\n" for h in signed_list
        )
        canonical_request = "\n".join(
            [
                "POST",
                "/",
                "",
                canonical_headers,
                signed,
                hashlib.sha256(body).hexdigest(),
            ]
        )
        scope = f"{datestamp}/{region}/{service}/aws4_request"
        string_to_sign = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                headers.get("X-Amz-Date", ""),
                scope,
                hashlib.sha256(canonical_request.encode()).hexdigest(),
            ]
        )
        expect = hmac_mod.new(
            derive(self.secret_key, datestamp, region, service),
            string_to_sign.encode(),
            hashlib.sha256,
        ).hexdigest()
        if expect != signature:
            return f"signature mismatch for SignedHeaders={signed}"
        return None

    def __enter__(self) -> "FakeKinesisHTTP":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
