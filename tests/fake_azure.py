"""In-process Azure Blob test server (the Azurite stand-in).

Implements the slice of the Blob REST API the engine's :mod:`azureio`
client speaks: GET Blob (with Range) / Put Blob / Get Blob Properties
(HEAD) / Delete Blob, List Blobs with marker pagination, and the
Put Block / Put Block List pair. Every request's **SharedKey signature
is verified by recomputation** against the configured account key —
a wrong canonicalized-headers block, Content-Length line, or
canonicalized resource in the client fails the whole suite, the same
discipline :mod:`fake_s3` applies to SigV4.

Endpoint is Azurite path-style: ``http://127.0.0.1:<port>/<account>``.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlparse
from xml.sax.saxutils import escape

from pangeo_forge_recipes_spark.azureio import shared_key_signature

ACCOUNT = "testaccount"
# any base64 string works as a SharedKey account key
ACCOUNT_KEY = "dGVzdC1henVyZS1hY2NvdW50LWtleS1iYXNlNjQ="

_LIST_PAGE_CAP = 5000


class FakeAzure:
    """Threaded fake Blob endpoint. Usage::

        az = FakeAzure()
        url = "az://mycontainer/some/prefix"   # any container works
        ...client/env points at az.endpoint (includes /account)...
        az.stop()
    """

    def __init__(self, verify_signatures: bool = True):
        self.objects: dict = {}  # (container, key) -> bytes
        self.blocks: dict = {}  # (container, key, block_id) -> bytes
        self.lock = threading.Lock()
        self.requests: list = []  # (method, container, key, query) log
        self.fail_queue: list = []  # statuses consumed FIFO (retry tests)
        srv = self
        verify = verify_signatures

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"
            disable_nagle_algorithm = True

            def log_message(self, *a):
                pass

            def _xml(self, status: int, body: str):
                payload = body.encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/xml")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _err(self, status: int, code: str, msg: str = ""):
                self._xml(
                    status,
                    '<?xml version="1.0" encoding="utf-8"?>'
                    f"<Error><Code>{code}</Code><Message>{escape(msg) or code}"
                    "</Message></Error>",
                )

            def _parse(self):
                parsed = urlparse(self.path)
                parts = unquote(parsed.path).lstrip("/").split("/", 2)
                # path-style: /account/container[/key]
                account = parts[0] if parts else ""
                container = parts[1] if len(parts) > 1 else ""
                key = parts[2] if len(parts) > 2 else ""
                query = dict(parse_qsl(parsed.query, keep_blank_values=True))
                return account, container, key, query, parsed

            def _check_sas(self, account, container, key, query) -> bool:
                """Verify a service SAS by recomputing its signature
                (the sv=2020-12-06+ string-to-sign) and enforcing the
                sp permission letters per method."""
                import base64 as _b64
                import hashlib as _hashlib
                import hmac as _hmac

                sr = query.get("sr", "b")
                canonical = f"/blob/{ACCOUNT}/{container}"
                if sr == "b" and key:
                    canonical += f"/{key}"
                sts = "\n".join(
                    [
                        query.get("sp", ""),
                        query.get("st", ""),
                        query.get("se", ""),
                        canonical,
                        "",
                        "",
                        query.get("spr", ""),
                        query.get("sv", ""),
                        sr,
                        "",
                        "",
                        "",
                        "",
                        "",
                        "",
                        "",
                    ]
                )
                want = _b64.b64encode(
                    _hmac.new(
                        _b64.b64decode(ACCOUNT_KEY),
                        sts.encode(),
                        _hashlib.sha256,
                    ).digest()
                ).decode()
                if query.get("sig") != want:
                    self._err(403, "AuthenticationFailed", "bad SAS signature")
                    return False
                perms = query.get("sp", "")
                # list REQUIRES 'l' (real Azure does not accept a
                # read-only SAS for List Blobs); create-or-write
                # satisfies PUT (any-of)
                need = {
                    "GET": "l" if query.get("comp") == "list" else "r",
                    "HEAD": "r",
                    "PUT": "wc",
                    "DELETE": "d",
                }[self.command]
                if not any(p in perms for p in need):
                    self._err(
                        403, "AuthorizationPermissionMismatch", need
                    )
                    return False
                return True

            def _check_sig(self, account, query, parsed) -> bool:
                if not verify:
                    return True
                auth = self.headers.get("Authorization", "")
                if not auth.startswith("SharedKey "):
                    if "sig" in query:  # SAS auth rides the query string
                        _, container, key, _, _ = self._parse()
                        return self._check_sas(account, container, key, query)
                    self._err(403, "AuthenticationFailed", "no SharedKey auth")
                    return False
                acct, _, got = auth[len("SharedKey ") :].partition(":")
                if acct != ACCOUNT or account != ACCOUNT:
                    self._err(403, "AuthenticationFailed", "wrong account")
                    return False
                headers = {k.lower(): v for k, v in self.headers.items()}
                cl = int(headers.get("content-length") or 0)
                want = shared_key_signature(
                    ACCOUNT,
                    ACCOUNT_KEY,
                    self.command,
                    parsed.path,
                    query,
                    headers,
                    cl,
                )
                if got != want:
                    self._err(
                        403, "AuthenticationFailed", "signature mismatch"
                    )
                    return False
                return True

            def _enter(self, account, container, key, query, parsed) -> bool:
                with srv.lock:
                    srv.requests.append(
                        (self.command, container, key, dict(query))
                    )
                    if srv.fail_queue:
                        status = srv.fail_queue.pop(0)
                        self._err(status, "ServerBusy", "injected")
                        return False
                return self._check_sig(account, query, parsed)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n) if n else b""

            # -- methods ---------------------------------------------------
            def do_PUT(self):
                account, container, key, query, parsed = self._parse()
                body = self._body()  # read before any response
                if not self._enter(account, container, key, query, parsed):
                    return
                if query.get("comp") == "block":
                    with srv.lock:
                        srv.blocks[(container, key, query["blockid"])] = body
                elif query.get("comp") == "blocklist":
                    import xml.etree.ElementTree as ET

                    root = ET.fromstring(body)
                    data = b""
                    missing = None
                    with srv.lock:
                        for el in root:
                            blk = srv.blocks.get((container, key, el.text))
                            if blk is None:
                                missing = el.text
                                break
                            data += blk
                        if missing is None:
                            srv.objects[(container, key)] = data
                            # committed blocks leave the uncommitted set
                            for el in root:
                                srv.blocks.pop((container, key, el.text), None)
                    if missing is not None:
                        self._err(400, "InvalidBlockList", missing or "")
                        return
                else:
                    if self.headers.get("x-ms-blob-type") != "BlockBlob":
                        self._err(400, "MissingRequiredHeader", "x-ms-blob-type")
                        return
                    with srv.lock:
                        srv.objects[(container, key)] = body
                self.send_response(201)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self):
                account, container, key, query, parsed = self._parse()
                if not self._enter(account, container, key, query, parsed):
                    return
                if query.get("comp") == "list":
                    return self._list(container, query)
                with srv.lock:
                    data = srv.objects.get((container, key))
                if data is None:
                    self._err(404, "BlobNotFound", key)
                    return
                rng = self.headers.get("Range") or self.headers.get(
                    "x-ms-range"
                )
                status = 200
                if rng and rng.startswith("bytes="):
                    lo, _, hi = rng[len("bytes=") :].partition("-")
                    total = len(data)
                    if lo:
                        start = int(lo)
                        end = min(int(hi), total - 1) if hi else total - 1
                    else:  # suffix bytes=-N
                        start = max(total - int(hi), 0)
                        end = total - 1
                    data = data[start : end + 1]
                    status = 206
                    self.send_response(status)
                    self.send_header(
                        "Content-Range", f"bytes {start}-{end}/{total}"
                    )
                else:
                    self.send_response(status)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _list(self, container, query):
                prefix = query.get("prefix", "")
                marker = query.get("marker", "")
                maxr = min(
                    int(query.get("maxresults") or _LIST_PAGE_CAP),
                    _LIST_PAGE_CAP,
                )
                with srv.lock:
                    keys = sorted(
                        k
                        for (c, k) in srv.objects
                        if c == container and k.startswith(prefix)
                    )
                if marker:
                    keys = [k for k in keys if k > marker]
                page, rest = keys[:maxr], keys[maxr:]
                blobs = "".join(
                    f"<Blob><Name>{escape(k)}</Name><Properties>"
                    f"<Content-Length>{len(srv.objects[(container, k)])}"
                    "</Content-Length></Properties></Blob>"
                    for k in page
                )
                nxt = f"<NextMarker>{escape(page[-1])}</NextMarker>" if rest else ""
                self._xml(
                    200,
                    '<?xml version="1.0" encoding="utf-8"?>'
                    f'<EnumerationResults ContainerName="{container}">'
                    f"<Blobs>{blobs}</Blobs>{nxt}</EnumerationResults>",
                )

            def do_HEAD(self):
                account, container, key, query, parsed = self._parse()
                if not self._enter(account, container, key, query, parsed):
                    return
                with srv.lock:
                    data = srv.objects.get((container, key))
                if data is None:
                    # HEAD may not carry a body — bare 404
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()

            def do_DELETE(self):
                account, container, key, query, parsed = self._parse()
                if not self._enter(account, container, key, query, parsed):
                    return
                with srv.lock:
                    existed = srv.objects.pop((container, key), None) is not None
                self.send_response(202 if existed else 404)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.endpoint = f"http://127.0.0.1:{self.port}/{ACCOUNT}"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def client_kwargs(self) -> dict:
        """Kwargs for AzureClient/AzureStore pointing at this endpoint."""
        return {
            "account_name": ACCOUNT,
            "account_key": ACCOUNT_KEY,
            "endpoint_url": self.endpoint,
        }

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
