"""Native Google Cloud Storage backend: OAuth2 service-account auth.

The reference reaches GCS through gcsfs under fsspec (reference
``storage.py:16,85-86``); this engine speaks the two public Google APIs
directly, with zero dependencies beyond the stdlib:

- **Token exchange** (public spec: Google's "OAuth 2.0 for Server to
  Server Applications"): a service-account JSON key signs an RS256 JWT
  assertion (``iss``/``scope``/``aud``/``iat``/``exp``) which POSTs to
  the key's ``token_uri`` with
  ``grant_type=urn:ietf:params:oauth:grant-type:jwt-bearer`` and
  returns a short-lived Bearer access token. The RSA-PKCS#1-v1.5
  signature and the PKCS#8/PKCS#1 PEM key parsing are implemented here
  in pure Python (RFC 8017 EMSA-PKCS1-v1_5 + CRT exponentiation); the
  test suite pins the signer against the OpenSSL CLI in both
  directions.
- **Data plane**: the GCS XML API, which is wire-compatible with the
  S3 dialect this engine already speaks (path-style
  ``https://storage.googleapis.com/bucket/key``, ListObjects,
  S3-compatible multipart uploads) — so :class:`GCSClient` subclasses
  :class:`~.s3io.S3Client` overriding ONLY the auth hook
  (``_auth_headers``: Bearer token instead of SigV4), and
  :class:`GCSStore` inherits every byte-level method from
  :class:`~.s3io.S3Store`. Everything downstream — S3WriteBuffer,
  ``put_parts``, the input cache, shard writers — drives GCS through
  the same client contract unchanged.

This removes the HMAC-interoperability-keys requirement (``s3io``'s
``service="gs"`` mode, which many orgs disable): any standard
service-account JSON key — the ``GOOGLE_APPLICATION_CREDENTIALS``
convention every Google SDK uses — now reaches ``gs://`` natively.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import threading
import time
from typing import Dict, Optional, Tuple
from urllib.parse import urlencode, urlparse

from .s3io import S3Client, S3Error, S3Store, _pooled_send, parse_s3_url

__all__ = [
    "GCSConfig",
    "GCSClient",
    "GCSStore",
    "configure_spark_gcs",
    "parse_rsa_private_key_pem",
    "rs256_sign",
    "rs256_verify",
    "build_sa_assertion",
    "GCSAuthError",
    "generate_signed_url",
    "SCOPE_READ_WRITE",
    "SCOPE_READ_ONLY",
]

SCOPE_READ_WRITE = "https://www.googleapis.com/auth/devstorage.read_write"
SCOPE_READ_ONLY = "https://www.googleapis.com/auth/devstorage.read_only"
_DEFAULT_TOKEN_URI = "https://oauth2.googleapis.com/token"
_DEFAULT_ENDPOINT = "https://storage.googleapis.com"
_JWT_GRANT = "urn:ietf:params:oauth:grant-type:jwt-bearer"


class GCSAuthError(OSError):
    """Token exchange failed (bad key, clock skew, endpoint error)."""


# ===========================================================================
# RSA: PEM/DER key parsing + RS256 (public specs: RFC 5208 PKCS#8,
# RFC 8017 PKCS#1 v2.2 — RSAPrivateKey ASN.1 and EMSA-PKCS1-v1_5)
# ===========================================================================


def _der_read(buf: bytes, off: int) -> Tuple[int, bytes, int]:
    """One DER TLV: returns (tag, value, next_offset)."""
    if off + 2 > len(buf):
        raise ValueError("truncated DER")
    tag = buf[off]
    length = buf[off + 1]
    off += 2
    if length & 0x80:
        n = length & 0x7F
        if n == 0 or off + n > len(buf):
            raise ValueError("bad DER length")
        length = int.from_bytes(buf[off : off + n], "big")
        off += n
    if off + length > len(buf):
        raise ValueError("truncated DER value")
    return tag, buf[off : off + length], off + length


def _der_ints(body: bytes, count: int) -> list:
    """Read `count` DER INTEGERs from a SEQUENCE body."""
    out, off = [], 0
    for _ in range(count):
        tag, val, off = _der_read(body, off)
        if tag != 0x02:
            raise ValueError(f"expected DER INTEGER, got tag 0x{tag:02x}")
        out.append(int.from_bytes(val, "big"))
    return out


def parse_rsa_private_key_pem(pem: str) -> Dict[str, int]:
    """Parse a PEM RSA private key — PKCS#8 (``BEGIN PRIVATE KEY``, the
    form service-account JSON carries) or PKCS#1 (``BEGIN RSA PRIVATE
    KEY``) — into its integers ``n e d p q dp dq qinv``."""
    b64 = "".join(
        line.strip()
        for line in pem.strip().splitlines()
        if line.strip() and not line.startswith("-----")
    )
    der = base64.b64decode(b64)
    tag, outer, _ = _der_read(der, 0)
    if tag != 0x30:
        raise ValueError("PEM body is not a DER SEQUENCE")
    # first element: INTEGER version in both encodings
    t1, v1, off = _der_read(outer, 0)
    if t1 != 0x02:
        raise ValueError("expected version INTEGER")
    t2, v2, off2 = _der_read(outer, off)
    if t2 == 0x30:
        # PKCS#8 PrivateKeyInfo: version, AlgorithmIdentifier, OCTET
        # STRING wrapping the PKCS#1 RSAPrivateKey
        t3, v3, _ = _der_read(outer, off2)
        if t3 != 0x04:
            raise ValueError("PKCS#8 missing privateKey OCTET STRING")
        t4, inner, _ = _der_read(v3, 0)
        if t4 != 0x30:
            raise ValueError("PKCS#8 payload is not RSAPrivateKey")
        body = inner
        # skip the inner version INTEGER
        _, _, boff = _der_read(body, 0)
        ints = _der_ints(body[boff:], 8)
    else:
        # PKCS#1 RSAPrivateKey directly: version already consumed
        ints = _der_ints(outer[off:], 8)
    n, e, d, p, q, dp, dq, qinv = ints
    return {
        "n": n, "e": e, "d": d, "p": p, "q": q,
        "dp": dp, "dq": dq, "qinv": qinv,
    }


# SHA-256 DigestInfo prefix (RFC 8017 §9.2 note 1)
_SHA256_DIGESTINFO = bytes.fromhex(
    "3031300d060960864801650304020105000420"
)


def _emsa_pkcs1_v15_int(digest: bytes, k: int) -> int:
    t = _SHA256_DIGESTINFO + digest
    if k < len(t) + 11:
        raise ValueError("RSA modulus too small for SHA-256 signature")
    em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    return int.from_bytes(em, "big")


def rs256_sign(message: bytes, key: Dict[str, int]) -> bytes:
    """RSASSA-PKCS1-v1_5 with SHA-256 over ``message`` (the JWT ``alg:
    RS256``). CRT exponentiation when the factors are present."""
    k = (key["n"].bit_length() + 7) // 8
    m = _emsa_pkcs1_v15_int(hashlib.sha256(message).digest(), k)
    if key.get("p") and key.get("q"):
        m1 = pow(m, key["dp"], key["p"])
        m2 = pow(m, key["dq"], key["q"])
        h = ((m1 - m2) * key["qinv"]) % key["p"]
        s = m2 + h * key["q"]
    else:
        s = pow(m, key["d"], key["n"])
    return s.to_bytes(k, "big")


def rs256_verify(message: bytes, signature: bytes, n: int, e: int) -> bool:
    """Verify an RS256 signature against a public key ``(n, e)``."""
    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    return pow(int.from_bytes(signature, "big"), e, n) == _emsa_pkcs1_v15_int(
        hashlib.sha256(message).digest(), k
    )


# ===========================================================================
# JWT assertion + token exchange
# ===========================================================================


def _b64url(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def build_sa_assertion(
    client_email: str,
    key: Dict[str, int],
    token_uri: str,
    scope: str,
    iat: Optional[int] = None,
    lifetime: int = 3600,
) -> str:
    """The signed JWT a service account exchanges for an access token
    (header ``{"alg":"RS256","typ":"JWT"}``; claims iss/scope/aud/iat/
    exp per the public server-to-server OAuth spec)."""
    iat = int(time.time()) if iat is None else int(iat)
    header = {"alg": "RS256", "typ": "JWT"}
    claims = {
        "iss": client_email,
        "scope": scope,
        "aud": token_uri,
        "iat": iat,
        "exp": iat + int(lifetime),
    }
    signing = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    )
    return signing + "." + _b64url(rs256_sign(signing.encode("ascii"), key))


# process-wide token cache: (token_uri, client_email, scope) ->
# (access_token, absolute_expiry). Shared across clients/threads so a
# Spark stage's N tasks do one exchange, not N — a per-key in-flight
# lock makes the cold start exactly one exchange even when all N
# worker threads miss the cache simultaneously.
_TOKEN_CACHE: Dict[Tuple[str, str, str], Tuple[str, float]] = {}
_TOKEN_LOCK = threading.Lock()
_TOKEN_INFLIGHT: Dict[Tuple[str, str, str], threading.Lock] = {}
_EXPIRY_SLACK_S = 60.0


def _exchange_token(cfg: "GCSConfig") -> Tuple[str, float]:
    assertion = build_sa_assertion(
        cfg.client_email, cfg.key, cfg.token_uri, cfg.scope
    )
    body = urlencode({"grant_type": _JWT_GRANT, "assertion": assertion}).encode()
    ep = urlparse(cfg.token_uri)
    headers = {
        "content-type": "application/x-www-form-urlencoded",
        "content-length": str(len(body)),
    }
    last: Optional[str] = None
    for attempt in range(3):
        if attempt:
            time.sleep(0.5 * (2.0 ** (attempt - 1)))
        try:
            resp = _pooled_send(
                ep.scheme or "https", ep.netloc, "POST", ep.path or "/", body, headers
            )
        except (ConnectionError, TimeoutError, OSError) as exc:
            last = str(exc)
            continue
        with resp:
            payload = resp.read()
        if resp.status >= 500:
            last = f"HTTP {resp.status}: {payload[:200]!r}"
            continue
        if resp.status >= 400:
            raise GCSAuthError(
                f"token exchange rejected ({resp.status}) at {cfg.token_uri}: "
                f"{payload[:300]!r}"
            )
        data = json.loads(payload)
        tok = data.get("access_token")
        if not tok:
            raise GCSAuthError(f"token response carries no access_token: {data}")
        return tok, time.time() + float(data.get("expires_in", 3600))
    raise GCSAuthError(f"token endpoint unreachable: {last}")


def _get_token(cfg: "GCSConfig") -> str:
    cache_key = (cfg.token_uri, cfg.client_email, cfg.scope)
    with _TOKEN_LOCK:
        hit = _TOKEN_CACHE.get(cache_key)
        if hit and hit[1] - _EXPIRY_SLACK_S > time.time():
            return hit[0]
        gate = _TOKEN_INFLIGHT.setdefault(cache_key, threading.Lock())
    with gate:  # one exchange per key; followers re-read the cache
        with _TOKEN_LOCK:
            hit = _TOKEN_CACHE.get(cache_key)
            if hit and hit[1] - _EXPIRY_SLACK_S > time.time():
                return hit[0]
        tok, exp = _exchange_token(cfg)
        with _TOKEN_LOCK:
            _TOKEN_CACHE[cache_key] = (tok, exp)
        return tok


def _invalidate_token(cfg: "GCSConfig", rejected: Optional[str] = None) -> None:
    """Drop the cached token the server rejected (revoked key,
    server-side expiry ahead of the local clock). Keyed to the
    REJECTED token when given: a sibling thread may already have
    refreshed the cache, and evicting its fresh token would turn one
    revocation into N serialized re-exchanges."""
    key = (cfg.token_uri, cfg.client_email, cfg.scope)
    with _TOKEN_LOCK:
        hit = _TOKEN_CACHE.get(key)
        if hit and (rejected is None or hit[0] == rejected):
            _TOKEN_CACHE.pop(key, None)


# ===========================================================================
# config / client / store
# ===========================================================================


class GCSConfig:
    """Service-account credential + endpoint resolution. Explicit
    kwargs win; otherwise the key file comes from the standard
    ``GOOGLE_APPLICATION_CREDENTIALS`` environment variable (the
    convention every public Google SDK reads). ``GS_ENDPOINT_URL``
    overrides the data endpoint for tests/gateways; the token endpoint
    comes from the key's own ``token_uri`` field."""

    def __init__(
        self,
        credentials_file: Optional[str] = None,
        credentials_json=None,
        endpoint_url: Optional[str] = None,
        scope: Optional[str] = None,
        token_uri: Optional[str] = None,
    ):
        env = os.environ
        if credentials_json is None and credentials_file is not None:
            # an EXPLICIT kwarg never falls through to ambient env
            # values — adopting a leftover env key here would silently
            # authenticate as the wrong service account
            if not os.path.exists(credentials_file):
                raise ValueError(
                    f"credentials_file {credentials_file!r} does not exist"
                )
            with open(credentials_file) as f:
                credentials_json = f.read()
        if credentials_json is None:
            path = env.get("GOOGLE_APPLICATION_CREDENTIALS")
            if path and os.path.exists(path):
                with open(path) as f:
                    credentials_json = f.read()
            elif env.get("GOOGLE_APPLICATION_CREDENTIALS_JSON"):
                # by-VALUE fallback: configure_spark_gcs ships the key
                # material itself through sc.environment (the Azure
                # connection-string pattern), so executors on nodes
                # without the key FILE still resolve — the file path
                # convention wins when the file exists
                credentials_json = env["GOOGLE_APPLICATION_CREDENTIALS_JSON"]
            elif path:
                raise ValueError(
                    f"GOOGLE_APPLICATION_CREDENTIALS points at {path!r} "
                    "which does not exist on this node (and no "
                    "GOOGLE_APPLICATION_CREDENTIALS_JSON value is set)"
                )
            else:
                raise ValueError(
                    "GCS service-account credentials missing: set "
                    "GOOGLE_APPLICATION_CREDENTIALS to a key-file path or "
                    "pass credentials_file/credentials_json explicitly"
                )
        info = (
            json.loads(credentials_json)
            if isinstance(credentials_json, (str, bytes))
            else dict(credentials_json)
        )
        try:
            self.client_email = info["client_email"]
            pem = info["private_key"]
        except KeyError as exc:
            raise ValueError(
                f"service-account JSON missing required field {exc}"
            ) from None
        self.key = parse_rsa_private_key_pem(pem)
        self._info = info
        self.token_uri = token_uri or info.get("token_uri") or _DEFAULT_TOKEN_URI
        self.scope = scope or SCOPE_READ_WRITE
        self.endpoint_url = (
            endpoint_url or env.get("GS_ENDPOINT_URL") or _DEFAULT_ENDPOINT
        )
        # attributes the shared S3Client plumbing reads
        self.path_style = True  # the XML API's canonical addressing
        self.region = "auto"
        self.session_token = None
        self.service = "gs-oauth"

    def to_kwargs(self) -> dict:
        """Plain-dict form that survives a pickle into Spark tasks."""
        return {
            "credentials_json": dict(self._info),
            "endpoint_url": self.endpoint_url,
            "scope": self.scope,
            "token_uri": self.token_uri,
        }


class GCSClient(S3Client):
    """GCS XML-API client: the S3 wire dialect with OAuth2 Bearer auth.
    Only the auth hook differs from :class:`~.s3io.S3Client` — every
    verb (GET/PUT/HEAD/DELETE, ListObjects pagination, S3-compatible
    multipart) rides the shared implementation."""

    def __init__(self, config: Optional[GCSConfig] = None, **kwargs):
        self.config = config or GCSConfig(**kwargs)
        # which token THIS thread's in-flight request carries — the 401
        # handler must evict exactly that one, never a sibling's fresh
        # refresh
        self._tls = threading.local()

    def _auth_headers(
        self,
        method: str,
        uri: str,
        query: Dict[str, str],
        extra_headers: Dict[str, str],
        payload_hash: str,
        host: str,
    ) -> Dict[str, str]:
        # Bearer tokens sign nothing request-specific, so no canonical
        # request is built; expiry refreshes through the process cache
        tok = _get_token(self.config)
        self._tls.last_token = tok
        headers = {"host": host, "authorization": f"Bearer {tok}"}
        if extra_headers:
            headers.update({k.lower(): v for k, v in extra_headers.items()})
        return headers

    def _request(self, *args, **kwargs):
        try:
            return super()._request(*args, **kwargs)
        except S3Error as e:
            if e.status != 401:
                raise
            # the endpoint rejected a token the local cache still
            # considered live (revoked key, server-side expiry ahead of
            # the driver clock): drop THAT token and retry once with a
            # fresh exchange — 401 is not in the transport's retry
            # statuses, so without this a long job fails every
            # remaining task; keying eviction to the rejected token
            # keeps a sibling thread's fresh refresh in the cache
            _invalidate_token(
                self.config, getattr(self._tls, "last_token", None)
            )
            return super()._request(*args, **kwargs)


class GCSStore(S3Store):
    """:class:`~.zarrio.Store` over a ``gs://bucket/prefix`` root with
    native OAuth2 auth. Inherits every byte-level method from
    :class:`~.s3io.S3Store` (same write invariants: disjoint keys per
    region-aligned task, idempotent full-object PUTs)."""

    def __init__(self, root_url: str, client: Optional[GCSClient] = None, **kwargs):
        self.root_url = root_url.rstrip("/")
        self.bucket, prefix = parse_s3_url(self.root_url)
        self.prefix = prefix.rstrip("/")
        self._client = client or GCSClient(**kwargs)
        self._client_kwargs = self._client.config.to_kwargs()

    @property
    def client(self) -> GCSClient:
        if self._client is None:
            self._client = GCSClient(**(self._client_kwargs or {}))
        return self._client


def oauth_credentials_available(open_kwargs: Optional[dict] = None) -> bool:
    """Should ``gs://`` dispatch to the native OAuth client? Precedence
    is specific-over-ambient: explicit kwargs win outright (HMAC
    ``access_key``/``secret_key`` -> interop; ``credentials_file``/
    ``credentials_json`` -> OAuth); then the storage-SPECIFIC
    ``GS_ACCESS_KEY_ID``/``GS_SECRET_ACCESS_KEY`` pair keeps the interop
    path (a working r10 setup must not break because an unrelated
    gcloud/BigQuery ``GOOGLE_APPLICATION_CREDENTIALS`` is ambient);
    only then does the generic key-file variable select OAuth."""
    kw = open_kwargs or {}
    if kw.get("access_key") or kw.get("secret_key"):
        return False
    if kw.get("credentials_file") or kw.get("credentials_json"):
        return True
    env = os.environ
    if env.get("GS_ACCESS_KEY_ID") and env.get("GS_SECRET_ACCESS_KEY"):
        return False
    return bool(
        env.get("GOOGLE_APPLICATION_CREDENTIALS")
        or env.get("GOOGLE_APPLICATION_CREDENTIALS_JSON")
    )


def configure_spark_gcs(spark, config: Optional[GCSConfig] = None, **kwargs) -> None:
    """Point a SparkSession at GCS with service-account auth — the GCS
    twin of :func:`~.s3io.configure_spark_s3`. Credentials ship to the
    session's Python workers BY VALUE via ``sc.environment``
    (``GOOGLE_APPLICATION_CREDENTIALS_JSON`` carrying the key JSON —
    the same pattern Azure uses for its connection string), so
    executors on nodes WITHOUT the key file still resolve; the
    standard ``GOOGLE_APPLICATION_CREDENTIALS`` path is exported too
    for the driver and any node where the file exists (the file wins
    when present). ``GS_ENDPOINT_URL`` rides along when non-default."""
    cfg = config or GCSConfig(**kwargs)

    def _matches(path: str) -> bool:
        # reusing a path that holds a DIFFERENT key would split the
        # cluster's identity: file-bearing nodes would authenticate as
        # that other account while file-less nodes use the shipped JSON
        try:
            with open(path) as f:
                return json.load(f) == cfg._info
        except (OSError, ValueError):
            return False

    path = kwargs.get("credentials_file") or os.environ.get(
        "GOOGLE_APPLICATION_CREDENTIALS"
    )
    if not path or not _matches(path):
        # stable per-key path (sha256 of the canonical key JSON) so
        # repeated sessions reuse ONE file instead of minting a new
        # mkstemp each call (r11 advice: the old mkstemp files
        # accumulated on disk forever — now at most one 0600 file per
        # distinct key per uid). Deliberately NOT deleted at exit:
        # another live driver process using the same key resolves its
        # GOOGLE_APPLICATION_CREDENTIALS from this same digest path,
        # and the by-value JSON fallback ships only to EXECUTORS
        # (sc.environment) — deleting under that driver would break
        # its next env-resolved client (r12 review finding).
        import hashlib
        import tempfile

        blob = json.dumps(cfg._info, sort_keys=True).encode()
        digest = hashlib.sha256(blob).hexdigest()[:16]
        path = os.path.join(
            tempfile.gettempdir(), f"gcs_sa_{os.getuid()}_{digest}.json"
        )
        if not _matches(path):
            fd, tmp = tempfile.mkstemp(
                prefix=".gcs_sa_", dir=tempfile.gettempdir()
            )
            with os.fdopen(fd, "w") as f:
                f.write(blob.decode())
            os.chmod(tmp, 0o600)
            os.replace(tmp, path)  # atomic vs a concurrent writer
    driver_env = {"GOOGLE_APPLICATION_CREDENTIALS": path}
    if cfg.endpoint_url != _DEFAULT_ENDPOINT:
        driver_env["GS_ENDPOINT_URL"] = cfg.endpoint_url
    # the key MATERIAL ships only to the python workers (sc.environment)
    # — putting it in the driver's os.environ would leak the private
    # key into every subprocess the driver spawns
    os.environ.update(driver_env)
    spark.sparkContext.environment.update(
        {**driver_env, "GOOGLE_APPLICATION_CREDENTIALS_JSON": json.dumps(cfg._info)}
    )


def generate_signed_url(
    url: str,
    method: str = "GET",
    expires: int = 3600,
    config: Optional[GCSConfig] = None,
    **kwargs,
) -> str:
    """GCS **V4 signed url** (the public spec): ``X-Goog-Algorithm=
    GOOG4-RSA-SHA256``, credential scope ``{date}/auto/storage/
    goog4_request``, canonical request over the encoded path + sorted
    query + the ``host`` header with ``UNSIGNED-PAYLOAD``, and an
    RSA-SHA256 signature HEX-encoded into ``X-Goog-Signature`` — signed
    with the service-account key, verifiable by anyone holding the
    public key, usable by a plain HTTP client with no credentials. The
    S3 analog is :func:`~.s3io.generate_presigned_url`; the Azure
    analog is :func:`~.azureio.generate_service_sas`."""
    import datetime

    from .s3io import (
        _uri_encode,
        canonical_query_string,
        canonical_request_hash,
    )

    if not 0 < int(expires) <= 604800:
        raise ValueError(
            f"expires={expires}: signed urls must be 1..604800 seconds "
            "(GCS's 7-day X-Goog-Expires cap)"
        )
    cfg = config or GCSConfig(**kwargs)
    bucket, key = parse_s3_url(url)
    ep = urlparse(cfg.endpoint_url)
    host = ep.netloc
    uri = "/" + _uri_encode(f"{bucket}/{key}" if key else bucket, keep_slash=True)
    now = datetime.datetime.now(datetime.timezone.utc)
    gdate = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    scope = f"{datestamp}/auto/storage/goog4_request"
    query = {
        "X-Goog-Algorithm": "GOOG4-RSA-SHA256",
        "X-Goog-Credential": f"{cfg.client_email}/{scope}",
        "X-Goog-Date": gdate,
        "X-Goog-Expires": str(int(expires)),
        "X-Goog-SignedHeaders": "host",
    }
    _, creq_hash = canonical_request_hash(
        method, uri, query, {"host": host}, "UNSIGNED-PAYLOAD"
    )
    sts = "\n".join(["GOOG4-RSA-SHA256", gdate, scope, creq_hash])
    sig = rs256_sign(sts.encode("ascii"), cfg.key).hex()
    qs = canonical_query_string(query)
    return f"{ep.scheme or 'https'}://{host}{uri}?{qs}&X-Goog-Signature={sig}"


# re-exported for error-handling parity across backends: GCS data-plane
# failures surface as the same OSError family S3/Azure raise
GCSError = S3Error
