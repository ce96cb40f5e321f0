"""Azure Blob REST I/O for the changelog source — operator A5's live path.

The reference ingests from Azure Blob storage and its integration harness
runs against the Azurite emulator (docker-compose.yaml:35-45,
Fixtures.scala:27-73) so listing / auth / retry / paging execute over a
real HTTP blob endpoint.  ``sources/azure.py`` maps the spec's
``storageConnection`` block onto Hadoop ABFS conf keys for cluster
deployments; this module is the *driver-side metadata client* for the same
block — the analog of ``objectstore.S3StoreIO`` speaking the Azure Blob
REST dialect, implemented on the Python stdlib only (no azure-sdk in this
environment, and none needed: List Blobs / Get Blob / SharedKey signing
are a small, publicly documented HTTP surface).

Wire protocol (all public, docs.microsoft.com REST reference):

- List Blobs: ``GET {endpoint}/{container}?restype=container&comp=list&
  prefix=..&delimiter=/&maxresults=N[&marker=M]`` → XML
  ``EnumerationResults`` with ``Blob/Name``, ``BlobPrefix/Name`` (the
  delimiter-collapsed "directories") and ``NextMarker`` paging — the
  reference's ``maxResultsPerPage`` knob maps to ``maxresults``.
- Get Blob / Get Blob Properties: plain ``GET`` / ``HEAD`` with ``ETag``.
- Auth, both CRD branches (crd-microsoft-synapse.yaml:526-539):
  ``sharedKey`` — HMAC-SHA256 over the canonicalized request with the
  base64 account key (env fallback
  ``ARCANE_FRAMEWORK__AZURE_STORAGE_ACCESS_KEY`` like the reference,
  dev.env.example:11) — and ``credentialChain`` — the
  DefaultAzureCredential-style OAuth2 bearer chain
  (``TokenCredentialChain``): environment client-credentials first
  (``AZURE_TENANT_ID``/``AZURE_CLIENT_ID``/``AZURE_CLIENT_SECRET``
  against ``AZURE_AUTHORITY_HOST``), then IMDS managed identity
  (``IDENTITY_ENDPOINT``/``MSI_ENDPOINT`` override, else the well-known
  169.254.169.254 metadata endpoint) — the chain a real 100×-scale
  deployment uses instead of account keys.  All endpoint overrides are
  the PUBLIC azure-identity environment variables, which is also how the
  e2e test drives the chain against stub token endpoints.

Control plane vs data plane (same split as ``S3StoreIO``): metadata is
driver-side by design (offset planning); CSV chunk *data* belongs on the
executors via the ``abfss://`` Hadoop connector when its jars are present.
This sandbox ships no ``hadoop-azure`` jar, so ``localize()`` spools the
immutable batch chunks to an ETag-validated local cache — the documented
jar-less fallback, not the 100 TB production path.

Tested end-to-end against a local HTTP emulator of this surface
(tests/test_azureblob.py) that *verifies* the SharedKey signature —
the Azurite-analog the round-4 brief asked for.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import tempfile
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from email.utils import formatdate

from .azure import ACCESS_KEY_ENV

_AZURE_RE = re.compile(r"^(wasbs?|abfss?)://", re.IGNORECASE)
API_VERSION = "2021-08-06"


def is_azure_path(path: str) -> bool:
    return bool(_AZURE_RE.match(path))


def parse_azure_url(path: str) -> tuple[str, str, str]:
    """``abfss://container@account.dfs.core.windows.net/p`` →
    ``(account, container, p)``.  Accepts wasb/wasbs/abfs/abfss and a bare
    ``scheme://container/p`` (account then comes from the connection)."""
    u = urllib.parse.urlparse(path)
    if "@" in u.netloc:
        container, host = u.netloc.split("@", 1)
        account = host.split(".", 1)[0]
    else:
        container, account = u.netloc, ""
    return account, container, u.path.lstrip("/")


class TokenCredentialChain:
    """``DefaultAzureCredential``-shaped token chain on the Python stdlib
    (no azure-identity in this environment, and none needed — both
    providers are small, publicly documented HTTP surfaces):

    1. **Environment client credentials** (tried first, like the SDK):
       OAuth2 ``client_credentials`` grant against
       ``{AZURE_AUTHORITY_HOST}/{AZURE_TENANT_ID}/oauth2/v2.0/token``
       with scope ``https://storage.azure.com/.default`` when
       ``AZURE_TENANT_ID``/``AZURE_CLIENT_ID``/``AZURE_CLIENT_SECRET``
       are all present.
    2. **IMDS managed identity**: ``GET {endpoint}?api-version=
       2018-02-01&resource=https://storage.azure.com/`` with the
       ``Metadata: true`` header; the endpoint comes from
       ``IDENTITY_ENDPOINT``/``MSI_ENDPOINT`` (App Service convention)
       or defaults to the well-known ``169.254.169.254`` address.

    Tokens are cached and refreshed 5 minutes before expiry — at a 15 s
    changelog-poll cadence that is one token round-trip per ~55 minutes,
    not per request.  ``invalidate()`` drops the cache so the I/O layer
    can force a refresh after a 401 (token revoked/rotated mid-stream).
    """

    SCOPE = "https://storage.azure.com/.default"
    RESOURCE = "https://storage.azure.com/"
    REFRESH_SKEW_S = 300.0

    def __init__(self, env: dict[str, str] | None = None):
        self._env = env if env is not None else dict(os.environ)
        self._token: str | None = None
        self._expires_at = 0.0
        # MultiEntityRunner drives blob IO from a thread pool: without the
        # lock, concurrent refreshes stampede the token endpoint, and an
        # invalidate() between the _acquire() assignment and the return
        # could hand back None ("Authorization: Bearer None").
        self._lock = threading.Lock()

    def token(self) -> str:
        with self._lock:
            if self._token and time.time() < self._expires_at - self.REFRESH_SKEW_S:
                return self._token
            tok, exp = self._acquire()
            self._token, self._expires_at = tok, exp
            return tok

    def invalidate(self) -> None:
        with self._lock:
            self._token, self._expires_at = None, 0.0

    def _acquire(self) -> tuple[str, float]:
        import json as _json

        errors: list[str] = []
        e = self._env
        if e.get("AZURE_TENANT_ID") and e.get("AZURE_CLIENT_ID") and e.get(
            "AZURE_CLIENT_SECRET"
        ):
            authority = e.get(
                "AZURE_AUTHORITY_HOST", "https://login.microsoftonline.com"
            ).rstrip("/")
            url = f"{authority}/{e['AZURE_TENANT_ID']}/oauth2/v2.0/token"
            body = urllib.parse.urlencode(
                {
                    "grant_type": "client_credentials",
                    "client_id": e["AZURE_CLIENT_ID"],
                    "client_secret": e["AZURE_CLIENT_SECRET"],
                    "scope": self.SCOPE,
                }
            ).encode()
            req = urllib.request.Request(
                url,
                data=body,
                method="POST",
                headers={"Content-Type": "application/x-www-form-urlencoded"},
            )
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    payload = _json.loads(resp.read())
                return (
                    payload["access_token"],
                    time.time() + float(payload.get("expires_in", 3600)),
                )
            except Exception as exc:  # noqa: BLE001 — fall through the chain
                errors.append(f"environment: {type(exc).__name__}: {exc}")
        imds = (
            self._env.get("IDENTITY_ENDPOINT")
            or self._env.get("MSI_ENDPOINT")
            or "http://169.254.169.254/metadata/identity/oauth2/token"
        )
        q = urllib.parse.urlencode(
            {"api-version": "2018-02-01", "resource": self.RESOURCE}
        )
        req = urllib.request.Request(f"{imds}?{q}", headers={"Metadata": "true"})
        try:
            with urllib.request.urlopen(req, timeout=5) as resp:
                payload = _json.loads(resp.read())
            return (
                payload["access_token"],
                time.time() + float(payload.get("expires_in") or 3600),
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(f"imds: {type(exc).__name__}: {exc}")
        raise RuntimeError(
            "credentialChain: no provider yielded a token — " + "; ".join(errors)
        )


def azure_blob_connection(
    spec: dict, env: dict[str, str] | None = None, source_root: str | None = None
) -> dict:
    """Reference ``storageConnection`` block → ``AzureBlobStoreIO`` kwargs.

    The same block ``azure_hadoop_conf`` (sources/azure.py) maps onto
    ``fs.azure.*`` keys for the cluster data plane; this maps it onto the
    driver-side metadata client (stream-spec-yaml-example.yaml:84-96:
    accountName/endpoint, httpClient retry/paging knobs, sharedKey with
    env-var key fallback).  When the block omits ``accountName`` but the
    stream's ``source_root`` is a fully-qualified
    ``abfss://container@account.dfs...`` URL, the account comes from the
    URL (the reference accepts such specs; without this fallback the
    client constructor raised TypeError)."""
    env = env if env is not None else dict(os.environ)
    out: dict = {}
    if spec.get("accountName"):
        out["account"] = str(spec["accountName"])
    elif source_root and is_azure_path(source_root):
        account, _, _ = parse_azure_url(source_root)
        if account:
            out["account"] = account
    if spec.get("endpoint"):
        out["endpoint_url"] = str(spec["endpoint"]).rstrip("/")
    cred = spec.get("credentialType", {}) or {}
    if "sharedKey" in cred:
        key = (cred.get("sharedKey") or {}).get("accessKey") or env.get(ACCESS_KEY_ENV)
        if key:
            out["account_key"] = key
    elif "credentialChain" in cred:
        # CRD branch 2 (crd-microsoft-synapse.yaml:535-539): default
        # credential chain — bearer auth via TokenCredentialChain; the
        # chain reads its provider config from the process environment
        # (the azure-identity convention), overridable here for tests
        out["credential"] = TokenCredentialChain(env=env)
    http = spec.get("httpClient", {}) or {}
    if "httpMaxRetries" in http:
        out["max_retries"] = int(http["httpMaxRetries"])
    if "maxResultsPerPage" in http:
        out["page_size"] = int(http["maxResultsPerPage"])
    return out


class AzureBlobStoreIO:
    """Driver-side metadata I/O (+ jar-less data localization) over the
    Azure Blob REST API — the ``read_text / listdir / isdir / exists``
    interface of ``sources/synapse.py`` for ``wasb``/``abfss`` paths.

    ``endpoint_url`` overrides the public ``https://{account}.blob.core.
    windows.net`` endpoint with an emulator-style ``http://host:port/
    {account}`` base (the Azurite convention), which is how the e2e test
    drives it without a live Azure subscription."""

    def __init__(
        self,
        *,
        account: str,
        account_key: str | None = None,
        credential: TokenCredentialChain | None = None,
        endpoint_url: str | None = None,
        max_retries: int = 3,
        page_size: int = 5000,
        spool_dir: str | None = None,
    ):
        self.account = account
        self._key = base64.b64decode(account_key) if account_key else None
        self._credential = credential if self._key is None else None
        self._base = endpoint_url or f"https://{account}.blob.core.windows.net"
        self.max_retries = int(max_retries)
        self.page_size = int(page_size)
        self._spool = spool_dir or tempfile.mkdtemp(prefix="synapse-az-spool-")
        self._etags: dict[str, str] = {}

    # ---- SharedKey signing (public scheme, Storage services auth docs) ----
    def _sign(self, verb: str, container: str, blob: str, query: dict, headers: dict):
        if self._key is None:
            if self._credential is not None:
                headers["Authorization"] = f"Bearer {self._credential.token()}"
            return
        # canonicalized x-ms-* headers: lowercase, sorted, "k:v\n"
        canon_headers = "".join(
            f"{k.lower()}:{headers[k]}\n"
            for k in sorted(headers, key=str.lower)
            if k.lower().startswith("x-ms-")
        )
        # canonicalized resource: /account/container[/blob] + sorted query
        resource = f"/{self.account}/{container}" + (f"/{blob}" if blob else "")
        canon_resource = resource + "".join(
            f"\n{k.lower()}:{v}" for k, v in sorted(query.items())
        )
        # 2015-02-21+: zero Content-Length signs as the empty string
        string_to_sign = (
            f"{verb}\n"  # VERB
            "\n"  # Content-Encoding
            "\n"  # Content-Language
            "\n"  # Content-Length (empty for 0)
            "\n"  # Content-MD5
            "\n"  # Content-Type
            "\n"  # Date (empty when x-ms-date is set)
            "\n"  # If-Modified-Since
            "\n"  # If-Match
            "\n"  # If-None-Match
            "\n"  # If-Unmodified-Since
            "\n"  # Range
            f"{canon_headers}{canon_resource}"
        )
        sig = base64.b64encode(
            hmac.new(self._key, string_to_sign.encode("utf-8"), hashlib.sha256).digest()
        ).decode()
        headers["Authorization"] = f"SharedKey {self.account}:{sig}"

    def _request(
        self, verb: str, container: str, blob: str = "", query: dict | None = None
    ):
        """Signed request with standard-mode retries (exponential backoff on
        5xx / connection errors — the ``httpMaxRetries`` knob)."""
        query = dict(query or {})
        url = f"{self._base}/{urllib.parse.quote(container)}"
        if blob:
            url += f"/{urllib.parse.quote(blob)}"
        if query:
            url += "?" + urllib.parse.urlencode(sorted(query.items()))
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            headers = {
                "x-ms-date": formatdate(usegmt=True),
                "x-ms-version": API_VERSION,
            }
            self._sign(verb, container, blob, query, headers)
            req = urllib.request.Request(url, headers=headers, method=verb)
            try:
                return urllib.request.urlopen(req, timeout=30)
            except urllib.error.HTTPError as exc:
                if exc.code == 404:
                    return None
                if (
                    exc.code == 401
                    and self._credential is not None
                    and attempt < self.max_retries
                ):
                    # bearer token revoked/rotated mid-stream: drop the
                    # cached token so the retry re-walks the chain
                    self._credential.invalidate()
                    last = exc
                elif exc.code >= 500 and attempt < self.max_retries:
                    last = exc
                else:
                    raise
            except urllib.error.URLError as exc:
                if attempt >= self.max_retries:
                    raise
                last = exc
            time.sleep(min(0.05 * (2**attempt), 1.0))
        raise RuntimeError(f"retries exhausted for {verb} {url}: {last}")

    # ---- path plumbing ----------------------------------------------------
    def _container_key(self, path: str) -> tuple[str, str]:
        _, container, key = parse_azure_url(path)
        return container, key

    # ---- metadata interface (same shape as _LocalIO / S3StoreIO) ----------
    def read_text(self, path: str) -> str | None:
        container, key = self._container_key(path)
        resp = self._request("GET", container, key)
        return None if resp is None else resp.read().decode("utf-8")

    def _list_page_iter(self, container: str, prefix: str):
        marker = ""
        while True:
            query = {
                "restype": "container",
                "comp": "list",
                "prefix": prefix,
                "delimiter": "/",
                "maxresults": str(self.page_size),
            }
            if marker:
                query["marker"] = marker
            resp = self._request("GET", container, query=query)
            if resp is None:
                return
            import xml.etree.ElementTree as ET

            root = ET.fromstring(resp.read())
            yield root
            marker = (root.findtext("NextMarker") or "").strip()
            if not marker:
                return

    def listdir(self, path: str) -> list[str]:
        """Immediate children under ``path`` — blobs plus the
        ``BlobPrefix`` pseudo-directories the delimiter produces, paged
        with ``maxresults`` so a container with more batch folders than
        one page still lists completely."""
        container, key = self._container_key(path)
        prefix = key.rstrip("/") + "/" if key else ""
        names: list[str] = []
        for page in self._list_page_iter(container, prefix):
            blobs = page.find("Blobs")
            if blobs is None:
                continue
            for bp in blobs.findall("BlobPrefix"):
                names.append((bp.findtext("Name") or "")[len(prefix) :].rstrip("/"))
            for b in blobs.findall("Blob"):
                tail = (b.findtext("Name") or "")[len(prefix) :]
                if tail and "/" not in tail:
                    names.append(tail)
        return names

    def isdir(self, path: str) -> bool:
        container, key = self._container_key(path)
        prefix = key.rstrip("/") + "/"
        for page in self._list_page_iter(container, prefix):
            blobs = page.find("Blobs")
            if blobs is not None and (
                blobs.find("Blob") is not None or blobs.find("BlobPrefix") is not None
            ):
                return True
        return False

    def exists(self, path: str) -> bool:
        container, key = self._container_key(path)
        resp = self._request("HEAD", container, key)
        return True if resp is not None else self.isdir(path)

    # ---- data-plane fallback ----------------------------------------------
    def localize(self, paths: list[str]) -> list[str]:
        """Spool blob CSV chunks to local disk and return local paths.

        Jar-less fallback (module docstring): with ``hadoop-azure`` on the
        classpath executors read ``abfss://`` directly and this is never
        called.  ETag-validated so a re-uploaded chunk (stale-reupload
        scenario, test_cdc.py) is re-fetched rather than served stale."""
        out: list[str] = []
        for path in paths:
            container, key = self._container_key(path)
            local = os.path.join(self._spool, container, key)
            head = self._request("HEAD", container, key)
            if head is None:
                raise FileNotFoundError(path)
            etag = head.headers.get("ETag", "")
            if not (os.path.exists(local) and self._etags.get(local) == etag):
                os.makedirs(os.path.dirname(local), exist_ok=True)
                resp = self._request("GET", container, key)
                with open(local, "wb") as f:
                    f.write(resp.read())
                self._etags[local] = etag
            out.append(local)
        return out
