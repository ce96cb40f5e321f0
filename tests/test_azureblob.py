"""Azure Blob e2e for A5 — the Azurite analog (round-4 brief item 3).

The reference's integration harness runs blob ingest against the Azurite
emulator (docker-compose.yaml:35-45; Fixtures.scala:27-73 shows the
container layout).  This is that test for the PySpark engine: a local
HTTP server speaking the Azure Blob REST list/get surface — including
*verifying* the SharedKey HMAC signature, so auth is exercised for real —
with the synthetic Synapse Link batch layout stored as blobs, driven
through ``AzureBlobStoreIO`` via the spec's ``storageConnection`` mapping
on an ``abfss://``-shaped source root.  Listing uses a deliberately tiny
``maxResultsPerPage`` so every folder listing must paginate via
``NextMarker``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape

import pytest

from arcane_stream_microsoft_synapse_link_spark.sources.azureblob import (
    AzureBlobStoreIO,
    azure_blob_connection,
    is_azure_path,
    parse_azure_url,
)
from arcane_stream_microsoft_synapse_link_spark.sources.synapse import SynapseLinkSource
from arcane_stream_microsoft_synapse_link_spark.streaming.runner import (
    StreamRunner,
    StreamSpec,
)

from .synapse_fixture import (
    BASE_VERSION,
    ENTITY,
    KEYS,
    SynapseFixture,
    base_file,
    delete_file,
    minus,
    model_json,
    upsert_file,
)

ACCOUNT = "devaccount"
CONTAINER = "synapse"
PREFIX = "export"
ACCOUNT_KEY = base64.b64encode(b"azurite-analog-test-key").decode()


class _BlobHandler(BaseHTTPRequestHandler):
    """Azure Blob REST surface: List Blobs (prefix/delimiter/maxresults/
    marker) + Get Blob + Get Blob Properties, with SharedKey signature
    verification (403 on mismatch — a wrong account key fails loudly)."""

    server_version = "AzuriteAnalog/0.1"

    def log_message(self, *args):  # quiet
        pass

    # ---- SharedKey verification (mirror of the public signing scheme) ----
    def _expected_sig(self, verb: str, path: str, query: list[tuple[str, str]]) -> str:
        canon_headers = "".join(
            f"{k.lower()}:{v}\n"
            for k, v in sorted(self.headers.items(), key=lambda kv: kv[0].lower())
            if k.lower().startswith("x-ms-")
        )
        canon_resource = f"/{ACCOUNT}{path}" + "".join(
            f"\n{k.lower()}:{v}" for k, v in sorted(query)
        )
        string_to_sign = f"{verb}\n" + "\n" * 11 + canon_headers + canon_resource
        return base64.b64encode(
            hmac.new(
                base64.b64decode(ACCOUNT_KEY),
                string_to_sign.encode(),
                hashlib.sha256,
            ).digest()
        ).decode()

    def _authorized(self, verb: str) -> bool:
        auth = self.headers.get("Authorization", "")
        if auth.startswith("Bearer "):
            # credentialChain branch: the emulator VERIFIES the bearer
            # token against the one its paired token endpoint issued
            valid = getattr(self.server, "valid_bearer", None)
            return valid is not None and auth == f"Bearer {valid}"
        u = urllib.parse.urlparse(self.path)
        # strip the /{account} emulator prefix from the resource path
        path = urllib.parse.unquote(u.path)
        assert path.startswith(f"/{ACCOUNT}")
        query = urllib.parse.parse_qsl(u.query, keep_blank_values=True)
        want = f"SharedKey {ACCOUNT}:{self._expected_sig(verb, path[len(ACCOUNT) + 1:], query)}"
        return auth == want

    # ---- request routing --------------------------------------------------
    def _route(self, verb: str):
        if not self._authorized(verb):
            # service contract: expired/invalid bearer → 401 (client may
            # reacquire); SharedKey signature mismatch → 403
            is_bearer = self.headers.get("Authorization", "").startswith("Bearer ")
            self.send_response(401 if is_bearer else 403)
            self.end_headers()
            return
        u = urllib.parse.urlparse(self.path)
        parts = urllib.parse.unquote(u.path).lstrip("/").split("/", 2)
        # /{account}/{container}[/{blob...}]
        container = parts[1] if len(parts) > 1 else ""
        blob = parts[2] if len(parts) > 2 else ""
        q = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        store = self.server.store  # type: ignore[attr-defined]
        if q.get("comp") == "list" and container == CONTAINER:
            self._list(store, q)
        elif container == CONTAINER and (blob in store):
            body = store[blob]
            etag = '"' + hashlib.md5(body).hexdigest() + '"'
            self.send_response(200)
            self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if verb == "GET":
                self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def _list(self, store: dict, q: dict):
        prefix = q.get("prefix", "")
        maxresults = int(q.get("maxresults", "5000"))
        marker = q.get("marker", "")
        # delimiter-collapsed children: blobs + BlobPrefix pseudo-dirs,
        # lexicographically ordered (the service contract marker relies on)
        items: list[tuple[str, bool]] = []
        seen_prefixes: set[str] = set()
        for name in sorted(store):
            if not name.startswith(prefix):
                continue
            tail = name[len(prefix) :]
            if "/" in tail:
                p = prefix + tail.split("/", 1)[0] + "/"
                if p not in seen_prefixes:
                    seen_prefixes.add(p)
                    items.append((p, True))
            else:
                items.append((name, False))
        if marker:
            items = [it for it in items if it[0] > marker]
        page, rest = items[:maxresults], items[maxresults:]
        xml = ["<?xml version='1.0' encoding='utf-8'?>", "<EnumerationResults><Blobs>"]
        for name, is_prefix in page:
            tag = "BlobPrefix" if is_prefix else "Blob"
            xml.append(f"<{tag}><Name>{escape(name)}</Name></{tag}>")
        xml.append("</Blobs>")
        if rest:
            xml.append(f"<NextMarker>{escape(page[-1][0])}</NextMarker>")
        xml.append("</EnumerationResults>")
        body = "".join(xml).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self._route("GET")

    def do_HEAD(self):
        self._route("HEAD")


@pytest.fixture()
def blob_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _BlobHandler)
    srv.store = {}  # type: ignore[attr-defined]
    srv.valid_bearer = None  # type: ignore[attr-defined]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    t.join(timeout=5)


TENANT = "test-tenant"
CLIENT_ID = "test-client"
CLIENT_SECRET = "s3cret"


class _TokenHandler(BaseHTTPRequestHandler):
    """Stub of BOTH credentialChain token surfaces, each VERIFYING its
    request like the Azurite-analog verifies SharedKey signatures:

    - ``POST /{tenant}/oauth2/v2.0/token`` — AAD client-credentials grant
      (grant_type/client_id/client_secret/scope all checked → 401 on any
      mismatch);
    - ``GET /metadata/identity/oauth2/token`` — the IMDS managed-identity
      surface (``Metadata: true`` header + resource + api-version
      checked)."""

    server_version = "TokenStub/0.1"

    def log_message(self, *args):
        pass

    def _reply(self, code: int, payload: dict):
        import json as _json

        body = _json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        length = int(self.headers.get("Content-Length", "0"))
        form = dict(urllib.parse.parse_qsl(self.rfile.read(length).decode()))
        ok = (
            self.path == f"/{TENANT}/oauth2/v2.0/token"
            and form.get("grant_type") == "client_credentials"
            and form.get("client_id") == CLIENT_ID
            and form.get("client_secret") == self.server.client_secret  # type: ignore[attr-defined]
            and form.get("scope") == "https://storage.azure.com/.default"
        )
        if not ok:
            self._reply(401, {"error": "invalid_client"})
            return
        self.server.oauth_grants += 1  # type: ignore[attr-defined]
        self._reply(
            200,
            {
                "access_token": self.server.issue_token,  # type: ignore[attr-defined]
                "expires_in": 3600,
                "token_type": "Bearer",
            },
        )

    def do_GET(self):
        u = urllib.parse.urlparse(self.path)
        q = dict(urllib.parse.parse_qsl(u.query))
        ok = (
            u.path == "/metadata/identity/oauth2/token"
            and self.headers.get("Metadata") == "true"
            and q.get("resource") == "https://storage.azure.com/"
            and q.get("api-version") == "2018-02-01"
        )
        if not ok:
            self._reply(400, {"error": "bad_imds_request"})
            return
        self.server.imds_grants += 1  # type: ignore[attr-defined]
        self._reply(
            200,
            {
                "access_token": self.server.issue_token,  # type: ignore[attr-defined]
                "expires_in": "3600",  # IMDS returns strings
                "token_type": "Bearer",
            },
        )


@pytest.fixture()
def token_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _TokenHandler)
    srv.client_secret = CLIENT_SECRET  # type: ignore[attr-defined]
    srv.issue_token = "tok-initial"  # type: ignore[attr-defined]
    srv.oauth_grants = 0  # type: ignore[attr-defined]
    srv.imds_grants = 0  # type: ignore[attr-defined]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    t.join(timeout=5)


class AzureSynapseFixture:
    """The SynapseFixture batch layout, stored as blobs in the emulator."""

    def __init__(self, server):
        self.store = server.store
        self._put("model.json", model_json())

    def _put(self, rel: str, body: str) -> None:
        self.store[f"{PREFIX}/{rel}"] = body.encode("utf-8")

    def upload_batch(self, ts, add_delete=False, update_changelog=False, add_upsert=False):
        name = SynapseFixture.folder_name(ts)
        self._put(f"{name}/model.json", model_json())
        self._put(f"{name}/{ENTITY}/2021.csv", base_file())
        if add_delete:
            self._put(f"{name}/{ENTITY}/3.csv", delete_file())
        if add_upsert:
            self._put(f"{name}/{ENTITY}/5.csv", upsert_file())
        if update_changelog:
            self.set_changelog(name)
        return name

    def set_changelog(self, folder_name: str) -> None:
        self._put("Changelog/changelog.info", folder_name)


def _connection(server, key: str = ACCOUNT_KEY) -> dict:
    """storageConnection block (stream-spec-yaml-example.yaml:84-96 analog)
    with a page size small enough that every folder listing paginates."""
    host, port = server.server_address
    return {
        "accountName": ACCOUNT,
        "endpoint": f"http://{host}:{port}/{ACCOUNT}",
        "credentialType": {"sharedKey": {"accessKey": key}},
        "httpClient": {"httpMaxRetries": 4, "maxResultsPerPage": 2},
    }


def _io(server, tmp_path, key: str = ACCOUNT_KEY) -> AzureBlobStoreIO:
    return AzureBlobStoreIO(
        **azure_blob_connection(_connection(server, key)),
        spool_dir=str(tmp_path / "spool"),
    )


ROOT = f"abfss://{CONTAINER}@{ACCOUNT}.dfs.core.windows.net/{PREFIX}"


def test_url_parsing_and_scheme_detection():
    assert is_azure_path(ROOT) and is_azure_path("wasb://c@a.blob.core.windows.net/p")
    assert not is_azure_path("s3://bucket/p") and not is_azure_path("/local/p")
    assert parse_azure_url(ROOT) == (ACCOUNT, CONTAINER, PREFIX)


def test_key_env_fallback(monkeypatch):
    from arcane_stream_microsoft_synapse_link_spark.sources.azure import ACCESS_KEY_ENV

    monkeypatch.setenv(ACCESS_KEY_ENV, ACCOUNT_KEY)
    conn = {"accountName": ACCOUNT, "credentialType": {"sharedKey": {}}}
    assert azure_blob_connection(conn)["account_key"] == ACCOUNT_KEY


def test_listing_paginates_and_read_text(blob_server, tmp_path):
    fx = AzureSynapseFixture(blob_server)
    names = [fx.upload_batch(minus(hours=h)) for h in (5, 4, 3, 2, 1)]
    fx.set_changelog(names[-1])

    io = _io(blob_server, tmp_path)
    listed = io.listdir(ROOT)
    # 5 batch folders + Changelog "dir" + model.json, through maxresults=2 pages
    assert set(names) <= set(listed)
    assert "Changelog" in listed and "model.json" in listed
    assert io.read_text(f"{ROOT}/Changelog/changelog.info") == names[-1]
    assert io.read_text(f"{ROOT}/nope.txt") is None
    assert io.isdir(f"{ROOT}/{names[0]}") and not io.isdir(f"{ROOT}/ghost")

    src = SynapseLinkSource(ROOT, ENTITY, io=io)
    assert src.changelog_head() == names[-1]
    folders = src.pending(watermark=None)
    assert [f.name for f in folders] == names
    # range filter (watermark, head] holds over the blob listing
    assert [f.name for f in src.pending(watermark=names[1])] == names[2:]


def test_wrong_shared_key_is_rejected(blob_server, tmp_path):
    """The emulator VERIFIES the SharedKey HMAC — a wrong key is a 403,
    proving the signature path is real, not a pass-through header."""
    import urllib.error

    fx = AzureSynapseFixture(blob_server)
    fx.upload_batch(minus(hours=1), update_changelog=True)
    bad = _io(blob_server, tmp_path, key=base64.b64encode(b"wrong-key").decode())
    with pytest.raises(urllib.error.HTTPError) as exc:
        bad.read_text(f"{ROOT}/Changelog/changelog.info")
    assert exc.value.code == 403
    good = _io(blob_server, tmp_path)
    assert good.read_text(f"{ROOT}/Changelog/changelog.info") is not None


def test_localize_caches_and_revalidates(blob_server, tmp_path):
    fx = AzureSynapseFixture(blob_server)
    name = fx.upload_batch(minus(hours=1), update_changelog=True)
    io = _io(blob_server, tmp_path)
    path = f"{ROOT}/{name}/{ENTITY}/2021.csv"

    first = io.localize([path])
    assert first and open(first[0]).read() == base_file()
    # unchanged blob → cache hit, same local path
    assert io.localize([path]) == first
    # re-uploaded (changed) blob → ETag differs → re-fetched
    fx._put(f"{name}/{ENTITY}/2021.csv", upsert_file())
    again = io.localize([path])
    assert open(again[0]).read() == upsert_file()


def _chain_connection(server) -> dict:
    """storageConnection block exercising CRD credential branch 2
    (crd-microsoft-synapse.yaml:535-539): ``credentialChain: {}``."""
    host, port = server.server_address
    return {
        "accountName": ACCOUNT,
        "endpoint": f"http://{host}:{port}/{ACCOUNT}",
        "credentialType": {"credentialChain": {}},
        "httpClient": {"httpMaxRetries": 4, "maxResultsPerPage": 2},
    }


def _chain_env(token_server, imds_only: bool = False) -> dict:
    host, port = token_server.server_address
    if imds_only:
        return {"IDENTITY_ENDPOINT": f"http://{host}:{port}/metadata/identity/oauth2/token"}
    return {
        "AZURE_AUTHORITY_HOST": f"http://{host}:{port}",
        "AZURE_TENANT_ID": TENANT,
        "AZURE_CLIENT_ID": CLIENT_ID,
        "AZURE_CLIENT_SECRET": CLIENT_SECRET,
    }


def test_credential_chain_env_client_credentials(blob_server, token_server, tmp_path):
    """credentialChain provider 1: OAuth2 client-credentials against the
    (verifying) stub AAD endpoint; the blob emulator then verifies the
    bearer on every request.  The token is cached — listing + reads cost
    ONE grant."""
    from arcane_stream_microsoft_synapse_link_spark.sources.azureblob import (
        azure_blob_connection,
    )

    fx = AzureSynapseFixture(blob_server)
    names = [fx.upload_batch(minus(hours=h)) for h in (3, 2, 1)]
    fx.set_changelog(names[-1])
    blob_server.valid_bearer = token_server.issue_token

    kw = azure_blob_connection(_chain_connection(blob_server), env=_chain_env(token_server))
    io = AzureBlobStoreIO(**kw, spool_dir=str(tmp_path / "spool"))
    listed = io.listdir(ROOT)
    assert set(names) <= set(listed)
    assert io.read_text(f"{ROOT}/Changelog/changelog.info") == names[-1]
    assert token_server.oauth_grants == 1  # cached across every request

    # a wrong client secret never yields a token: the chain exhausts and
    # raises (the stub 401s the grant, IMDS default endpoint unreachable)
    bad_env = dict(_chain_env(token_server), AZURE_CLIENT_SECRET="wrong")
    bad_env["IDENTITY_ENDPOINT"] = "http://127.0.0.1:1/nope"  # fail fast
    bad = AzureBlobStoreIO(
        **azure_blob_connection(_chain_connection(blob_server), env=bad_env),
        spool_dir=str(tmp_path / "spool2"),
    )
    with pytest.raises(RuntimeError, match="no provider yielded a token"):
        bad.read_text(f"{ROOT}/Changelog/changelog.info")


def test_credential_chain_imds_fallback(blob_server, token_server, tmp_path):
    """credentialChain provider 2: with no AAD env credentials the chain
    falls through to the IMDS managed-identity endpoint (Metadata header
    + resource verified by the stub)."""
    from arcane_stream_microsoft_synapse_link_spark.sources.azureblob import (
        azure_blob_connection,
    )

    fx = AzureSynapseFixture(blob_server)
    name = fx.upload_batch(minus(hours=1), update_changelog=True)
    blob_server.valid_bearer = token_server.issue_token

    kw = azure_blob_connection(
        _chain_connection(blob_server), env=_chain_env(token_server, imds_only=True)
    )
    io = AzureBlobStoreIO(**kw, spool_dir=str(tmp_path / "spool"))
    assert io.read_text(f"{ROOT}/Changelog/changelog.info") == name
    assert token_server.imds_grants == 1 and token_server.oauth_grants == 0


def test_credential_chain_reacquires_on_401(blob_server, token_server, tmp_path):
    """Token rotated mid-stream: the storage side starts rejecting the
    cached bearer (401); the client invalidates and re-walks the chain,
    picking up the NEW token without surfacing an error."""
    from arcane_stream_microsoft_synapse_link_spark.sources.azureblob import (
        azure_blob_connection,
    )

    fx = AzureSynapseFixture(blob_server)
    name = fx.upload_batch(minus(hours=1), update_changelog=True)
    blob_server.valid_bearer = token_server.issue_token

    kw = azure_blob_connection(_chain_connection(blob_server), env=_chain_env(token_server))
    io = AzureBlobStoreIO(**kw, spool_dir=str(tmp_path / "spool"))
    assert io.read_text(f"{ROOT}/Changelog/changelog.info") == name

    # rotate: old token now invalid, endpoint issues a new one
    token_server.issue_token = "tok-rotated"
    blob_server.valid_bearer = "tok-rotated"
    assert io.read_text(f"{ROOT}/Changelog/changelog.info") == name
    assert token_server.oauth_grants == 2  # initial + post-401 refresh


@pytest.mark.slow
def test_cdc_scenario_over_azure_blob_credential_chain(
    spark, blob_server, token_server, tmp_path, monkeypatch
):
    """The full CDC oracle (StreamRunner.scala:176-235) on credential
    branch 2: same scenario as the sharedKey e2e below, authenticated via
    the OAuth2 chain — both CRD credentialType branches e2e-green
    (VERDICT r8 item 4)."""
    for k, v in _chain_env(token_server).items():
        monkeypatch.setenv(k, v)
    blob_server.valid_bearer = token_server.issue_token
    fx = AzureSynapseFixture(blob_server)
    fx.upload_batch(minus(hours=2))
    newest = fx.upload_batch(minus(hours=1), update_changelog=True)

    spec = StreamSpec(
        entity_name=ENTITY,
        source_root=ROOT,
        target_root=str(tmp_path / "target"),
        storage_connection=_chain_connection(blob_server),
    )
    runner = StreamRunner(spark, spec)
    assert isinstance(runner.source._io(), AzureBlobStoreIO)
    assert runner.backfill() == 5
    assert runner.table.watermark() == newest

    fx.upload_batch(minus(minutes=15), add_delete=True, add_upsert=True)
    fx.upload_batch(minus(minutes=5), update_changelog=True)
    assert runner.run_once() == 2

    state = {
        r["Id"]: r["versionnumber"]
        for r in runner.table.read(spark).select("Id", "versionnumber").collect()
    }
    assert len(state) == 6
    assert KEYS[0] not in state
    assert state[KEYS[1]] == BASE_VERSION + 100
    assert token_server.oauth_grants >= 1


def test_cdc_scenario_over_azure_blob(spark, blob_server, tmp_path):
    """Full reference oracle (StreamRunner.scala:176-235) with the source
    on the abfss-shaped live endpoint: backfill 5 rows → stream upsert +
    delete batches → exactly 6 rows, deleted key gone, update applied,
    watermark at the frontier."""
    fx = AzureSynapseFixture(blob_server)
    fx.upload_batch(minus(hours=2))
    newest = fx.upload_batch(minus(hours=1), update_changelog=True)

    spec = StreamSpec(
        entity_name=ENTITY,
        source_root=ROOT,
        target_root=str(tmp_path / "target"),
        storage_connection=_connection(blob_server),
    )
    runner = StreamRunner(spark, spec)
    assert isinstance(runner.source._io(), AzureBlobStoreIO)
    assert runner.backfill() == 5
    assert runner.table.watermark() == newest

    fx.upload_batch(minus(minutes=15), add_delete=True, add_upsert=True)
    frontier = fx.upload_batch(minus(minutes=5), update_changelog=True)
    assert runner.run_once() == 2

    state = {
        r["Id"]: r["versionnumber"]
        for r in runner.table.read(spark).select("Id", "versionnumber").collect()
    }
    assert len(state) == 6
    assert KEYS[0] not in state
    assert state[KEYS[1]] == BASE_VERSION + 100
    assert KEYS[5] in state and KEYS[6] in state
    assert runner.table.watermark() == frontier


def test_token_credential_chain_thread_safety():
    """ADVICE r9: concurrent token() calls must not stampede the token
    endpoint (single _acquire under the lock) and an interleaved
    invalidate() must never let token() return None."""
    import threading

    from arcane_stream_microsoft_synapse_link_spark.sources.azureblob import (
        TokenCredentialChain,
    )

    chain = TokenCredentialChain(env={})
    calls = []

    def fake_acquire():
        calls.append(1)
        return f"tok-{len(calls)}", __import__("time").time() + 3600
    chain._acquire = fake_acquire

    results: list[str | None] = []
    errors: list[BaseException] = []

    def worker():
        try:
            for _ in range(50):
                results.append(chain.token())
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    def invalidator():
        for _ in range(25):
            chain.invalidate()

    threads = [threading.Thread(target=worker) for _ in range(8)]
    threads.append(threading.Thread(target=invalidator))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert None not in results and all(r.startswith("tok-") for r in results)
    # without invalidations 400 calls share ONE acquire; with 25 racing
    # invalidations the bound is 1 + invalidations
    assert len(calls) <= 26, len(calls)
