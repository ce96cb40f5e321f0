"""Object-store e2e for A5 — the Azurite-test analog.

The reference's integration harness runs its blob ingest against the
Azurite emulator (docker-compose.yaml:35-45) so the listing / auth /
retry / paging path is exercised over a real HTTP object-store endpoint.
This is that test for the PySpark engine: a ``moto`` S3 server on
localhost, the same synthetic Synapse Link batch layout uploaded as
objects, and the full CDC scenario (backfill 5 → stream upsert+delete →
6 rows) executed through ``S3StoreIO`` with a deliberately tiny
``maxResultsPerPage`` so folder listing must paginate.
"""

from __future__ import annotations

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from moto.server import ThreadedMotoServer  # noqa: E402

from arcane_stream_microsoft_synapse_link_spark.sources.objectstore import (  # noqa: E402
    S3StoreIO,
    s3_connection,
)
from arcane_stream_microsoft_synapse_link_spark.sources.synapse import (  # noqa: E402
    SynapseLinkSource,
)
from arcane_stream_microsoft_synapse_link_spark.streaming.runner import (  # noqa: E402
    StreamRunner,
    StreamSpec,
)

from .synapse_fixture import (  # noqa: E402
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

BUCKET = "synapse"
PREFIX = "export"


@pytest.fixture(scope="module")
def s3_endpoint():
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0)
    server.start()
    host, port = server.get_host_and_port()
    yield f"http://127.0.0.1:{port}"
    server.stop()


@pytest.fixture()
def s3_client(s3_endpoint):
    client = boto3.client(
        "s3",
        endpoint_url=s3_endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket=BUCKET)
    yield client
    # empty the bucket between tests (moto keeps server state module-wide)
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=BUCKET):
        for obj in page.get("Contents", []):
            client.delete_object(Bucket=BUCKET, Key=obj["Key"])
    client.delete_bucket(Bucket=BUCKET)


class S3SynapseFixture:
    """The SynapseFixture batch layout, uploaded as S3 objects."""

    def __init__(self, client):
        self.client = client
        self._put("model.json", model_json())

    def _put(self, rel: str, body: str) -> None:
        self.client.put_object(
            Bucket=BUCKET, Key=f"{PREFIX}/{rel}", Body=body.encode("utf-8")
        )

    def upload_batch(
        self,
        ts,
        add_delete: bool = False,
        update_changelog: bool = False,
        add_upsert: bool = False,
    ) -> str:
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


def _connection(endpoint: str) -> dict:
    """storageConnection block (crd-microsoft-synapse.yaml:499-539 analog)
    with a page size small enough that every folder listing paginates."""
    return {
        "endpoint": endpoint,
        "auth": {"kind": "shared_key", "accessKey": "testing", "secretKey": "testing"},
        "httpSettings": {"httpMaxRetries": 4, "maxResultsPerPage": 2},
        "region": "us-east-1",
    }


def _io(endpoint: str, tmp_path) -> S3StoreIO:
    return S3StoreIO(**s3_connection(_connection(endpoint)), spool_dir=str(tmp_path / "spool"))


def test_listing_paginates_and_read_text(s3_endpoint, s3_client, tmp_path):
    fx = S3SynapseFixture(s3_client)
    names = [fx.upload_batch(minus(hours=h)) for h in (5, 4, 3, 2, 1)]
    fx.set_changelog(names[-1])

    io = _io(s3_endpoint, tmp_path)
    root = f"s3://{BUCKET}/{PREFIX}"
    listed = io.listdir(root)
    # 5 batch folders + Changelog "dir" + model.json, through MaxKeys=2 pages
    assert set(names) <= set(listed)
    assert "Changelog" in listed and "model.json" in listed
    assert io.read_text(f"{root}/Changelog/changelog.info") == names[-1]
    assert io.read_text(f"{root}/nope.txt") is None
    assert io.isdir(f"{root}/{names[0]}") and not io.isdir(f"{root}/ghost")

    src = SynapseLinkSource(root, ENTITY, io=io)
    assert src.changelog_head() == names[-1]
    folders = src.pending(watermark=None)
    assert [f.name for f in folders] == names
    # range filter (watermark, head] holds over the object listing
    assert [f.name for f in src.pending(watermark=names[1])] == names[2:]


def test_localize_caches_and_revalidates(s3_endpoint, s3_client, tmp_path):
    fx = S3SynapseFixture(s3_client)
    name = fx.upload_batch(minus(hours=1), update_changelog=True)
    io = _io(s3_endpoint, tmp_path)
    path = f"s3://{BUCKET}/{PREFIX}/{name}/{ENTITY}/2021.csv"

    first = io.localize([path])
    assert first and open(first[0]).read() == base_file()
    # unchanged object → cache hit, same local path
    assert io.localize([path]) == first
    # re-uploaded (changed) object → ETag differs → re-fetched
    s3_client.put_object(
        Bucket=BUCKET,
        Key=f"{PREFIX}/{name}/{ENTITY}/2021.csv",
        Body=upsert_file().encode(),
    )
    again = io.localize([path])
    assert open(again[0]).read() == upsert_file()


def test_cdc_scenario_over_object_store(spark, s3_endpoint, s3_client, tmp_path):
    """Full reference oracle (StreamRunner.scala:176-235) with the source
    on a live S3-compatible endpoint: backfill 5 rows → stream upsert +
    delete batches → exactly 6 rows, deleted key gone, update applied,
    watermark at the frontier."""
    fx = S3SynapseFixture(s3_client)
    fx.upload_batch(minus(hours=2))
    newest = fx.upload_batch(minus(hours=1), update_changelog=True)

    spec = StreamSpec(
        entity_name=ENTITY,
        source_root=f"s3://{BUCKET}/{PREFIX}",
        target_root=str(tmp_path / "target"),
        storage_connection=_connection(s3_endpoint),
    )
    runner = StreamRunner(spark, spec)
    assert isinstance(runner.source._io(), S3StoreIO)
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
