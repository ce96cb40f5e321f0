"""S3-compatible object-store I/O for the changelog source (operator A5).

The reference ingests from Azure Blob and its integration harness runs the
same code against the Azurite emulator (docker-compose.yaml:35-45,
integration-tests.yaml) — the point of that test is that the *listing /
auth / retry / paging* path is exercised against a real HTTP object-store
endpoint, not a local directory.  This module is that test's analog for
this engine: a boto3-backed IO implementing the same driver-side metadata
interface as ``_LocalIO`` / ``_HadoopIO`` (``sources/synapse.py``), pointed
at any S3-compatible endpoint — in tests, a ``moto`` server on localhost.

Control plane vs data plane:

- **Metadata** (``changelog.info``, folder listing, ``model.json``) is
  driver-side by design — identical to a streaming source's offset
  planning — and goes through boto3 ``list_objects_v2`` / ``get_object``
  with the spec's retry and page-size knobs
  (crd-microsoft-synapse.yaml:499-539: ``httpMaxRetries``,
  ``httpRetryTimeout``, ``maxResultsPerPage`` → boto3 retry config and
  ``MaxKeys`` paging).
- **Data** (CSV chunks) should be read by Spark executors directly via the
  ``s3a://`` Hadoop connector when its jars are on the classpath (then this
  class is only used for metadata, exactly like ``_HadoopIO``).  This
  sandbox ships no ``hadoop-aws`` jar, so ``localize()`` provides the
  documented fallback: spool the immutable batch chunks to local disk
  (ETag-validated cache) and hand Spark local paths.  Batch folders are
  complete before the changelog points at them (FIXTURES.md §1.1), so the
  cache is coherent; a re-uploaded chunk changes its ETag and is re-fetched.

At 100 TB the fallback is NOT the production path — the production path is
``s3a://`` executor-side reads with this class doing only metadata — and
the docstring on ``localize`` says so; the e2e test's value is the live
endpoint exercise of listing/auth/retry/paging semantics.
"""

from __future__ import annotations

import os
import re
import tempfile
from urllib.parse import urlparse

_S3_RE = re.compile(r"^s3a?://", re.IGNORECASE)


def is_s3_path(path: str) -> bool:
    return bool(_S3_RE.match(path))


def s3_connection(spec: dict) -> dict:
    """Reference ``storageConnection`` block → ``S3StoreIO`` kwargs.

    Mirrors ``azure_hadoop_conf`` (sources/azure.py) for the S3 dialect:
    ``endpoint`` / ``accountKey``-style auth / ``httpMaxRetries`` /
    ``maxResultsPerPage`` map onto boto3 client settings.
    """
    out: dict = {}
    if spec.get("endpoint"):
        out["endpoint_url"] = str(spec["endpoint"])
    auth = spec.get("auth", {})
    if auth.get("kind", "shared_key") == "shared_key":
        if "accessKey" in auth:
            out["access_key"] = str(auth["accessKey"])
        if "secretKey" in auth:
            out["secret_key"] = str(auth["secretKey"])
    # kind == "default" → boto3's own credential chain (env/instance
    # profile), the DefaultAzureCredential analog: pass no keys.
    http = spec.get("httpSettings", {})
    if "httpMaxRetries" in http:
        out["max_retries"] = int(http["httpMaxRetries"])
    if "maxResultsPerPage" in http:
        out["page_size"] = int(http["maxResultsPerPage"])
    if spec.get("region"):
        out["region"] = str(spec["region"])
    return out


class S3StoreIO:
    """Driver-side metadata I/O (+ jar-less data localization) over S3.

    Implements the ``read_text / listdir / isdir / exists`` interface of
    ``sources/synapse.py`` for ``s3://bucket/prefix`` paths, with paging
    (``MaxKeys``) and standard-mode retries sized from the spec.
    """

    def __init__(
        self,
        *,
        endpoint_url: str | None = None,
        access_key: str | None = None,
        secret_key: str | None = None,
        region: str = "us-east-1",
        max_retries: int = 3,
        page_size: int = 1000,
        spool_dir: str | None = None,
    ):
        import boto3
        from botocore.config import Config

        self._client = boto3.client(
            "s3",
            endpoint_url=endpoint_url,
            aws_access_key_id=access_key,
            aws_secret_access_key=secret_key,
            region_name=region,
            config=Config(retries={"max_attempts": max_retries, "mode": "standard"}),
        )
        self.page_size = int(page_size)
        self._spool = spool_dir or tempfile.mkdtemp(prefix="synapse-s3-spool-")
        self._etags: dict[str, str] = {}  # local path → ETag it was fetched at

    # ---- path plumbing -----------------------------------------------------
    @staticmethod
    def _bucket_key(path: str) -> tuple[str, str]:
        u = urlparse(path)
        return u.netloc, u.path.lstrip("/")

    # ---- metadata interface (same shape as _LocalIO / _HadoopIO) -----------
    def read_text(self, path: str) -> str | None:
        from botocore.exceptions import ClientError

        bucket, key = self._bucket_key(path)
        try:
            body = self._client.get_object(Bucket=bucket, Key=key)["Body"].read()
        except ClientError as exc:
            if exc.response.get("Error", {}).get("Code") in ("NoSuchKey", "404"):
                return None
            raise
        return body.decode("utf-8")

    def _list_page_iter(self, bucket: str, prefix: str):
        token: str | None = None
        while True:
            kwargs = dict(
                Bucket=bucket, Prefix=prefix, Delimiter="/", MaxKeys=self.page_size
            )
            if token:
                kwargs["ContinuationToken"] = token
            page = self._client.list_objects_v2(**kwargs)
            yield page
            if not page.get("IsTruncated"):
                return
            token = page.get("NextContinuationToken")

    def listdir(self, path: str) -> list[str]:
        """Immediate children (files and "directories") under ``path``.

        Object stores have no directories — a child dir is a
        ``CommonPrefix`` under ``Delimiter="/"``.  Paged with ``MaxKeys``
        so a container with more batch folders than one page still lists
        completely (the reference's ``maxResultsPerPage`` knob)."""
        bucket, key = self._bucket_key(path)
        prefix = key.rstrip("/") + "/" if key else ""
        names: list[str] = []
        for page in self._list_page_iter(bucket, prefix):
            for cp in page.get("CommonPrefixes", []):
                names.append(cp["Prefix"][len(prefix) :].rstrip("/"))
            for obj in page.get("Contents", []):
                tail = obj["Key"][len(prefix) :]
                if tail and "/" not in tail:
                    names.append(tail)
        return names

    def isdir(self, path: str) -> bool:
        bucket, key = self._bucket_key(path)
        prefix = key.rstrip("/") + "/"
        page = self._client.list_objects_v2(Bucket=bucket, Prefix=prefix, MaxKeys=1)
        return page.get("KeyCount", 0) > 0

    def exists(self, path: str) -> bool:
        from botocore.exceptions import ClientError

        bucket, key = self._bucket_key(path)
        try:
            self._client.head_object(Bucket=bucket, Key=key)
            return True
        except ClientError:
            return self.isdir(path)

    # ---- data-plane fallback ----------------------------------------------
    def localize(self, paths: list[str]) -> list[str]:
        """Spool S3 CSV chunks to local disk and return local paths.

        Jar-less fallback for the data plane (module docstring): with
        ``hadoop-aws`` on the classpath executors read ``s3a://`` directly
        and this is never called.  The cache is ETag-validated so a
        re-uploaded chunk (stale-reupload scenario, test_cdc.py) is
        re-fetched rather than served stale."""
        out: list[str] = []
        for path in paths:
            bucket, key = self._bucket_key(path)
            local = os.path.join(self._spool, bucket, key)
            head = self._client.head_object(Bucket=bucket, Key=key)
            etag = head.get("ETag", "")
            if not (os.path.exists(local) and self._etags.get(local) == etag):
                os.makedirs(os.path.dirname(local), exist_ok=True)
                self._client.download_file(bucket, key, local)
                self._etags[local] = etag
            out.append(local)
        return out
