"""Azure Blob (ABFS) connection mapping — operator A5.

The reference authenticates its own blob client from
``source.configuration.storageConnection`` (stream-spec-yaml-example.yaml:
84-96: accountName/endpoint, httpClient retry knobs, sharedKey or
credential-chain auth; key fallback env
``ARCANE_FRAMEWORK__AZURE_STORAGE_ACCESS_KEY``, dev.env.example:11 /
crd-microsoft-synapse.yaml:499-539). In the Spark engine the blob client
IS the Hadoop ABFS connector, so the same block maps onto ``fs.azure.*``
keys applied to the session's Hadoop configuration — after that,
``abfss://`` base locations work in every reader (the folder source is
path-scheme-agnostic by design).

No Azure endpoint exists in this container; the mapping is pure and
unit-tested, and ``apply_azure_conf`` only sets configuration keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..config import parse_duration_s

ACCESS_KEY_ENV = "ARCANE_FRAMEWORK__AZURE_STORAGE_ACCESS_KEY"


def azure_hadoop_conf(
    storage_connection: dict, env: dict[str, str] | None = None
) -> dict[str, str]:
    """Reference ``storageConnection`` block → ``fs.azure.*`` conf keys."""
    env = env if env is not None else dict(os.environ)
    account = storage_connection.get("accountName", "")
    suffix = f"{account}.dfs.core.windows.net" if account else None
    conf: dict[str, str] = {}

    http = storage_connection.get("httpClient", {}) or {}
    if "httpMaxRetries" in http:
        conf["fs.azure.io.retry.max.retries"] = str(int(http["httpMaxRetries"]))
    if "httpMinRetryDelay" in http:
        ms = int(parse_duration_s(http["httpMinRetryDelay"]) * 1000)
        conf["fs.azure.io.retry.min.backoff.interval"] = str(ms)
    if "httpMaxRetryDelay" in http:
        ms = int(parse_duration_s(http["httpMaxRetryDelay"]) * 1000)
        conf["fs.azure.io.retry.max.backoff.interval"] = str(ms)
    if "maxResultsPerPage" in http:
        conf["fs.azure.list.max.results"] = str(int(http["maxResultsPerPage"]))

    cred = storage_connection.get("credentialType", {}) or {}
    if "sharedKey" in cred and suffix:
        key = (cred.get("sharedKey") or {}).get("accessKey") or env.get(ACCESS_KEY_ENV)
        conf[f"fs.azure.account.auth.type.{suffix}"] = "SharedKey"
        if key:
            conf[f"fs.azure.account.key.{suffix}"] = key
    elif "credentialChain" in cred and suffix:
        # DefaultAzureCredential analog: managed-identity OAuth on the
        # connector side (pod identity / workload identity provides tokens)
        conf[f"fs.azure.account.auth.type.{suffix}"] = "OAuth"
        conf[f"fs.azure.account.oauth.provider.type.{suffix}"] = (
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
        )
    return conf


def apply_azure_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
