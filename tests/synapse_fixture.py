"""Synthetic Synapse Link export fixture for tests.

Recreates the blob layout the reference integration harness seeds
(FIXTURES.md §1: root model.json, Changelog/changelog.info pointer,
per-batch <ts>/<entity>/<chunk>.csv) with freshly synthesized data —
same 25-column entity shape, both timestamp wire formats, sparse delete
rows — so the engine's e2e behavior can be asserted against the same
oracle outcomes (backfill 5 → +2 −1 → 6 rows).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

ENTITY = "dimensionattributelevelvalue"

COLUMNS = [
    ("Id", "guid"),
    ("SinkCreatedOn", "dateTime"),
    ("SinkModifiedOn", "dateTime"),
    ("sysdatastatecode", "int64"),
    ("dimensionattributevalue", "int64"),
    ("dimensionattributevaluegroup", "int64"),
    ("displayvalue", "string"),
    ("ordinal", "int64"),
    ("backingrecorddataareaid", "string"),
    ("modifieddatetime", "dateTime"),
    ("modifiedby", "string"),
    ("modifiedtransactionid", "int64"),
    ("createddatetime", "dateTime"),
    ("createdby", "string"),
    ("createdtransactionid", "int64"),
    ("dataareaid", "string"),
    ("recversion", "int64"),
    ("partition", "int64"),
    ("sysrowversion", "int64"),
    ("recid", "int64"),
    ("tableid", "int64"),
    ("versionnumber", "int64"),
    ("createdon", "dateTimeOffset"),
    ("modifiedon", "dateTime"),
    ("IsDelete", "boolean"),
]

KEYS = [f"0000000{i}-aaaa-bbbb-cccc-ddddeeee000{i}" for i in range(1, 8)]
BASE_VERSION = 5000000000


def model_json(extra_columns: tuple[tuple[str, str], ...] = ()) -> str:
    return json.dumps(
        {
            "name": "cdm",
            "version": "1.0",
            "entities": [
                {
                    "$type": "LocalEntity",
                    "name": ENTITY,
                    "attributes": [
                        {"name": n, "dataType": t, "maxLength": -1}
                        for n, t in (*COLUMNS, *extra_columns)
                    ],
                }
            ],
        }
    )


def data_row(key: str, version: int, display: str, sysrow: int | None = None) -> str:
    """One full change row; exercises US-12h, ISO-Z and ISO-offset formats."""
    sysrow = sysrow if sysrow is not None else version
    iso = "2021-03-04T05:06:07.0000000Z"
    return (
        f'{key},"1/7/2021 0:04:05 PM","1/7/2021 3:04:05 PM",0,42,43,"{display}",1,,'
        f'"{iso}","usr1",7001,"{iso}","usr1",7002,"dat",1,{version % 13},{sysrow},'
        f'{version % 997},21111,{version},"2021-03-04T05:06:07.0000000+00:00","{iso}",'
    )


def delete_row(key: str, version: int) -> str:
    """Sparse delete row: key + a (high) versionnumber + sentinel createdon
    + IsDelete=True, all other typed columns empty (cast to null, not fail)
    — same column alignment as the reference delete fixture."""
    return f'{key},"1/7/2021 0:04:05 PM","1/7/2021 3:04:05 PM",,,,,,,,,,,,,,,,,,,{version},"0001-01-03T00:00:00.0000000",,True'


def base_file() -> str:
    return "\n".join(data_row(KEYS[i], BASE_VERSION + i, f"D{i:04d}") for i in range(5)) + "\n"


def upsert_file(updated_version: int = BASE_VERSION + 100) -> str:
    """Update of KEYS[1] plus two brand-new keys (KEYS[5], KEYS[6])."""
    return (
        "\n".join(
            [
                data_row(KEYS[1], updated_version, "D-UPDATED"),
                data_row(KEYS[5], BASE_VERSION + 50, "D-NEW-1"),
                data_row(KEYS[6], BASE_VERSION + 51, "D-NEW-2"),
            ]
        )
        + "\n"
    )


def delete_file(deleted_key: str = KEYS[0], version: int = BASE_VERSION + 200) -> str:
    return delete_row(deleted_key, version) + "\n"


class SynapseFixture:
    def __init__(self, root: str):
        self.root = str(root)
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "model.json"), "w") as fh:
            fh.write(model_json())

    @staticmethod
    def folder_name(ts: datetime) -> str:
        return ts.strftime("%Y-%m-%dT%H.%M.%S") + "Z"

    def upload_batch(
        self,
        ts: datetime,
        add_delete: bool = False,
        update_changelog: bool = False,
        add_upsert: bool = False,
        include_base: bool = True,
    ) -> str:
        """Mirrors the reference harness's uploadBatch(ts, addDelete,
        updateChangelog, addUpsert) — every batch carries the base file
        unless ``include_base=False`` (a narrow change batch touching only
        the upsert/delete keys, for incremental-commit scenarios)."""
        name = self.folder_name(ts)
        entity_dir = os.path.join(self.root, name, ENTITY)
        os.makedirs(entity_dir, exist_ok=True)
        with open(os.path.join(self.root, name, "model.json"), "w") as fh:
            fh.write(model_json())
        if include_base:
            with open(os.path.join(entity_dir, "2021.csv"), "w") as fh:
                fh.write(base_file())
        if add_delete:
            with open(os.path.join(entity_dir, "3.csv"), "w") as fh:
                fh.write(delete_file())
        if add_upsert:
            with open(os.path.join(entity_dir, "5.csv"), "w") as fh:
                fh.write(upsert_file())
        if update_changelog:
            self.set_changelog(name)
        return name

    def upload_evolved_batch(
        self,
        ts: datetime,
        key: str,
        version: int,
        display: str,
        extra_value: str,
        extra_column: tuple[str, str] = ("extracol", "string"),
        update_changelog: bool = False,
    ) -> str:
        """A batch whose per-folder model.json declares one extra attribute
        (schema change mid-stream, SURVEY watch-list item 3) and whose CSV
        rows carry the extra trailing field."""
        name = self.folder_name(ts)
        entity_dir = os.path.join(self.root, name, ENTITY)
        os.makedirs(entity_dir, exist_ok=True)
        with open(os.path.join(self.root, name, "model.json"), "w") as fh:
            fh.write(model_json(extra_columns=(extra_column,)))
        with open(os.path.join(entity_dir, "2021.csv"), "w") as fh:
            # data_row ends with the empty-IsDelete trailing comma; the
            # extra attribute is one more comma-separated trailing field
            fh.write(data_row(key, version, display) + f',"{extra_value}"\n')
        if update_changelog:
            self.set_changelog(name)
        return name

    def write_folder(self, ts: datetime, rows: list[str]) -> str:
        """A batch folder holding exactly ``rows`` (pre-rendered CSV lines)
        — row-count-controlled batches for grouping/shaping tests."""
        name = self.folder_name(ts)
        entity_dir = os.path.join(self.root, name, ENTITY)
        os.makedirs(entity_dir, exist_ok=True)
        with open(os.path.join(self.root, name, "model.json"), "w") as fh:
            fh.write(model_json())
        with open(os.path.join(entity_dir, "data.csv"), "w") as fh:
            fh.write("\n".join(rows) + "\n")
        return name

    def set_changelog(self, folder_name: str) -> None:
        os.makedirs(os.path.join(self.root, "Changelog"), exist_ok=True)
        with open(os.path.join(self.root, "Changelog", "changelog.info"), "w") as fh:
            fh.write(folder_name)


START = datetime(2021, 6, 1, 12, 0, 0)


def minus(minutes: int = 0, hours: int = 0) -> datetime:
    return START - timedelta(minutes=minutes, hours=hours)
