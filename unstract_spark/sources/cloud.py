"""S8 — cloud filesystem connectors, Spark-first.

The reference normalizes 9+ storage providers to fsspec filesystems
(unstract/connectors/filesystems/: Local, MinIO/S3, GCS, Azure Blob,
Google Drive, Box, Dropbox, SFTP, HTTP, SharePoint). On Spark the
first-class path is Hadoop FS URIs — the SAME listing/catalog code
(sources/catalog.py) works on every scheme once the session carries the
connector's credentials:

  s3a://bucket/prefix      (S3/MinIO: hadoop-aws)
  gs://bucket/prefix       (GCS connector)
  abfss://container@account.dfs.core.windows.net/  (Azure ABFS)
  sftp://host/path         (hadoop sftp)

Long-tail providers without Hadoop connectors (Drive, Box, Dropbox,
SharePoint) run a *sync-to-staging* job: an fsspec-backed copy into an
object-store staging prefix, then the normal catalog scan — mirroring
the reference's own copy-into-execution-volume step. The fsspec deps
are not in this container, so `sync_to_staging` raises unless given an
injected filesystem (tests inject a fake).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

# scheme -> hadoop conf entries derived from a generic credentials dict
_SCHEME_CONF: dict[str, Callable[[dict], dict[str, str]]] = {
    "s3a": lambda c: {
        "fs.s3a.access.key": c.get("access_key", ""),
        "fs.s3a.secret.key": c.get("secret_key", ""),
        "fs.s3a.endpoint": c.get("endpoint", "s3.amazonaws.com"),
        "fs.s3a.path.style.access": str(c.get("path_style", False)).lower(),
        "fs.s3a.connection.maximum": "64",
    },
    "gs": lambda c: {
        "fs.gs.auth.type": c.get("auth_type", "APPLICATION_DEFAULT"),
        "fs.gs.project.id": c.get("project_id", ""),
    },
    "abfss": lambda c: {
        f"fs.azure.account.key.{c.get('account', '')}.dfs.core.windows.net": c.get(
            "account_key", ""
        ),
    },
    "sftp": lambda c: {
        "fs.sftp.user": c.get("user", ""),
        "fs.sftp.password": c.get("password", ""),
    },
}

HADOOP_SCHEMES = tuple(_SCHEME_CONF)
SYNC_SCHEMES = ("gdrive", "box", "dropbox", "sharepoint", "http", "https")


def configure_connector(spark: SparkSession, scheme: str, credentials: dict) -> None:
    """Install a connector's credentials into the live session's hadoop
    conf. Idempotent; per-bucket overrides use the per-bucket hadoop
    key form if needed."""
    if scheme not in _SCHEME_CONF:
        raise ValueError(
            f"no hadoop mapping for scheme {scheme!r}; "
            f"hadoop-native: {HADOOP_SCHEMES}, sync-to-staging: {SYNC_SCHEMES}"
        )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in _SCHEME_CONF[scheme](credentials).items():
        hconf.set(k, v)


def sync_to_staging(
    fs,  # fsspec.AbstractFileSystem (injected; not bundled here)
    remote_paths: list[str],
    staging_dir: str,
    copy_fn: Callable[[object, str, str], None] | None = None,
) -> list[str]:
    """Long-tail provider sync: copy remote files into a staging dir
    the catalog scan can read. `fs` is an fsspec filesystem from the
    provider's SDK; tests inject a fake. Returns local staged paths."""
    if fs is None:
        raise NotImplementedError(
            "long-tail providers need an fsspec filesystem (google-drive/"
            "box/dropbox SDKs are not bundled); inject one"
        )
    import os

    os.makedirs(staging_dir, exist_ok=True)
    staged = []
    copy = copy_fn or (lambda f, src, dst: f.get(src, dst))
    for rp in remote_paths:
        dst = os.path.join(staging_dir, rp.replace("/", "_").lstrip("_"))
        copy(fs, rp, dst)
        staged.append(dst)
    return staged
