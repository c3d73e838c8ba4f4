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


# ---- long-tail providers: fsspec constructor conf-gen ----
#
# The reference wraps each provider's fsspec implementation with a
# settings dict (unstract/connectors/src/unstract/connectors/
# filesystems/: google_drive/google_drive.py:46-60 oauth tokens,
# box/box.py:25-40 JWT app settings + root_id, zs_dropbox/
# zs_dropbox.py:15-21 token, sharepoint/sharepoint.py:67-87 site/
# client credentials). The SDKs are not bundled here, so parity is the
# same shape as the JDBC dialect matrix: a per-provider mapping from
# the reference's settings schema to the fsspec protocol + constructor
# kwargs, validated for required keys; the filesystem object itself is
# injected (tests) or constructed by deployments that install the SDK.

_FSSPEC_CONF: dict[str, Callable[[dict], tuple[str, dict]]] = {
    "gdrive": lambda s: (
        "gdrive",
        {
            "access_token": s["access_token"],
            "refresh_token": s["refresh_token"],
            "token_expiry": s["token_expiry"],
            "use_listings_cache": False,
        },
    ),
    "box": lambda s: (
        "box",
        {
            "oauth_settings": s["box_app_settings"],  # JWT app JSON
            "root_id": s.get("root_id", 0),
            "use_listings_cache": False,
        },
    ),
    "dropbox": lambda s: (
        "dropbox",
        {"token": s["token"], "use_listings_cache": False},
    ),
    "sharepoint": lambda s: (
        "webdav",
        {
            "base_url": s["site_url"].rstrip("/"),
            "client_id": s["client_id"],
            "client_secret": s["client_secret"],
            "user_email": s.get("user_email"),
        },
    ),
}


def fsspec_connector_conf(provider: str, settings: dict) -> tuple[str, dict]:
    """(fsspec protocol, constructor kwargs) for a long-tail provider.
    Missing required settings raise KeyError, like the reference's
    constructors."""
    if provider not in _FSSPEC_CONF:
        raise ValueError(
            f"unknown long-tail provider {provider!r}; supported: {sorted(_FSSPEC_CONF)}"
        )
    return _FSSPEC_CONF[provider](settings)


def sync_to_staging_distributed(
    spark: SparkSession,
    fs_factory: Callable[[], object],  # () -> fsspec filesystem, built per task
    remote_paths: list[str],
    staging_dir: str,
):
    """Scale path for the long-tail sync: the copy fan-out runs on the
    cluster, not the driver. Remote paths become a DataFrame, each task
    constructs the provider filesystem once (fs_factory must pickle —
    pass settings, not a live client) and copies its partition's files
    into the shared staging prefix; failures isolate per file. At 100k
    files the driver loop in `sync_to_staging` is the bottleneck — this
    is the same listing-parallelism move as the catalog scan. Returns
    (remote_path, staged_path, status, error_message) for audit +
    downstream cataloging of the SUCCESS rows.
    """
    import pandas as pd

    n_parts = min(len(remote_paths), spark.sparkContext.defaultParallelism) or 1
    df = spark.createDataFrame(
        [(p,) for p in remote_paths], "remote_path string"
    ).repartition(n_parts)

    def run(batches):
        import os

        fs = fs_factory()
        os.makedirs(staging_dir, exist_ok=True)
        for pdf in batches:
            staged, statuses, errors = [], [], []
            for rp in pdf["remote_path"]:
                dst = os.path.join(staging_dir, rp.replace("/", "_").lstrip("_"))
                try:
                    fs.get(rp, dst)
                    staged.append(dst); statuses.append("SUCCESS"); errors.append(None)
                except Exception as e:  # noqa: BLE001 — per-file isolation
                    staged.append(None); statuses.append("ERROR")
                    errors.append(str(e)[:200])
            yield pd.DataFrame(
                {
                    "remote_path": pdf["remote_path"],
                    "staged_path": staged,
                    "status": statuses,
                    "error_message": errors,
                }
            )

    return df.mapInPandas(
        run,
        "remote_path string, staged_path string, status string, error_message string",
    )


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
