"""List/Fetch over remote file protocols: SFTP and SMB.

Reference parity:
- ListSFTP (/root/reference/extensions/sftp/processors/ListSFTP.cpp:781):
  incremental remote listing on a persisted latest-modified-time
  watermark (the Tracking Timestamps strategy), name filter, min size.
- FetchSFTP (FetchSFTP.cpp:57) / FetchSmb, PutSFTP/PutSmb
  (PROCESSORS.md:1019,1692): per-row content fetch with the
  success / comms.failure / not.found / permission.denied
  relationship split.

Spark-first split: LISTING is driver-side metadata work (small, like
the reference's single agent), while FETCH runs executor-side via
mapInPandas — one connection per partition, content loads in parallel,
no driver collect. Protocol clients (paramiko for SFTP, smbprotocol
for SMB) are import-gated: every adapter takes a ``client_factory`` so
tests inject fakes and real deployments pass the gated constructors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .fetch_file import ListFileState


@dataclass
class RemoteEntry:
    path: str
    size: int
    mtime: float
    is_dir: bool = False


def sftp_client_factory(host: str, port: int = 22, username: str | None = None, **kw):
    """Import-gated paramiko SFTP client factory (FetchSFTP.cpp:57).
    Returns a zero-arg factory suitable for ``fetch_remote`` —
    connections open lazily on the executors, never on the driver."""
    try:
        import paramiko  # noqa: F401  type: ignore[import-not-found]
    except ImportError as e:
        raise ImportError(
            "SFTP support needs paramiko, which is not installed in this "
            "environment; inject a client via client_factory instead"
        ) from e

    def factory():  # pragma: no cover - requires network
        import paramiko

        transport = paramiko.Transport((host, port))
        transport.connect(username=username, **kw)
        return paramiko.SFTPClient.from_transport(transport)

    return factory


def smb_client_factory(server: str, share: str, **kw):
    """Import-gated smbprotocol client factory (FetchSmb/ListSmb,
    PROCESSORS.md:1692)."""
    try:
        import smbclient  # noqa: F401  type: ignore[import-not-found]
    except ImportError as e:
        raise ImportError(
            "SMB support needs smbprotocol, which is not installed in this "
            "environment; inject a client via client_factory instead"
        ) from e

    def factory():  # pragma: no cover - requires network
        import smbclient

        smbclient.register_session(server, **kw)
        return smbclient

    return factory


def list_remote(
    spark: SparkSession,
    client,
    directory: str,
    state: ListFileState | None = None,
    name_filter: str | None = None,
    min_size: int = 0,
    recurse: bool = True,
) -> DataFrame | None:
    """ListSFTP Tracking Timestamps strategy (ListSFTP.cpp:781): emit
    only entries newer than the persisted watermark; FlowFile-per-file
    metadata (path, filename, size, mtime) — content is FetchRemote's
    job. ``client`` needs ``listdir(path) -> iterable[RemoteEntry]``.
    """
    import posixpath
    import re

    watermark, listed = state.load() if state else (0.0, set())
    pattern = re.compile(name_filter) if name_filter else None
    rows: list[tuple[str, str, int, float]] = []
    latest, at_latest = watermark, set(listed)

    def walk(path: str) -> None:
        nonlocal latest, at_latest
        for entry in client.listdir(path):
            if entry.is_dir:
                if recurse:
                    walk(entry.path)
                continue
            name = posixpath.basename(entry.path)
            if pattern and not pattern.search(name):
                continue
            # ListingState::wasObjectListedAlready (r15): same-timestamp
            # unseen keys are still listable — strict > lost them
            already = entry.mtime < watermark or (
                entry.mtime == watermark and entry.path in listed
            )
            if already or entry.size < min_size:
                continue
            rows.append((entry.path, name, int(entry.size), float(entry.mtime)))
            if entry.mtime > latest:
                latest, at_latest = entry.mtime, {entry.path}
            elif entry.mtime == latest:
                at_latest.add(entry.path)

    walk(directory)
    if not rows:
        return None
    if state:
        state.save(latest, at_latest)
    return spark.createDataFrame(rows, "path string, filename string, size long, mtime double")


def fetch_remote(
    df: DataFrame,
    client_factory,
    path_col: str = "path",
    as_text: bool = True,
) -> DataFrame:
    """FetchSFTP/FetchSmb (FetchSFTP.cpp:57): fetch each row's remote
    path executor-side (one client per partition via mapInPandas) and
    append ``content`` plus ``fetch_status`` in {success, not.found,
    permission.denied, comms.failure} — the reference's relationship
    names. Route with :func:`route_fetch_remote`.

    The injected client needs ``read(path) -> bytes`` raising
    FileNotFoundError / PermissionError for the typed failure routes.
    """
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("content", StringType() if as_text else BinaryType()),
            StructField("fetch_status", StringType()),
        ]
    )

    def run(batches):
        client = client_factory()
        for pdf in batches:
            contents, statuses = [], []
            for path in pdf[path_col]:
                try:
                    data = client.read(path)
                    contents.append(
                        data.decode("utf-8", errors="replace") if as_text else bytes(data)
                    )
                    statuses.append("success")
                except FileNotFoundError:
                    contents.append(None)
                    statuses.append("not.found")
                except PermissionError:
                    contents.append(None)
                    statuses.append("permission.denied")
                except Exception:
                    contents.append(None)
                    statuses.append("comms.failure")
            out = pdf.copy()
            out["content"] = contents
            out["fetch_status"] = statuses
            yield out

    return df.mapInPandas(run, out_schema)


def route_fetch_remote(df: DataFrame, status_col: str = "fetch_status") -> dict[str, DataFrame]:
    """Relationship split for fetch results (FetchSFTP.h relationship
    set). Same dict-of-frames contract as RouteOnAttribute.

    Batch frames barrier first: the input lineage holds the
    side-effecting remote fetch, and consuming several relationships
    would otherwise re-fetch per relationship — a transiently-failing
    path could then land in two relationships (or neither)."""
    from pyspark.sql import functions as F

    if not df.isStreaming:
        df = df.localCheckpoint(eager=True)
    return {
        name: df.filter(F.col(status_col) == name)
        for name in ("success", "not.found", "permission.denied", "comms.failure")
    }


def put_remote(df: DataFrame, client_factory, path_col: str = "path", content_col: str = "content"):
    """PutSFTP/PutSmb (PutSFTP.cpp:311): write each row's content to
    its remote path, executor-side per partition. The injected client
    needs ``write(path, data: bytes)``. Returns a foreachPartition
    handler-style callable for use under foreachBatch."""

    def handler(batch_df: DataFrame, epoch_id: int) -> None:
        def send(rows) -> None:
            client = client_factory()
            for row in rows:
                payload = row[content_col]
                if payload is None:
                    continue
                data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
                client.write(row[path_col], data)

        batch_df.select(path_col, content_col).foreachPartition(send)

    return handler
