"""ListFile / FetchFile / object-store list+fetch.

- ListFile (/root/reference/extensions/standard-processors/processors/
  ListFile.cpp:92-118): incremental directory listing on a persisted
  latest-modified-time watermark.
- FetchFile (FetchFile.cpp:118): resolve a path-valued attribute to
  file content.

Spark-first the fetch is a ``binaryFile`` read joined on path — the
read itself is distributed and the join is broadcast when the path
list is small. The same code works for s3a://, abfss://, gs:// paths
through Hadoop FS (the cloud List*/Fetch* processors of SURVEY §2.1
collapse into these two functions).
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ListFileState:
    """Persisted latest-timestamp watermark PLUS the keys listed at
    that exact timestamp (the reference's ListingState —
    extension-framework/src/utils/ListingStateManager.cpp:28-41): an
    object was listed already iff its mtime is OLDER than the
    watermark, or EQUAL and its key is in the listed set. A strict
    ``mtime > watermark`` check (the pre-r15 form) silently loses any
    file that lands on the same timestamp as the watermark — the
    common case on coarse-mtime filesystems and same-batch writes."""

    def __init__(self, state_path: str):
        self.state_path = state_path

    def load(self) -> tuple[float, set[str]]:
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                d = json.load(f)
            return d["latest_mtime"], set(d.get("listed_at_latest", []))
        return 0.0, set()

    def save(self, mtime: float, listed_at_latest: set[str]) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"latest_mtime": mtime, "listed_at_latest": sorted(listed_at_latest)}, f
            )
        os.replace(tmp, self.state_path)


def list_file(
    spark: SparkSession,
    pattern: str,
    state: ListFileState | None = None,
    min_size: int = 0,
) -> DataFrame | None:
    """Incremental listing: only files not listed before — newer than
    the watermark, or AT the watermark with an unseen key
    (ListingState::wasObjectListedAlready). Emits (path, filename,
    size, mtime) — FlowFile-per-file like the reference, content
    deliberately NOT read (that's FetchFile)."""
    watermark, listed = state.load() if state else (0.0, set())
    rows = []
    latest, at_latest = watermark, set(listed)
    for path in sorted(_glob.glob(pattern)):
        st = os.stat(path)
        already = st.st_mtime < watermark or (
            st.st_mtime == watermark and path in listed
        )
        if already or st.st_size < min_size:
            continue
        rows.append((path, os.path.basename(path), st.st_size, st.st_mtime))
        # ListingState::updateState: a newer timestamp resets the set
        if st.st_mtime > latest:
            latest, at_latest = st.st_mtime, {path}
        elif st.st_mtime == latest:
            at_latest.add(path)
    if not rows:
        return None
    if state:
        state.save(latest, at_latest)
    return spark.createDataFrame(rows, "path string, filename string, size long, mtime double")


def fetch_file(
    spark: SparkSession,
    listing: DataFrame,
    path_col: str = "path",
    as_text: bool = True,
) -> DataFrame:
    """FetchFile (FetchFile.cpp:118): per-row content fetch, fully
    distributed — each executor opens exactly the files its listing
    partition names (Arrow-batched mapInPandas, one FlowFile per file
    like the reference). No driver-side path collect, no scan of
    unlisted siblings; an unreadable path yields NULL content (the
    reference's ``failure`` relationship — route on
    ``content IS NULL``). For object stores where only the Hadoop
    connector has credentials, use :func:`fetch_file_scan`."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    # fresh StructType — StructType.add mutates the df's cached schema
    schema = StructType(
        list(listing.schema.fields)
        + [StructField("content", StringType() if as_text else BinaryType())]
    )

    def run(batches):
        for pdf in batches:
            contents = []
            for p in pdf[path_col]:
                try:
                    local = str(p)
                    if local.startswith("file:"):
                        local = local[len("file:"):]
                    with open(local, "rb") as f:
                        data = f.read()
                    contents.append(data.decode("utf-8", errors="replace") if as_text else data)
                except OSError:
                    contents.append(None)
            out = pdf.copy()
            out["content"] = contents
            yield out

    return listing.mapInPandas(run, schema)


def fetch_file_scan(
    spark: SparkSession,
    listing: DataFrame,
    root: str,
    path_col: str = "path",
    as_text: bool = True,
    path_glob_filter: str | None = None,
) -> DataFrame:
    """FetchFile via a distributed ``binaryFile`` scan of ``root``
    joined against the listing — the object-store path (s3a://,
    abfss://, gs://) where executors authenticate through the Hadoop
    FS layer rather than opening paths directly.

    The scan is pruned declaratively (``pathGlobFilter``), never by a
    driver-side path collect; the join drops unlisted files. Prefer
    :func:`fetch_file` when executors can open the paths themselves —
    a root scan reads every matching file under ``root`` before the
    join filters."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    files = reader.load(root)
    content = F.col("content")
    if as_text:
        content = F.decode(content, "utf-8")
    fetched = files.select(F.col("path").alias("_fetch_path"), content.alias("content"))
    # binaryFile paths are URIs (file:///...); normalize for the join
    norm = F.regexp_replace(F.col("_fetch_path"), "^file:", "")
    fetched = fetched.withColumn("_fetch_path", norm)
    return listing.join(
        fetched, listing[path_col] == fetched["_fetch_path"], "left"
    ).drop("_fetch_path")
