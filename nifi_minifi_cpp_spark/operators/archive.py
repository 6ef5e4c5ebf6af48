"""Archive operators: MergeContent TAR/ZIP formats + archive unpack.

Reference: MergeContent's archive merge formats (MergeContent.h:65,
241-252) and ManipulateArchive / FocusArchiveEntry
(/root/reference/extensions/standard-processors/processors/
ManipulateArchive.cpp:95). libarchive's role is played by Python's
zipfile/tarfile inside Arrow-batched functions — archives are a
per-row byte transformation, inherently Python-friendly and off the
hot analytical path.
"""

from __future__ import annotations

import io
import tarfile
import zipfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_content_archive(
    df: DataFrame,
    fmt: str = "zip",
    id_col: str = "uuid",
    name_attr: str = "filename",
    group_col: str | None = None,
) -> DataFrame:
    """MergeContent with TAR/ZIP merge format: bundle rows into one
    archive per group (single group when group_col is None). Entry
    names come from the ``filename`` attribute, falling back to the
    row id.
    """
    import pandas as pd

    grouped = df.select(
        (F.col(group_col) if group_col else F.lit("all")).alias("_g"),
        F.col(id_col).alias("_id"),
        F.coalesce(F.col("attributes").getItem(name_attr), F.col(id_col)).alias("_name"),
        F.col("content"),
    )

    out_schema = T.StructType(
        [
            T.StructField("group", T.StringType()),
            T.StructField("archive", T.BinaryType()),
            T.StructField("n_entries", T.IntegerType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        buf = io.BytesIO()
        if fmt == "zip":
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
                for _, row in pdf.iterrows():
                    z.writestr(str(row["_name"]), str(row["content"]))
        elif fmt == "tar":
            with tarfile.open(fileobj=buf, mode="w") as t:
                for _, row in pdf.iterrows():
                    data = str(row["content"]).encode()
                    info = tarfile.TarInfo(name=str(row["_name"]))
                    info.size = len(data)
                    t.addfile(info, io.BytesIO(data))
        else:
            raise ValueError(f"unsupported archive format {fmt}")
        return pd.DataFrame(
            {"group": [pdf["_g"].iloc[0]], "archive": [buf.getvalue()], "n_entries": [len(pdf)]}
        )

    return grouped.groupBy("_g").applyInPandas(pack, out_schema)


class ArchiveOpError(ValueError):
    """Invalid ManipulateArchive configuration (ManipulateArchive.cpp:52-92)."""


def _read_entries(data: bytes, fmt: str) -> list[tuple[str, bytes]]:
    if fmt == "zip":
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            return [(name, z.read(name)) for name in z.namelist()]
    if fmt == "tar":
        with tarfile.open(fileobj=io.BytesIO(data)) as t:
            return [(m.name, t.extractfile(m).read()) for m in t.getmembers() if m.isfile()]
    raise ValueError(f"unsupported archive format {fmt}")


def _write_entries(entries: list[tuple[str, bytes]], fmt: str) -> bytes:
    buf = io.BytesIO()
    if fmt == "zip":
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            for name, data in entries:
                z.writestr(name, data)
    elif fmt == "tar":
        with tarfile.open(fileobj=buf, mode="w") as t:
            for name, data in entries:
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                t.addfile(info, io.BytesIO(data))
    else:
        raise ValueError(f"unsupported archive format {fmt}")
    return buf.getvalue()


def validate_archive_op(
    operation: str, target: str | None, destination: str | None, before: str | None, after: str | None
) -> None:
    """Property validation, ManipulateArchive.cpp:52-92: create-ops
    (copy/move/touch) require a destination and remove forbids one;
    touch forbids a target while every other op requires one; before
    and after are mutually exclusive."""
    op_create = operation in ("copy", "move", "touch")
    if not op_create and operation != "remove":
        raise ArchiveOpError(f"invalid operation {operation!r}")
    if op_create == (not destination):
        raise ArchiveOpError(f"a destination is required for {operation}" if op_create
                             else "remove does not take a destination")
    if (operation == "touch") != (not target):
        raise ArchiveOpError(f"a target is required for {operation}" if operation != "touch"
                             else "touch does not take a target")
    if before and after:
        raise ArchiveOpError("cannot specify both before and after")


def edit_archive_entries(
    entries: list[tuple[str, bytes]],
    operation: str,
    target: str | None = None,
    destination: str | None = None,
    before: str | None = None,
    after: str | None = None,
) -> list[tuple[str, bytes]] | None:
    """The pure in-place entry edit (ManipulateArchive.cpp:95-180).

    Returns the new entry list, or None for the run-time failure routes
    (missing target, destination already exists). Position semantics:
    before/after name an existing entry; a missing position entry
    appends to the end, matching the reference's warning path."""
    names = [n for n, _ in entries]
    if operation != "touch" and target not in names:
        return None  # -> failure relationship
    if destination and destination in names:
        return None  # existing destination -> failure
    out = list(entries)
    pos = len(out)
    if (before or after) and operation != "remove":
        anchor = after or before
        if anchor in names:
            pos = names.index(anchor) + (1 if after else 0)
    if operation == "remove":
        out = [(n, d) for n, d in out if n != target]
    elif operation == "touch":
        out.insert(pos, (destination, b""))
    elif operation == "copy":
        data = dict(entries)[target]
        out.insert(pos, (destination, data))
    elif operation == "move":
        data = dict(entries)[target]
        idx = names.index(target)
        out = [(n, d) for n, d in out if n != target]
        if pos > idx:
            pos -= 1
        out.insert(pos, (destination, data))
    else:
        raise ArchiveOpError(f"invalid operation {operation!r}")
    return out


def manipulate_archive(
    df: DataFrame,
    operation: str,
    target: str | None = None,
    destination: str | None = None,
    before: str | None = None,
    after: str | None = None,
    fmt: str = "zip",
    archive_col: str = "archive",
) -> dict[str, DataFrame]:
    """ManipulateArchive (ManipulateArchive.cpp:95): touch/remove/copy/
    move one entry inside each row's archive. Config errors raise at
    compile time; per-row failures (missing target, existing
    destination) route to ``failure`` with the archive untouched —
    the reference's success/failure relationship pair."""
    import pandas as pd

    validate_archive_op(operation, target, destination, before, after)
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("_archive_ok", T.BooleanType())])

    def run(batches):
        for pdf in batches:
            oks, archives = [], []
            for blob in pdf[archive_col]:
                entries = _read_entries(bytes(blob), fmt)
                edited = edit_archive_entries(entries, operation, target, destination, before, after)
                if edited is None:
                    oks.append(False)
                    archives.append(bytes(blob))
                else:
                    oks.append(True)
                    archives.append(_write_entries(edited, fmt))
            out = pdf.copy()
            out[archive_col] = archives
            out["_archive_ok"] = oks
            yield out

    edited = df.mapInPandas(run, out_schema)
    return {
        "success": edited.filter(F.col("_archive_ok")).drop("_archive_ok"),
        "failure": edited.filter(~F.col("_archive_ok")).drop("_archive_ok"),
    }


def focus_archive_entry(
    df: DataFrame, target: str, fmt: str = "zip", archive_col: str = "archive"
) -> DataFrame:
    """FocusArchiveEntry (FocusArchiveEntry.cpp:53): expose one entry's
    bytes as the row's ``content`` so downstream content operators work
    on it; the archive rides along for unfocus."""
    import pandas as pd

    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("content", T.StringType())])

    def run(batches):
        for pdf in batches:
            contents = []
            for blob in pdf[archive_col]:
                data = dict(_read_entries(bytes(blob), fmt)).get(target)
                contents.append(data.decode("utf-8", errors="replace") if data is not None else None)
            out = pdf.copy()
            out["content"] = contents
            yield out

    return df.mapInPandas(run, out_schema)


def unfocus_archive_entry(
    df: DataFrame, target: str, fmt: str = "zip", archive_col: str = "archive", content_col: str = "content"
) -> DataFrame:
    """UnfocusArchiveEntry (UnfocusArchiveEntry.cpp:47): write the
    (possibly transformed) ``content`` back over the focused entry and
    re-pack; every other entry's bytes are preserved."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            archives = []
            for blob, content in zip(pdf[archive_col], pdf[content_col]):
                entries = _read_entries(bytes(blob), fmt)
                entries = [
                    (n, str(content).encode() if n == target else d) for n, d in entries
                ]
                archives.append(_write_entries(entries, fmt))
            out = pdf.drop(columns=[content_col]).copy()
            out[archive_col] = archives
            yield out

    out_fields = [f for f in df.schema.fields if f.name != content_col]
    return df.mapInPandas(run, T.StructType(out_fields))


def unpack_archive(df: DataFrame, fmt: str = "zip", archive_col: str = "archive") -> DataFrame:
    """ManipulateArchive/UnpackContent shape: one row per archive
    entry (entry_name, content)."""
    import pandas as pd

    out_schema = "group string, entry_name string, content string"

    def unpack(batches):
        for pdf in batches:
            rows = {"group": [], "entry_name": [], "content": []}
            for _, row in pdf.iterrows():
                data = bytes(row[archive_col])
                if fmt == "zip":
                    with zipfile.ZipFile(io.BytesIO(data)) as z:
                        for name in z.namelist():
                            rows["group"].append(row.get("group", ""))
                            rows["entry_name"].append(name)
                            rows["content"].append(z.read(name).decode("utf-8", errors="replace"))
                elif fmt == "tar":
                    with tarfile.open(fileobj=io.BytesIO(data)) as t:
                        for member in t.getmembers():
                            rows["group"].append(row.get("group", ""))
                            rows["entry_name"].append(member.name)
                            rows["content"].append(
                                t.extractfile(member).read().decode("utf-8", errors="replace")
                            )
                else:
                    raise ValueError(f"unsupported archive format {fmt}")
            yield pd.DataFrame(rows)

    return df.mapInPandas(unpack, out_schema)
