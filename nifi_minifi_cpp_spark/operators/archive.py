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
