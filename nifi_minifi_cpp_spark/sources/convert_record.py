"""ConvertRecord: record-format conversion (JSON <-> XML).

Reference: ConvertRecord.cpp:36 wires a RecordSetReader to a
RecordSetWriter (JsonTreeReader / JsonRecordSetWriter / XMLReader /
XMLRecordSetWriter, SURVEY §1.2). Spark-first, the record model is a
typed StructType and conversion is from_json/from_xml -> to_json/
to_xml — columnar, schema-checked, no per-record interpretation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convert_record(
    df: DataFrame,
    input_format: str,
    output_format: str,
    schema: str,
    content_col: str = "content",
    xml_row_tag: str = "record",
) -> DataFrame:
    """Convert ``content`` between record formats.

    schema: Spark DDL of one record (e.g. "a int, b string").
    Supported: json->xml, xml->json, json->json (normalization),
    xml->xml.
    """
    c = F.col(content_col)
    if input_format == "json":
        parsed = F.from_json(c, schema)
    elif input_format == "xml":
        parsed = F.from_xml(c, schema)
    else:
        raise ValueError(f"unsupported input format {input_format}")
    if output_format == "json":
        out = F.to_json(parsed)
    elif output_format == "xml":
        out = F.to_xml(parsed, {"rowTag": xml_row_tag})
    else:
        raise ValueError(f"unsupported output format {output_format}")
    return df.withColumn(content_col, out)
