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


def convert_record_with_services(
    df: DataFrame,
    reader: dict,
    writer: dict,
    schema: str,
    content_col: str = "content",
) -> DataFrame:
    """ConvertRecord wired through resolved record reader/writer
    controller services (plans.services: JsonTreeReader /
    JsonRecordSetWriter / XMLReader / XMLRecordSetWriter option dicts
    per CONTROLLERS.md), the reference's actual wiring
    (ConvertRecord.cpp:36 takes a Record Reader and a Record Set
    Writer service, not format strings).

    Reader options (``attributePrefix``/``valueTag`` for XML) go to
    ``from_xml`` verbatim. Writer semantics: JSON ``Array`` grouping
    wraps each record in a one-element array (CONTROLLERS.md: "even a
    single row ... written as an array"), ``One Line Per Object``
    writes the bare object; XML gets ``rowTag``/``arrayElementName``.
    Pretty-printed JSON has no Catalyst form — that one option drops
    to an Arrow-batched reindent of the already-converted compact
    JSON (documented slow path, off by default).
    """
    if reader.get("record_io") != "reader" or writer.get("record_io") != "writer":
        raise ValueError("convert_record_with_services needs a resolved reader and writer service")
    c = F.col(content_col)
    if reader["format"] == "json":
        parsed = F.from_json(c, schema)
    else:
        opts = {k: v for k, v in reader["options"].items() if v is not None}
        parsed = F.from_xml(c, schema, opts)
    if writer["format"] == "json":
        if writer["options"].get("grouping") == "array":
            out = F.to_json(F.array(parsed))
        else:
            out = F.to_json(parsed)
        res = df.withColumn(content_col, out)
        if writer["options"].get("pretty"):
            from pyspark.sql import functions as _F
            from pyspark.sql.types import StringType

            @_F.pandas_udf(StringType())
            def _reindent(s):
                import json as _json

                return s.map(lambda x: _json.dumps(_json.loads(x), indent=2) if x else x)

            res = res.withColumn(content_col, _reindent(F.col(content_col)))
        return res
    out = F.to_xml(parsed, {k: str(v) for k, v in writer["options"].items()})
    return df.withColumn(content_col, out)
