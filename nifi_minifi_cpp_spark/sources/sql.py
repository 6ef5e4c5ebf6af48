"""ExecuteSQL / PutSQL analogs over the engine's SQL surface.

ExecuteSQL (/root/reference/extensions/sql/processors/ExecuteSQL.cpp:41-81)
runs a SELECT and emits rowsets as JSON FlowFiles, honoring ``Max Rows
Per Flow File``. Here the SELECT runs on Spark SQL (registered views /
catalog tables / JDBC), and the rowset->JSON shaping is columnar:
to_json per row, chunked with a row_number window, assembled with the
same ordered-collect pattern the merge operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def execute_sql(
    spark: SparkSession,
    query: str,
    max_rows_per_flowfile: int = 0,
) -> DataFrame:
    """Run SQL; shape the rowset as canonical FlowFiles whose content
    is a JSON-lines document of up to ``max_rows_per_flowfile`` rows
    (0 = one FlowFile with everything, as the reference defaults).
    Emits ``executesql.row.count`` attribute parity.
    """
    result = spark.sql(query)
    jsonified = result.select(F.to_json(F.struct(*[F.col(c) for c in result.columns])).alias("_row"))
    jsonified = jsonified.withColumn("_rn", F.monotonically_increasing_id())
    if max_rows_per_flowfile > 0:
        w = Window.orderBy("_rn")
        chunk = F.floor((F.row_number().over(w) - 1) / max_rows_per_flowfile)
    else:
        chunk = F.lit(0)
    grouped = (
        jsonified.withColumn("_chunk", chunk)
        .groupBy("_chunk")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("_rn"), F.col("_row").alias("_r")))),
                    lambda s: s.getField("_r"),
                ),
                "\n",
            ).alias("content"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return grouped.select(
        F.concat(F.lit("sql-"), F.col("_chunk").cast("string")).alias("uuid"),
        F.current_timestamp().alias("ts"),
        F.col("content"),
        F.create_map(
            F.lit("executesql.row.count"), F.col("_n").cast("string")
        ).alias("attributes"),
        F.array().cast("array<string>").alias("lineage"),
    )


def put_sql(df: DataFrame, table: str, mode: str = "append", **writer_options) -> None:
    """PutSQL analog (extensions/sql/processors/PutSQL.cpp:37): batch
    DML becomes a table write; for JDBC targets pass
    format='jdbc', url=..., dbtable=... via writer_options."""
    fmt = writer_options.pop("format", None)
    writer = df.write.mode(mode)
    if fmt:
        writer = writer.format(fmt).options(**writer_options)
        writer.save()
    else:
        writer.saveAsTable(table)
