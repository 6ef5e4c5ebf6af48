"""Incremental source scans with persisted high-watermark state.

QueryDatabaseTable parity
(/root/reference/extensions/sql/processors/QueryDatabaseTable.cpp:35-166,
MaxCollector at extensions/sql/data/MaxCollector.h): each poll reads
only rows where the max-value columns advanced past the persisted
state, then updates the state to the new per-column maxima and stamps
``maxvalue.<col>`` attributes on the batch.

The reference keeps state in a StateManager KV store
(minifi-api/include/minifi-cpp/core/StateManager.h); here it is a JSON
file (swap for a checkpoint dir / Delta table on a cluster). The scan
itself is pluggable: any ``(spark) -> DataFrame`` — a parquet table,
``spark.read.jdbc`` with pushdown predicates, anything Catalyst can
filter. The watermark predicate is applied BEFORE the action, so for
JDBC sources it pushes into the remote WHERE clause.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalTableScan:
    def __init__(
        self,
        read_fn: Callable[[SparkSession], DataFrame],
        max_value_columns: list[str],
        state_path: str,
        initial_max_values: dict[str, object] | None = None,
    ):
        """``initial_max_values`` mirrors the ``initial.maxvalue.<col>``
        dynamic properties (QueryDatabaseTable.cpp:80-116)."""
        self.read_fn = read_fn
        self.max_value_columns = max_value_columns
        self.state_path = state_path
        self._initial = initial_max_values or {}

    # -- state ----------------------------------------------------------------
    def load_state(self) -> dict[str, object]:
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                return json.load(f)
        return dict(self._initial)

    def save_state(self, state: dict[str, object]) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    def clear_state(self) -> None:
        if os.path.exists(self.state_path):
            os.remove(self.state_path)

    # -- polling --------------------------------------------------------------
    def poll(self, spark: SparkSession) -> DataFrame | None:
        """One incremental scan. Returns only-new rows (None when
        empty) and advances the persisted watermark. The watermark
        filter is a Catalyst predicate -> pushdown-eligible.
        """
        state = self.load_state()
        df = self.read_fn(spark)
        for col in self.max_value_columns:
            if col in state and state[col] is not None:
                df = df.filter(F.col(col) > F.lit(state[col]))
        return self._advance(df, state)

    def _advance(self, df: DataFrame, state: dict[str, object]) -> DataFrame | None:
        """MaxCollector semantics (extensions/sql/data/MaxCollector.h):
        collect the per-column maxima of the already-filtered batch,
        persist them, and stamp ``maxvalue.<col>`` attributes."""
        maxima = df.agg(
            *[F.max(c).alias(c) for c in self.max_value_columns]
        ).first()
        if maxima is None or all(maxima[c] is None for c in self.max_value_columns):
            return None
        new_state = dict(state)
        for c in self.max_value_columns:
            if maxima[c] is not None:
                v = maxima[c]
                new_state[c] = v.isoformat() if hasattr(v, "isoformat") else v
        self.save_state(new_state)
        out = df
        for c in self.max_value_columns:
            out = out.withColumn(f"maxvalue.{c}", F.lit(new_state[c]).cast("string"))
        return out


class ServerFilteredTableScan(IncrementalTableScan):
    """QueryDatabaseTable against a REMOTE SQL server where the
    watermark predicate must land in the SERVER's WHERE clause — the
    reference renders ``SELECT ... WHERE maxcol > :state`` into the
    SOCI statement it ships to the database
    (QueryDatabaseTable.cpp:120-166), so only new rows ever cross the
    wire. ``query_fn(spark, where_sql)`` runs the table query with the
    rendered WHERE fragment ('' on the first poll) and returns the
    fetched DataFrame; ``literal_fn`` renders a persisted state value
    as a server-dialect SQL literal (e.g. pg_wire.pg_literal)."""

    def __init__(
        self,
        query_fn: Callable[[SparkSession, str], DataFrame],
        max_value_columns: list[str],
        state_path: str,
        literal_fn: Callable[[object], str],
        initial_max_values: dict[str, object] | None = None,
    ):
        super().__init__(
            read_fn=lambda spark: (_ for _ in ()).throw(
                RuntimeError("ServerFilteredTableScan reads via query_fn")
            ),
            max_value_columns=max_value_columns,
            state_path=state_path,
            initial_max_values=initial_max_values,
        )
        self.query_fn = query_fn
        self.literal_fn = literal_fn

    def poll(self, spark: SparkSession) -> DataFrame | None:
        state = self.load_state()
        conds = [
            f'"{c}" > {self.literal_fn(state[c])}'
            for c in self.max_value_columns
            if state.get(c) is not None
        ]
        where = f" WHERE {' AND '.join(conds)}" if conds else ""
        return self._advance(self.query_fn(spark, where), state)


def parquet_table_reader(path: str) -> Callable[[SparkSession], DataFrame]:
    def read(spark: SparkSession) -> DataFrame:
        return spark.read.parquet(path)

    return read


def jdbc_table_reader(url: str, table: str, **options) -> Callable[[SparkSession], DataFrame]:
    """spark.read.jdbc-backed reader — the watermark predicate from
    IncrementalTableScan pushes into the generated remote query
    (ExecuteSQL/QueryDatabaseTable's SELECT ... WHERE maxcol > :state)."""

    def read(spark: SparkSession) -> DataFrame:
        return (
            spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()
        )

    return read
