"""RecordTransform / FlowFileTransform: the user-scripting surface.

ExecutePythonProcessor parity (/root/reference/extensions/python/
PYTHON.md, ExecutePythonProcessor.cpp): NiFi-style Python processors
subclass FlowFileTransform/RecordTransform with a transform() method
returning (relationship, contents, attributes). Spark-first, the same
contract rides mapInPandas — Arrow batches in, Arrow batches out, one
Python roundtrip per batch instead of per record.

ExecuteScript's full-session surface (create/route/clone FlowFiles)
maps to returning zero..N records per input (flat-map semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


class FlowFileTransform:
    """Subclass and override transform(). Return a dict to replace the
    record, a list of dicts to fan out, or None to drop (the
    reference's REL_FAILURE/drop path)."""

    def transform(self, record: dict) -> dict | list[dict] | None:  # pragma: no cover - interface
        raise NotImplementedError


def apply_record_transform(
    df: DataFrame,
    transform: FlowFileTransform | Callable[[dict], dict | list[dict] | None],
    output_schema: str,
) -> DataFrame:
    """Run a record transform over the frame via mapInPandas.

    ``output_schema`` is a Spark DDL string; returned dicts must carry
    those keys. Records pass through Arrow in vectorized batches; the
    python fn runs once per record but with zero serde framing cost
    beyond Arrow's.
    """
    fn = transform.transform if isinstance(transform, FlowFileTransform) else transform

    def run(batches: Iterable):
        import pandas as pd

        for pdf in batches:
            out_rows: list[dict] = []
            for record in pdf.to_dict(orient="records"):
                result = fn(record)
                if result is None:
                    continue
                if isinstance(result, dict):
                    out_rows.append(result)
                else:
                    out_rows.extend(result)
            if out_rows:
                yield pd.DataFrame(out_rows)
            else:
                names = [f.strip().split(" ")[0] for f in output_schema.split(",")]
                yield pd.DataFrame({n: [] for n in names})

    from ..util import spread_for_cpu

    return spread_for_cpu(df).mapInPandas(run, output_schema)


def lua_record_transform(
    df: DataFrame, script: str, output_schema: str
) -> DataFrame:
    """ExecuteScript with Script Engine=lua
    (/root/reference/extensions/script/ExecuteScript.cpp:41
    LuaScriptExecutor): the Lua script defines
    ``transform(record) -> table|nil`` over a record table, the Lua
    analogue of FlowFileTransform.

    Import-gated on ``lupa`` (LuaJIT bindings), which is not installed
    in every environment — the gate raises a clear ImportError at plan
    time, not mid-task on an executor. When available, the runtime is
    created per Arrow batch inside mapInPandas, so scripts run
    executor-side like every other record transform.
    """
    try:
        import lupa  # noqa: F401  type: ignore[import-not-found]
    except ImportError as e:
        raise ImportError(
            "ExecuteScript(lua) needs the 'lupa' LuaJIT bindings, which are "
            "not installed in this environment; use the Python "
            "FlowFileTransform surface (apply_record_transform) instead"
        ) from e

    def fn(record: dict):
        from lupa import LuaRuntime  # type: ignore[import-not-found]

        lua = LuaRuntime(unpack_returned_tuples=True)
        lua.execute(script)
        result = lua.globals().transform(lua.table_from(record))
        return dict(result) if result is not None else None

    return apply_record_transform(df, fn, output_schema)
