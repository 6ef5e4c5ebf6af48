"""Key-value store fetch/put: GetCouchbaseKey / PutCouchbaseKey.

Reference: /root/reference/extensions/couchbase/processors/
GetCouchbaseKey.cpp:32, PutCouchbaseKey.cpp:34 — fetch/store one
document per FlowFile by a key derived from an attribute, routing
success/failure (+ retry on transient KV errors).

Spark-first: a KV fetch is a per-row enrichment — mapInPandas with one
client per partition (the broadcast-lookup-join analogue of SURVEY
§2.7 when the store can't be snapshotted as a DataFrame). The client
library (couchbase) is import-gated; fakes inject via
``client_factory`` exactly like the SFTP/HTTP adapters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def couchbase_client_factory(connection_string: str, bucket: str, **kw):
    """Import-gated couchbase client factory."""
    try:
        import couchbase  # noqa: F401  type: ignore[import-not-found]
    except ImportError as e:
        raise ImportError(
            "Couchbase support needs the couchbase client library, which is "
            "not installed in this environment; inject a client via "
            "client_factory instead"
        ) from e

    def factory():  # pragma: no cover - requires cluster
        from couchbase.auth import PasswordAuthenticator
        from couchbase.cluster import Cluster

        cluster = Cluster(connection_string, authenticator=PasswordAuthenticator(**kw))
        return cluster.bucket(bucket).default_collection()

    return factory


def get_kv_key(
    df: DataFrame,
    client_factory,
    key_col: str = "key",
    value_col: str = "content",
) -> DataFrame:
    """GetCouchbaseKey (GetCouchbaseKey.cpp:32): fetch each row's key
    executor-side; append the value and ``kv_status`` in
    {success, not.found, failure}. The injected client needs
    ``get(key) -> str|bytes`` raising KeyError/FileNotFoundError for
    missing keys."""
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(value_col, StringType()), StructField("kv_status", StringType())]
    )

    def run(batches):
        client = client_factory()
        for pdf in batches:
            values, statuses = [], []
            for key in pdf[key_col]:
                try:
                    v = client.get(str(key))
                    values.append(v.decode("utf-8", errors="replace") if isinstance(v, bytes) else str(v))
                    statuses.append("success")
                except (KeyError, FileNotFoundError):
                    values.append(None)
                    statuses.append("not.found")
                except Exception:
                    values.append(None)
                    statuses.append("failure")
            out = pdf.copy()
            out[value_col] = values
            out["kv_status"] = statuses
            yield out

    return df.mapInPandas(run, out_schema)


def put_kv_key(client_factory, key_col: str = "key", value_col: str = "content"):
    """PutCouchbaseKey (PutCouchbaseKey.cpp:34): store each row's
    content under its key, executor-side per partition. Returns a
    foreachBatch-style handler. The injected client needs
    ``upsert(key, value)``."""

    def handler(batch_df: DataFrame, epoch_id: int) -> None:
        def send(rows) -> None:
            client = client_factory()
            for row in rows:
                if row[value_col] is None:
                    continue
                client.upsert(str(row[key_col]), row[value_col])

        batch_df.select(key_col, value_col).foreachPartition(send)

    return handler
