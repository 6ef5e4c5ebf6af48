"""Source-side operators: incremental scans, SQL, record conversion
(SURVEY §2.1 ExecuteSQL/QueryDatabaseTable, §2.5 ConvertRecord)."""

from .convert_record import convert_record
from .fetch_file import ListFileState, fetch_file, fetch_file_scan, list_file
from .objectstore import (
    delete_object_store,
    fetch_object_store,
    list_object_store,
    put_object_store,
)
from .k8s import (
    collect_pod_metrics,
    filter_pod_metrics,
    parse_cpu_nanocores,
    parse_memory_bytes,
    pod_metrics_table,
)
from .procfs import ProcFs, procfs_monitor
from .industrial import (
    ModbusRead,
    OpcLazyState,
    OpcNode,
    fetch_modbus_tcp,
    fetch_opc,
    parse_modbus_address,
    put_opc,
)
from .datasource import (
    ListenHTTPDataSource,
    ListenTCPDataSource,
    ListenUDPDataSource,
    TailFileDataSource,
    register_listeners,
    register_tailfile,
)
from .tail_file import TailFile
from .incremental import IncrementalTableScan, jdbc_table_reader, parquet_table_reader
from .kafka_wire import (
    MiniKafkaBroker,
    MiniKafkaClient,
    publish_kafka_wire_handler,
    register_kafkawire,
)
from .kv import couchbase_client_factory, get_kv_key, put_kv_key
from .mqtt_wire import (
    MiniMqttBroker,
    MqttWireClient,
    mqtt_wire_client_factory,
)
from .process import execute_process
from .remote_fs import (
    RemoteEntry,
    fetch_remote,
    list_remote,
    put_remote,
    route_fetch_remote,
    sftp_client_factory,
    smb_client_factory,
)
from .sql import execute_sql, put_sql

__all__ = [
    "IncrementalTableScan",
    "parquet_table_reader",
    "jdbc_table_reader",
    "execute_sql",
    "execute_process",
    "put_sql",
    "convert_record",
    "TailFile",
    "list_file",
    "fetch_file",
    "fetch_file_scan",
    "OpcNode",
    "OpcLazyState",
    "fetch_opc",
    "put_opc",
    "ModbusRead",
    "parse_modbus_address",
    "fetch_modbus_tcp",
    "ProcFs",
    "list_object_store",
    "fetch_object_store",
    "put_object_store",
    "delete_object_store",
    "procfs_monitor",
    "collect_pod_metrics",
    "filter_pod_metrics",
    "pod_metrics_table",
    "parse_cpu_nanocores",
    "parse_memory_bytes",
    "ListFileState",
    "TailFileDataSource",
    "register_tailfile",
    "register_listeners",
    "ListenUDPDataSource",
    "ListenTCPDataSource",
    "ListenHTTPDataSource",
    "RemoteEntry",
    "list_remote",
    "fetch_remote",
    "route_fetch_remote",
    "put_remote",
    "sftp_client_factory",
    "smb_client_factory",
    "couchbase_client_factory",
    "get_kv_key",
    "put_kv_key",
]
