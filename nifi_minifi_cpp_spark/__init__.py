"""PySpark-native dataflow/analytics engine with the query and
data-processing capabilities of apache/nifi-minifi-cpp.

The reference (studied at /root/reference, see SURVEY.md) is an edge
dataflow agent: a configured graph of processors moving FlowFiles
(content bytes + string attribute map). This package re-expresses that
capability surface Spark-first:

- the FlowFile becomes a row in a canonical event DataFrame
  (``model.FLOWFILE_SCHEMA``),
- each processor becomes a pure ``DataFrame -> DataFrame`` operator
  (``operators/``),
- the expression language becomes a compiler to Catalyst ``Column``
  expressions (``el/``),
- flows become composed lazy transformations (``plans.pipeline``),
- streaming semantics ride on Structured Streaming (``streaming/``).
"""

__version__ = "0.1.0"
