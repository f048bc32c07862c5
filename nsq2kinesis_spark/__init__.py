"""nsq2kinesis_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query / data-processing capabilities of the
reference stream processor (daroot/nsq2kinesis, surveyed in SURVEY.md) as an
idiomatic PySpark engine:

- batch analytics surface (SURVEY.md §2B) as composable DataFrame builders,
  each with a DuckDB-oracle SQL twin (``nsq2kinesis_spark.registry``);
- the reference's streaming semantics (dedup, oversize filter, partition-key
  projection, KPL record packing, Kinesis-shaped sink, NSQ-shaped source)
  re-expressed on Structured Streaming (``nsq2kinesis_spark.streaming``);
- LLM-data-pipeline operators (near-dup detection, vector similarity search,
  text analysis, multimodal column plumbing) designed for 100 TB scale.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning, join
selection and codegen; Python only appears at the edges (sink packing, a few
Pandas UDFs where Spark lacks the primitive).
"""

__version__ = "0.1.0"

# Spark's Python workers are separate processes that must import this package
# to unpickle shipped closures (Python DataSource readers, mapInPandas sink
# packers). Export our location so workers resolve it regardless of the
# driver's cwd. (Cluster deployments ship the package via --py-files; this
# covers local/driver-harness runs.)
import os as _os
import sys as _sys

_pkg_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_existing = _os.environ.get("PYTHONPATH", "")
if _pkg_parent not in _existing.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        f"{_pkg_parent}{_os.pathsep}{_existing}" if _existing else _pkg_parent
    )
if _pkg_parent not in _sys.path:
    _sys.path.insert(0, _pkg_parent)
