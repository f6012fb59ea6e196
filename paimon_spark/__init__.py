"""paimon_spark — a PySpark-native lakehouse engine with Apache Paimon's
query & data-processing semantics.

Re-creates the reference's capabilities (apache/paimon @ /root/reference)
as an idiomatic PySpark library:

- Table format: Parquet data files + JSON snapshots/manifests with
  per-file column stats (min/max/null-count) for data skipping.
  (ref: paimon-api/src/main/java/org/apache/paimon/Snapshot.java,
   paimon-core/src/main/java/org/apache/paimon/io/DataFileMeta.java)
- Primary-key tables: LSM-ish bucketed layout, merge-on-read expressed
  as Catalyst aggregations (groupBy + max_by), four merge engines.
  (ref: paimon-core/.../mergetree/compact/*MergeFunction.java)
- Append tables, partition pruning, manifest-level file skipping,
  limit/TopN-aware planning, metadata-only count/min/max.
- Row-level SQL ops (DELETE/UPDATE/MERGE INTO), time travel, tags,
  incremental reads, compaction, snapshot expiration.
- Training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) under paimon_spark.functions.

All heavy lifting is declarative DataFrame ops executed by Catalyst —
driver-side Python only touches metadata.
"""

from paimon_spark.catalog import Catalog
from paimon_spark.schema import TableSchema
from paimon_spark.jdbc_catalog import JdbcCatalog
from paimon_spark.query import LocalTableQuery
from paimon_spark.table import Table
from paimon_spark.predicates import P, Predicate

__all__ = ["Catalog", "JdbcCatalog", "LocalTableQuery", "Table",
           "TableSchema", "P", "Predicate"]
__version__ = "0.1.0"
