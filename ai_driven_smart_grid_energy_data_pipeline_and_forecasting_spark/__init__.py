"""PySpark-native rebuild of the smart-grid energy data platform.

Re-expresses the complete query/data-processing capability surface of
``byDavidB/AI-Driven-Smart-Grid-Energy-Data-Pipeline-and-Forecasting``
(medallion warehouse in Postgres + pandas ETL + FastAPI serving, see
``/root/reference``) as an idiomatic Spark DataFrame/SQL engine, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) the original never had.

Design stance (SURVEY.md §7):
- DataFrame/SQL everywhere; no RDDs. Catalyst handles pushdown/pruning.
- Session pinned to UTC; AQE on; Arrow on.
- Built-in ``pyspark.sql.functions`` in every hot path; pandas UDFs only
  for genuinely non-relational work (SARIMAX fit, binary decode).
- Tables partitioned by ``site`` (+ date at scale) so per-site predicates
  become partition pruning, mirroring the reference's ``(site, ts_utc)``
  index (reference ``infra/init.sql:16-18``).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .tables import load_tables, register_views  # noqa: F401
