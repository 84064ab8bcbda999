"""PySpark-native analytics engine with the query/data-processing
capabilities of ucscXena/xena-GDC-ETL, re-expressed Spark-first.

The reference (pandas, single-node) is surveyed in SURVEY.md; every operator
here is a distributed DataFrame plan designed for 100 TB scale: declarative
Column predicates (parquet pushdown), broadcast joins for dim/mapping tables,
long-format matrix model (no wide 100k-column frames), and no driver-side
collects inside operators.
"""

from xena_gdc_etl_spark.session import get_spark
from xena_gdc_etl_spark.catalog import Catalog
from xena_gdc_etl_spark.filters import FilterSpec

__version__ = "0.1.0"

__all__ = ["get_spark", "Catalog", "FilterSpec", "__version__"]
