"""``SparkAPI`` — drop-in stand-in for the reference's db-api workflow
(reference internals/database_api.py:60-431 + spark/database_api.py:29-120).

The reference routes every table through a backend object::

    db_api = SparkAPI(spark_session=spark)
    df = db_api.register(pdf, dataset_display_name="my_data")
    linker = Linker(df, settings)

In this engine tables ARE Spark DataFrames, so the shim's job is input
coercion (pandas / list-of-dicts / registered view names / CSV paths →
DataFrame), display-name bookkeeping (the ``source_dataset`` labels in link
jobs), UDF registration, and mapping ``break_lineage_method`` onto
:class:`~splink_spark.internals.materialize.MaterializationPolicy`. No SQL
templating layer exists to back: queries compile to Column expressions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .internals.functions import register_udfs
from .internals.materialize import MaterializationPolicy

_BREAK_LINEAGE_METHODS = {
    None: "persist",
    "persist": "persist",
    "cache": "persist",
    "localcheckpoint": "local_checkpoint",
    "local_checkpoint": "local_checkpoint",
    "checkpoint": "checkpoint",
    "parquet": "parquet",
    "delta_lake_files": "parquet",  # no delta in this container; parquet files
    "delta_lake_table": "parquet",
}


class SparkAPI:
    """Reference-shaped constructor; see module docstring.

    ``catalog``/``database`` scope ``register(str_name)`` lookups;
    ``num_partitions_on_repartition`` overrides the per-stage partition
    policy's floor (reference spark/database_api.py:50-58).
    """

    def __init__(
        self,
        *,
        spark_session: Optional[SparkSession] = None,
        break_lineage_method: Optional[str] = None,
        catalog: Optional[str] = None,
        database: Optional[str] = None,
        repartition_after_blocking: bool = False,
        num_partitions_on_repartition: Optional[int] = None,
        register_udfs_automatically: bool = True,
    ):
        self.spark = spark_session or SparkSession.getActiveSession()
        if self.spark is None:
            raise ValueError("SparkAPI needs a spark_session (none active)")
        method = _BREAK_LINEAGE_METHODS.get(
            break_lineage_method.lower() if isinstance(break_lineage_method, str)
            else break_lineage_method
        )
        if method is None:
            raise ValueError(
                f"unknown break_lineage_method {break_lineage_method!r}; "
                f"one of {sorted(k for k in _BREAK_LINEAGE_METHODS if k)}"
            )
        self.break_lineage_method = method
        self.catalog = catalog
        self.database = database
        self.repartition_after_blocking = repartition_after_blocking
        self.num_partitions_on_repartition = num_partitions_on_repartition
        self._registered_table_names: set[str] = set()
        if register_udfs_automatically:
            register_udfs(self.spark)

    # -- reference database_api.py:267-303 --------------------------------
    def register(
        self,
        table,
        *,
        dataset_display_name: Optional[str] = None,
        table_name: Optional[str] = None,
    ) -> DataFrame:
        """Coerce ``table`` to a Spark DataFrame and tag it with its display
        name. Accepts a Spark DataFrame, a pandas DataFrame, a list of dicts,
        or a string naming an existing table/view in the session catalog."""
        name = table_name or dataset_display_name
        if name is not None:
            if name in self._registered_table_names:
                raise ValueError(
                    f"A table has already been registered with "
                    f"table_name='{name}'. Each registered table must have a "
                    "unique table_name."
                )
            self._registered_table_names.add(name)

        if isinstance(table, DataFrame):
            df = table
        elif isinstance(table, str):
            qualified = ".".join(
                p for p in (self.catalog, self.database, table) if p
            )
            df = self.spark.table(qualified)
        elif isinstance(table, list):
            df = self.spark.createDataFrame(table)
        else:
            try:  # pandas / pyarrow — createDataFrame handles both
                df = self.spark.createDataFrame(table)
            except Exception as exc:
                raise TypeError(
                    f"cannot register table of type {type(table).__name__}"
                ) from exc
        display = dataset_display_name or table_name
        if display:
            df._splink_dataset_display_name = display  # type: ignore[attr-defined]
        return df

    def register_from_csv(self, path: str) -> DataFrame:
        """reference database_api.py:380-383."""
        return self.spark.read.csv(path, header=True, inferSchema=True)

    def query_sql(self, sql: str) -> DataFrame:
        """Run arbitrary SQL against the session (reference
        database_api.py:180-206 returns the result table)."""
        return self.spark.sql(sql)

    def materialization_policy(self) -> MaterializationPolicy:
        """The MaterializationPolicy equivalent of this API's
        ``break_lineage_method`` — pass to ``Linker(materialization=...)``."""
        return MaterializationPolicy(method=self.break_lineage_method)

    def delete_tables_created_by_splink_from_db(self) -> None:
        """No-op by design: this engine creates no backend tables outside
        the MaterializationPolicy registry (reference
        database_api.py:412-418)."""
