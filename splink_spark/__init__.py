"""splink_spark — a PySpark-native probabilistic record-linkage engine.

A from-scratch rebuild of the capabilities of moj-analytical-services/splink
(Fellegi-Sunter linkage: blocking → comparison vectors → match weights →
clustering) designed Spark-first: DataFrame/Catalyst logical plans, built-in
functions in the hot path, Arrow-batched pandas UDFs only where Spark lacks a
primitive, explicit lineage-break points for the iterative algorithms.
"""

from . import blocking_analysis  # noqa: F401
from . import blocking_rule_library  # noqa: F401
from . import clustering  # noqa: F401
from . import comparison_level_library  # noqa: F401
from . import comparison_library  # noqa: F401
from . import exceptions  # noqa: F401
from . import exploratory  # noqa: F401
from .internals.blocking import (  # noqa: F401
    BlockingRule,
    CustomRule,
    block_on,
    cross_rule,
    exploding_rule,
)
from .internals.column_expression import ColumnExpression  # noqa: F401
from .internals.comparison import Comparison  # noqa: F401
from .internals.comparison_level import ComparisonLevel  # noqa: F401
from .internals.functions import register_udfs  # noqa: F401
from .internals.materialize import MaterializationPolicy  # noqa: F401
from .internals.settings import Settings, SettingsCreator  # noqa: F401
from .internals.splink_dataframe import SplinkDataFrame  # noqa: F401
from .datasets import (  # noqa: F401
    SplinkDatasets,
    SplinkDataUtils,
    list_downloadable_datasets,
    splink_dataset_utils,
    splink_datasets,
)
from .database_api import SparkAPI  # noqa: F401
from .linker import Linker  # noqa: F401

__version__ = "0.1.0"
