"""polars_ds_extension_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of abstractqqq/polars_ds_extension,
re-designed Spark-first for horizontal scale.

Import style mirrors the reference (``import polars_ds as pds``):

    import polars_ds_extension_spark as pds

    df.groupBy("segment").agg(
        pds.query_roc_auc is DataFrame-level → pds.roc_auc(df, ...),
        pds.query_log_loss("actual", "pred").alias("log_loss"),
        pds.weighted_mean("x", "w").alias("wm"),
    )
"""

from .functions.num import *  # noqa: F401,F403
from .functions.stats import *  # noqa: F401,F403
from .functions.metrics import *  # noqa: F401,F403
from .functions.string_ import *  # noqa: F401,F403
from .functions.ts import *  # noqa: F401,F403
from .functions.expander import E  # noqa: F401
from .partition import PartitionHelper  # noqa: F401
from .functions.diagnosis import DIA  # noqa: F401
from .compat import compat  # noqa: F401

__version__ = "0.1.0"
