"""Reference-name compatibility layer.

Every public name the reference package exports (its ``exprs/*``
``__all__`` union, 175 live names — the four commented-out entries
``mutual_info_disc`` / ``query_fairness`` / ``query_p_pct_score`` /
``query_psd`` are dead in the reference too and are deliberately
absent) resolves here under its REFERENCE spelling, so porting a
polars_ds script is a mechanical import swap::

    from polars_ds_extension_spark import aliases as pds
    pds.query_knn_ptwise(...)   # = operators.knn.knn_join

Names that differ only in module placement are re-exported verbatim;
renamed entry points are bound as thin assignments (no wrappers — the
target function IS the alias, so signatures and docstrings stay
authoritative). API-shape differences remain the documented
DataFrame-level ones (SURVEY.md §3): reference expressions over
in-memory series become (df, cols...) -> DataFrame/Column operators.
"""

from __future__ import annotations

# --- names already exported under the reference spelling -----------------
from .functions.num import *  # noqa: F401,F403
from .functions.stats import *  # noqa: F401,F403
from .functions.metrics import *  # noqa: F401,F403
from .functions.string_ import *  # noqa: F401,F403
from .functions.ts import *  # noqa: F401,F403

# --- same spelling, module not star-exported ------------------------------
from .functions.num import (  # noqa: F401
    add_at, isotonic_regression, next_up, next_down, pca,
    principal_components, singular_values, rfft, smooth_spline,
    psi_w_breakpoints,
)
from .functions.stats import kaplan_meier as _kaplan_meier  # noqa: F401
from .functions.stats import ttest_1samp_stat as _ttest_1samp  # noqa: F401
from .functions.linear import (  # noqa: F401
    simple_lin_reg, rolling_lin_reg, recursive_lin_reg, lin_reg,
    lin_reg_report, logistic_reg,
)
from .functions.ts import (  # noqa: F401
    query_ar_coeffs, query_sample_entropy, query_approx_entropy,
    query_lempel_ziv, query_permute_entropy, query_similar_count,
    query_knn_entropy, query_transfer_entropy, query_copula_entropy,
    query_cond_indep,
)
from .operators.knn import is_knn_from, within_dist_from  # noqa: F401

# --- renamed entry points (reference name = repo callable) ----------------
from .functions.iters import combinations_df as combinations  # noqa: F401
from .functions.iters import product_df as product  # noqa: F401
from .functions.linear import lin_reg_rcond as lin_reg_w_rcond  # noqa: F401
from .functions.metrics import query_mase_df as query_mase  # noqa: F401
from .functions.metrics import (  # noqa: F401
    query_huber_loss as query_hubor_loss,  # sic — the reference's spelling
    confusion_matrix_counts as query_confusion_matrix,
    roc_auc as query_roc_auc,
    multi_roc_auc as query_multi_roc_auc,
    tpr_fpr as query_tpr_fpr,
)
from .operators.knn import (  # noqa: F401
    knn_join as query_knn_ptwise,
    knn_avg as query_knn_avg,
    knn_freq_cnt as query_knn_freq_cnt,
    radius_count as query_nb_cnt,
    radius_join as query_radius_ptwise,
    radius_count_null_safe as query_radius_ptwise_null_safe,
    radius_freq_cnt as query_radius_freq_cnt,
    dist_from_kth_nb as query_dist_from_kth_nb,
)

ttest_1samp = _ttest_1samp
query_kaplan_meier_prob = _kaplan_meier


def query_ndcg_score(df, actual, pred, k=None, log_base: float = 2.0,
                     by=None):
    """Reference query_ndcg_score (metrics.py:736) = dcg with
    normalize=True."""
    from .functions.metrics import query_dcg_score

    return query_dcg_score(df, actual, pred, k=k, log_base=log_base,
                           by=by, normalize=True)


def frame(spark, size: int = 2_000, index_name: str = "row_num"):
    """Reference ``pds.frame`` (__init__.py:13): an index-only frame to
    chain with the random generators in simulations and tests. Spark
    twin takes the session first (no ambient context in Spark) and
    partitions the range like any other source frame."""
    from pyspark.sql import functions as _F

    return spark.range(0, size).select(
        _F.col("id").cast("long").alias(index_name))
