"""Composed operator pipelines — each is a reference workflow re-expressed
as one declarative DataFrame plan."""

from mhm_data_pipelines_spark.operators.compact import (
    compact_lake,
    read_compacted,
)
from mhm_data_pipelines_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_near_duplicates,
    simhash_duplicates,
)
from mhm_data_pipelines_spark.operators.overview import (
    availability_long,
    availability_matrix,
    missing_data_report,
    overview_stats,
)
from mhm_data_pipelines_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pairs,
    ivf_topk,
    label_centroids,
    lsh_topk,
)
from mhm_data_pipelines_spark.operators.sampling import (
    deterministic_sample,
    train_val_test_split,
)
from mhm_data_pipelines_spark.operators.skew import salted_agg, salted_join
from mhm_data_pipelines_spark.operators.summary import patient_summary
from mhm_data_pipelines_spark.operators.temporal import asof_join, range_join

__all__ = [
    "asof_join",
    "availability_long",
    "availability_matrix",
    "brute_force_topk",
    "brute_force_topk_pairs",
    "compact_lake",
    "dedup_exact",
    "deterministic_sample",
    "exact_duplicates",
    "ivf_topk",
    "label_centroids",
    "lsh_topk",
    "salted_agg",
    "salted_join",
    "minhash_near_duplicates",
    "missing_data_report",
    "overview_stats",
    "patient_summary",
    "range_join",
    "read_compacted",
    "simhash_duplicates",
    "train_val_test_split",
]
