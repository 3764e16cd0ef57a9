"""Ray Data data-plane stages for json_schema_ray.

The operator families a pipeline author reaches for, re-exported from
their modules (import the module directly for the full surface):

- validation: :mod:`.validate` (compile_plan_for, violations_dataset,
  verdicts_dataset, full_validation_pass), :mod:`.table_validator`
- keyed checks: :mod:`.keys` (duplicate_keys, referential_violations,
  turn_ordering_violations)
- comparison vs a reference corpus: :mod:`.compare`
- stats/drift: :mod:`.stats`, :mod:`.drift`
- relational: :mod:`.relational` (grouped/salted aggregates,
  broadcast + as-of + range joins, top-k, heavy hitters, pivot,
  deterministic hash sampling)
- windows/sessions: :mod:`.window`; rank/running: :mod:`.rank`
  (grouped top-k, per-key running totals)
- dedup: :mod:`.dedup` (exact, sorted, MinHash+LSH, SimHash)
- similarity/ANN: :mod:`.similarity` (brute force, LSH, IVF, index)
- text analysis: :mod:`.text`; multimodal: :mod:`.multimodal`
- resumable runs: :mod:`.manifest`
"""

from .compare import aligned_text_compare, keyed_text_compare
from .dedup import (
    build_ngram_blocklist,
    connected_components,
    exact_dedup,
    exact_dedup_sorted,
    minhash_dedup_pairs,
    ngram_containment,
    simhash_near_dup_pairs,
)
from .keys import (
    duplicate_keys,
    referential_violations,
    turn_ordering_violations,
)
from .rank import (
    cumulative_sum,
    grouped_exact_quantiles,
    grouped_mode,
    grouped_quantiles_cont,
    grouped_ntile,
    grouped_rank_profiles,
    grouped_row_numbers,
    grouped_string_agg,
    grouped_top_k,
    grouped_value_ranks,
    lag_column,
    lead_column,
    stratified_sample,
    windowed_sum,
)
from .relational import (
    anti_join,
    asof_join_backward,
    asof_join_backward_sorted,
    asof_join_forward_sorted,
    bloom_semi_join,
    broadcast_hash_join,
    build_bloom_filter,
    cube_aggregate,
    grouped_aggregate,
    grouping_sets_aggregate,
    except_distinct,
    grouped_distinct_count,
    grouped_distinct_count_sorted,
    grouped_first_last,
    hash_sample,
    heavy_hitters,
    intersect_distinct,
    mixture_sample,
    pivot_counts,
    range_join,
    rollup_aggregate,
    salted_aggregate,
    semi_join,
    top_k,
)
from .similarity import (
    build_ann_index,
    embedding_near_dup_pairs,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    query_ann_index,
)
from .stats import (
    column_stats,
    corr_stats,
    exact_quantiles,
    grouped_entropy,
    grouped_regression,
    grouped_zscore,
    histogram,
)
from .validate import (
    compile_plan_for,
    full_validation_pass,
    verdicts_dataset,
    violations_dataset,
)
from .text import (
    chunk_documents,
    normalize_text,
    repetition_scores,
    scrub_pii,
    vocabulary,
)
from .window import (
    hopping_window_counts,
    range_windowed_sum,
    pack_items,
    sessionize_counts,
    tumbling_window_counts,
)

__all__ = [
    "aligned_text_compare",
    "anti_join",
    "asof_join_backward",
    "asof_join_backward_sorted",
    "asof_join_forward_sorted",
    "bloom_semi_join",
    "build_bloom_filter",
    "broadcast_hash_join",
    "chunk_documents",
    "build_ann_index",
    "column_stats",
    "compile_plan_for",
    "connected_components",
    "corr_stats",
    "cube_aggregate",
    "cumulative_sum",
    "duplicate_keys",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "exact_dedup_sorted",
    "exact_quantiles",
    "except_distinct",
    "full_validation_pass",
    "grouped_aggregate",
    "grouped_distinct_count",
    "grouped_distinct_count_sorted",
    "grouped_entropy",
    "grouped_exact_quantiles",
    "grouped_first_last",
    "grouped_mode",
    "grouped_quantiles_cont",
    "grouped_ntile",
    "grouped_rank_profiles",
    "grouped_regression",
    "grouped_row_numbers",
    "grouped_string_agg",
    "grouped_top_k",
    "grouped_zscore",
    "grouping_sets_aggregate",
    "hash_sample",
    "heavy_hitters",
    "histogram",
    "hopping_window_counts",
    "intersect_distinct",
    "keyed_text_compare",
    "knn_bruteforce",
    "knn_ivf",
    "knn_lsh",
    "lag_column",
    "mixture_sample",
    "pack_items",
    "minhash_dedup_pairs",
    "normalize_text",
    "pivot_counts",
    "query_ann_index",
    "range_join",
    "range_windowed_sum",
    "referential_violations",
    "salted_aggregate",
    "semi_join",
    "sessionize_counts",
    "simhash_near_dup_pairs",
    "stratified_sample",
    "top_k",
    "tumbling_window_counts",
    "vocabulary",
    "turn_ordering_violations",
    "verdicts_dataset",
    "violations_dataset",
]
