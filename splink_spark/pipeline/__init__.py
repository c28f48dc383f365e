"""Training-data pipeline operators: dedup, ANN/k-means, text analysis,
corpus curation, multimodal column plumbing."""

from . import (  # noqa: F401
    analytics,
    ann,
    bpe,
    cdc,
    classifier,
    curation,
    dedup,
    embeddings,
    fuzzy,
    graph,
    layout,
    lm,
    multimodal,
    quality,
    search,
    sketches,
    temporal,
    text,
    web,
)
from .cdc import latest_by_key, scd2_history, snapshot_diff  # noqa: F401
from .classifier import quality_classifier  # noqa: F401
from .curation import (  # noqa: F401
    cap_per_group,
    dedup_repeated_spans,
    curate_corpus,
    dsir_resample,
    k_anonymity_report,
    ngram_novelty,
    shard_corpus,
    shard_stats,
    split_dataset,
    weighted_sample_per_group,
)
from .dedup import (  # noqa: F401
    clustering_agreement,
    deduplicate_corpus,
    incremental_dedup,
    semantic_dedup,
)
from .embeddings import (  # noqa: F401
    absmax_fit,
    dequantize_expr,
    pca_fit,
    pca_transform,
    quantize_embeddings,
)
from .lm import perplexity_filter  # noqa: F401
from .layout import (  # noqa: F401
    geohash_key,
    hilbert_index,
    hilbert_key,
    hilbert_sort,
    zorder_key,
    zorder_sort,
)
from .quality import expectations_report  # noqa: F401
from .temporal import (  # noqa: F401
    asof_join,
    gap_fill,
    range_join,
    rolling_aggregate,
    sessionize,
    time_rollup,
)
from .analytics import (  # noqa: F401
    column_correlations,
    group_moments,
    group_quantiles,
    histogram,
    robust_outliers,
    top_k_per_group,
    winsorize,
)
from .sketches import group_distinct_approx  # noqa: F401
from .fuzzy import fuzzy_join_ed1  # noqa: F401
from .graph import (  # noqa: F401
    bipartite_project,
    common_neighbors,
    k_core,
    label_propagation,
    link_prediction_scores,
    pagerank,
    triangle_count,
)
from .search import (  # noqa: F401
    bm25_corpus_stats,
    bm25_index,
    bm25_index_read,
    bucket_coverage,
    bm25_index_write,
    bm25_search,
)
from .text import (  # noqa: F401
    dedup_within_document,
    normalize_text,
    remove_boilerplate_lines,
    strip_markup,
)
from .web import domain_stats, url_dedup, url_normalize  # noqa: F401
