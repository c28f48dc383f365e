"""Training-data pipeline operators: dedup, ANN/k-means, text analysis,
corpus curation, multimodal column plumbing."""

from . import ann, bpe, classifier, curation, dedup, embeddings, graph, lm, multimodal, sketches, temporal, text  # noqa: F401
from .classifier import quality_classifier  # noqa: F401
from .curation import (  # noqa: F401
    cap_per_group,
    curate_corpus,
    dsir_resample,
    shard_corpus,
    shard_stats,
)
from .dedup import deduplicate_corpus, incremental_dedup, semantic_dedup  # noqa: F401
from .embeddings import (  # noqa: F401
    absmax_fit,
    dequantize_expr,
    pca_fit,
    pca_transform,
    quantize_embeddings,
)
from .lm import perplexity_filter  # noqa: F401
from .text import dedup_within_document  # noqa: F401
