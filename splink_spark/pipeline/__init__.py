"""Training-data pipeline operators: dedup, ANN/k-means, text analysis,
corpus curation, multimodal column plumbing."""

from . import ann, curation, dedup, multimodal, text  # noqa: F401
from .curation import curate_corpus  # noqa: F401
from .dedup import deduplicate_corpus, semantic_dedup  # noqa: F401
from .text import dedup_within_document  # noqa: F401
