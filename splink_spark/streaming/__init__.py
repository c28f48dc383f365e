from .operators import (  # noqa: F401
    bloom_update_stream,
    hll_update_stream,
    incremental_dedup_stream,
    incremental_link,
    read_bloom_state,
    read_hll_state,
    read_sketch_state,
    sketch_update_stream,
    stream_dedupe_exact,
    stream_session_aggregate,
    stream_stateful_neardupe,
    stream_windowed_counts,
)
