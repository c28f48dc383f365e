from .operators import (  # noqa: F401
    incremental_link,
    stream_dedupe_exact,
    stream_session_aggregate,
    stream_stateful_neardupe,
    stream_windowed_counts,
)
