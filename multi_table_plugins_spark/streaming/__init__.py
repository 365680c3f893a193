from .cdc_pipeline import (  # noqa: F401
    HISTORY_SUFFIX,
    apply_cdc_batch,
    read_history,
    replay_feed_batches,
    run_cdc_stream,
)
