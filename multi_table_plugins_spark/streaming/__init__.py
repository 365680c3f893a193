from .cdc_pipeline import (  # noqa: F401
    HISTORY_SUFFIX,
    apply_cdc_batch,
    read_history,
    replay_feed_batches,
    run_cdc_stream,
)
from .cdf_source import (  # noqa: F401
    CHANGE_OP_COL,
    COMMIT_VERSION_COL,
    LakeCDFDataSource,
    replicate_table,
)
from .wap import (  # noqa: F401
    discard_staged_batch,
    publish_staged_batch,
    stage_cdc_batch,
    staged_tables,
)
