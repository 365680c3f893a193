from .cdc_pipeline import apply_cdc_batch, replay_feed_batches, run_cdc_stream  # noqa: F401
