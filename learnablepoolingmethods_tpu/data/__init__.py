"""Data ingestion: YT-8M TFRecord readers → fixed-shape XLA input batches."""

from learnablepoolingmethods_tpu.data.readers import (  # noqa: F401
    YT8MAggregatedFeatureReader,
    YT8MFrameFeatureReader,
    resize_axis,
)
