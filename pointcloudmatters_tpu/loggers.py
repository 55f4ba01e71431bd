"""Top-level logger namespace targeted by `configs/logger/*.yaml`."""

from pointcloudmatters_tpu.utils.loggers import (  # noqa: F401
    BaseLogger,
    CSVLogger,
    MultiLogger,
    TensorBoardLogger,
    as_multi_logger,
)
