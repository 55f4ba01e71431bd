"""Top-level logger namespace targeted by `configs/logger/*.yaml`."""

from pointcloudmatters_tpu.utils.loggers import (  # noqa: F401
    AimLogger,
    BaseLogger,
    CometLogger,
    CSVLogger,
    MLFlowLogger,
    MultiLogger,
    NeptuneLogger,
    OfflineBackendLogger,
    TensorBoardLogger,
    WandbLogger,
    as_multi_logger,
)
