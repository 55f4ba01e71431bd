from pointcloudmatters_tpu.utils.config import (
    DotDict,
    compose,
    instantiate,
    resolve_config,
    select,
    set_runtime,
    to_container,
)
from pointcloudmatters_tpu.utils.metrics import Metrics
from pointcloudmatters_tpu.utils.misc import TemporalAgg
from pointcloudmatters_tpu.utils.pylogger import RankedLogger
from pointcloudmatters_tpu.utils.registry import Registry, build_from_cfg
from pointcloudmatters_tpu.utils.utils import (
    extras,
    get_metric_value,
    instantiate_callbacks,
    instantiate_loggers,
    log_hyperparameters,
    seed_everything,
    task_wrapper,
)
