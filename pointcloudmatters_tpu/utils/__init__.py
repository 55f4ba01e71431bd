from pointcloudmatters_tpu.utils.config import (
    DotDict,
    compose,
    instantiate,
    resolve_config,
    select,
    set_runtime,
    to_container,
)
from pointcloudmatters_tpu.utils.pylogger import RankedLogger
from pointcloudmatters_tpu.utils.registry import Registry, build_from_cfg
