from .transport import (
    Transport,
    ModelType,
    PathType,
    WeightType,
    create_transport,
    mean_flat,
)
from .paths import ICPlan, VPCPlan, GVPCPlan, expand_t_like_x
from .samplers import (
    Sampler,
    ode_sample,
    sde_sample,
    make_time_grid,
    forward_with_cfg,
)

__all__ = [
    "Transport",
    "ModelType",
    "PathType",
    "WeightType",
    "create_transport",
    "mean_flat",
    "ICPlan",
    "VPCPlan",
    "GVPCPlan",
    "expand_t_like_x",
    "Sampler",
    "ode_sample",
    "sde_sample",
    "make_time_grid",
    "forward_with_cfg",
]

# small utils mirrored from the reference's transport/utils.py
from .utils import EasyDict, log_state  # noqa: E402,F401

__all__ += ["EasyDict", "log_state"]
