from .config import (
    LDMAEConfig,
    VMAEConfig,
    DataConfig,
    VaeConfig,
    ModelConfig,
    TrainConfig,
    OptimizerConfig,
    TransportConfig,
    SampleConfig,
    ParallelConfig,
)

__all__ = [
    "LDMAEConfig",
    "VMAEConfig",
    "DataConfig",
    "VaeConfig",
    "ModelConfig",
    "TrainConfig",
    "OptimizerConfig",
    "TransportConfig",
    "SampleConfig",
    "ParallelConfig",
]
