from .schema import (
    BaseModels,
    ConfigError,
    DatasetCfg,
    DatasetType,
    HrDatasetCfg,
    ImageType,
    LossCfg,
    LrDatasetCfg,
    MeshCfg,
    ModelCfg,
    OptimizerCfg,
    RestormerCfg,
    RrdbCfg,
    TrainerCfg,
    TransformerCfg,
)

__all__ = [
    "BaseModels", "ConfigError", "DatasetCfg", "DatasetType", "HrDatasetCfg",
    "ImageType", "LossCfg", "LrDatasetCfg", "MeshCfg", "ModelCfg", "OptimizerCfg",
    "RestormerCfg", "RrdbCfg", "TrainerCfg", "TransformerCfg",
]
