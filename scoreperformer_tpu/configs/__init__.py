from .config import (
    MISSING,
    ModuleConfig,
    VariableModuleConfig,
    filter_kwargs,
    init_module,
    merge_configs,
    to_dict,
)
from .registry import Registry
from .yaml_loader import load_experiment_config, load_yaml, resolve_config_hierarchy
