from .callbacks import (
    CallbackHandler,
    DefaultFlowCallback,
    EpochReproducibilityCallback,
    FileLogCallback,
    JSONLMetricsCallback,
    PrinterCallback,
    ProgressCallback,
    TrainerCallback,
    TrainerControl,
    TrainerState,
)
from .checkpoint import (
    freeze_mask,
    load_checkpoint,
    save_checkpoint,
    wait_for_async_saves,
    warm_start_params,
)
from .components import ExperimentComponents, inject_data_config
from .evaluator import EVALUATORS, ScorePerformerEvaluator
from .optimizers import (
    OptimizerConfig,
    PlateauController,
    build_lr_schedule,
    build_optimizer,
    get_plateau_scale,
    set_plateau_scale,
)
from .trainer import Accumulator, Trainer, TrainerConfig
