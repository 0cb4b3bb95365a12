from ..configs import Registry
from .collators import (
    LMScorePerformanceCollator,
    MixedLMScorePerformanceCollator,
    ScorePerformanceCollator,
    ScorePerformanceInputs,
    SeqInputs,
    SeqSegments,
    scoreperformer_model_inputs,
)
from .datasets import (
    LocalScorePerformanceDataset,
    NoteSegments,
    ScorePerformanceDataset,
    ScorePerformanceSample,
    ScorePerformanceSampleMeta,
    compute_bar_sample_positions,
    get_end_bar,
    get_num_bars,
)
from .helpers import (
    TokenSequenceAugmentations,
    TupleTokenSequenceIndexer,
    TupleTokenSequenceProcessor,
)
from .token_sequence import LocalTokenSequenceDataset, TokenSequenceDataset, load_tokens_np
from .performance import (
    LMPerformanceCollator,
    MixedLMPerformanceCollator,
    PerformanceCollator,
    PerformanceDataset,
    PerformanceSample,
    performer_model_inputs,
)
from .directions import (
    DirectionBarEmbeddingDataset,
    DirectionEmbeddingCollator,
    build_score_direction_maps,
)

DATASETS = Registry("datasets")
DATASETS.add("ScorePerformanceDataset", ScorePerformanceDataset)
DATASETS.add("LocalScorePerformanceDataset", LocalScorePerformanceDataset)
DATASETS.add("PerformanceDataset", PerformanceDataset)
DATASETS.add("DirectionBarEmbeddingDataset", DirectionBarEmbeddingDataset)

COLLATORS = Registry("collators")
COLLATORS.add("ScorePerformanceCollator", ScorePerformanceCollator)
COLLATORS.add("LMScorePerformanceCollator", LMScorePerformanceCollator)
COLLATORS.add("MixedLMScorePerformanceCollator", MixedLMScorePerformanceCollator)
COLLATORS.add("PerformanceCollator", PerformanceCollator)
COLLATORS.add("LMPerformanceCollator", LMPerformanceCollator)
COLLATORS.add("MixedLMPerformanceCollator", MixedLMPerformanceCollator)
COLLATORS.add("DirectionEmbeddingCollator", DirectionEmbeddingCollator)
