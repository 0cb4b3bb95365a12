from .attention import Attention, init_kv_cache
from .classifiers import (
    LinearEmbeddingClassifier,
    LinearEmbeddingClassifierConfig,
    MultiHeadEmbeddingClassifier,
    MultiHeadEmbeddingClassifierConfig,
)
from .embeddings import (
    DEFAULT_EMB_DIMS,
    StreamEmbedding,
    TupleTokenEmbeddings,
    TupleTokenEmbeddingsConfig,
    TupleTokenHeadConfig,
    TupleTokenRegressionHeadConfig,
)
from .layers import AdaptiveLayerNorm, ALiBiPositionalBias, FeedForward
from .mmd import (
    AggregateModes,
    MMDTupleTransformer,
    MMDTupleTransformerConfig,
    mmd_loss,
)
from .scoreperformer import (
    IGNORE_INDEX,
    LMModes,
    PerformerConfig,
    PerformerModel,
    ScorePerformerConfig,
    ScorePerformerModel,
    ScorePerformerOutput,
    lm_losses,
    shift_for_lm,
)
from .transformer import (
    AttentionConfig,
    FeedForwardConfig,
    TransformerConfig,
    TransformerStack,
)
from .tuple_transformer import (
    EmbeddingModes,
    TupleTransformerConfig,
    TupleTransformerModule,
    TupleTransformerOutput,
)
from .factory import build_scoreperformer_config, MODELS
