from .generator import PerformanceData, ScorePerformerGenerator, StreamingDecoder
from .messengers import (
    IntermediateData,
    SPMuple2IntermediateData,
    SPMuple2Messenger,
    SPMupleMessenger,
)
