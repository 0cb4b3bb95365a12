from .generator import PerformanceData, ScorePerformerGenerator, StreamingDecoder
from .server import RenderServer
from .messengers import (
    IntermediateData,
    SPMuple2IntermediateData,
    SPMuple2Messenger,
    SPMupleMessenger,
)
