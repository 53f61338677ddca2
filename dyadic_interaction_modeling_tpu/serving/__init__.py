"""Production serving layer (streaming sessions over the SLM family)."""

from .audio import StreamingAudioFrontend
from .avatar import (
    StreamingAvatarPipeline,
    StreamingCoeffDecoder,
    StreamingRenderer,
    StreamingSemanticWindower,
    StreamingSmoother,
)
from .fused import FusedAvatarPipeline
from .pool import StreamingSessionPool
from .speaker import StreamingSpeakerSession
from .streaming import StreamingListenerSession

__all__ = ["FusedAvatarPipeline", "StreamingAudioFrontend",
           "StreamingAvatarPipeline",
           "StreamingCoeffDecoder", "StreamingListenerSession",
           "StreamingRenderer", "StreamingSemanticWindower",
           "StreamingSessionPool", "StreamingSmoother",
           "StreamingSpeakerSession"]
