"""Production serving layer (streaming sessions over the SLM family)."""

from .audio import StreamingAudioFrontend
from .pool import StreamingSessionPool
from .speaker import StreamingSpeakerSession
from .streaming import StreamingListenerSession

__all__ = ["StreamingAudioFrontend", "StreamingListenerSession",
           "StreamingSessionPool", "StreamingSpeakerSession"]
