"""Production serving layer (streaming sessions over the SLM family)."""

from .pool import StreamingSessionPool
from .streaming import StreamingListenerSession

__all__ = ["StreamingListenerSession", "StreamingSessionPool"]
