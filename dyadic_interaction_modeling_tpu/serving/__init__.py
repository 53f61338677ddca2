"""Production serving layer (streaming sessions over the SLM family)."""

from .streaming import StreamingListenerSession

__all__ = ["StreamingListenerSession"]
