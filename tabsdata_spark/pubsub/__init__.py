from .decorators import TabsdataFunction, publisher, subscriber, transformer
from .engine import PubSubEngine, RunReport
from .graph import CycleError, TriggerGraph
from .runner import (
    ConnectSessionProvider, LocalSessionProvider, SessionProvider,
)

__all__ = [
    "publisher", "transformer", "subscriber", "TabsdataFunction",
    "PubSubEngine", "RunReport", "TriggerGraph", "CycleError",
    "SessionProvider", "LocalSessionProvider", "ConnectSessionProvider",
]
