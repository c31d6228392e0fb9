from .decorators import TabsdataFunction, publisher, subscriber, transformer
from .engine import PubSubEngine, RunReport
from .graph import CycleError, TriggerGraph

__all__ = [
    "publisher", "transformer", "subscriber", "TabsdataFunction",
    "PubSubEngine", "RunReport", "TriggerGraph", "CycleError",
]
