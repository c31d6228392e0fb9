"""REST control-plane front (reference: td-apiserver + rest_urls).

Stdlib-only HTTP server exposing the store/pubsub services over the same
URL surface as the reference API server, plus an SDK-style client and the
`td`-style CLI that talk to it.
"""

from .client import ApiClient, ApiError
from .server import ApiServer

__all__ = ["ApiServer", "ApiClient", "ApiError"]
