"""Session providers: where a function run executes.

The reference spawns one worker process per function run
(server/libraries/td-supervisor/src/component/runner.rs; SURVEY §3.2.5-6).
In the Spark port the control plane (graph, transactions, offsets) is
engine-agnostic and the "worker" is just *which SparkSession executes the
plan*:

- `LocalSessionProvider` — the in-process session (tests, single node).
- `ConnectSessionProvider` — a Spark Connect remote (`sc://host:port`):
  the driver stays thin while plans execute on the cluster; this is the
  deploy path for a 1000-executor target.  The Connect client needs
  grpcio + protobuf, so construction is gated with a clear error where
  those are absent.

A spark-submit-per-run variant would subclass SessionProvider the same
way; the engine only ever asks for `.session()`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


class SessionProvider:
    """Strategy interface: yield the SparkSession a function run uses."""

    def session(self) -> SparkSession:  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class LocalSessionProvider(SessionProvider):
    spark: SparkSession

    def session(self) -> SparkSession:
        return self.spark


@dataclass
class ConnectSessionProvider(SessionProvider):
    """Spark Connect remote sessions (sc://host:port).

    At scale every function run shares one long-lived Connect session per
    engine instance (sessions multiplex on the server; creating one per
    run would pay gRPC channel setup each time).
    """

    url: str
    _session: SparkSession | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        try:
            import grpc  # noqa: F401
            import google.protobuf  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "Spark Connect sessions need the 'grpcio' and 'protobuf' "
                "packages (pip install 'pyspark[connect]'); falling back to "
                "LocalSessionProvider keeps the same control-plane "
                "behavior in-process") from e

    def session(self) -> SparkSession:
        if self._session is None:
            self._session = SparkSession.builder.remote(self.url).getOrCreate()
        return self._session
