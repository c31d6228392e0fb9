"""Per-run worker isolation: execute a function's compute in a subprocess
virtualenv, keeping publish/commit in the control plane.

Reference counterpart: each function run executes in its own process with
the function's code bundle materialized into a virtualenv
(client/td-sdk/tabsdata/_tabsserver/invoker.py:76 creates/locates the env;
server/libraries/td-supervisor/src/component/runner.rs spawns the worker).
The in-process engine path (engine.py) stays the default — it is what the
driver contract exercises — but IsolatedWorker closes the isolation
divergence for user compute code:

- the venv (`--system-site-packages`, so pyspark/pandas/pyarrow resolve
  offline) gives the bundle an import namespace separate from the engine
  process — a bundle that shadows a module or mutates global state cannot
  poison the control plane or sibling runs;
- the subprocess gives it a separate JVM + Python heap: an OOM or crash
  fails ONE run report, not the engine;
- the worker only sees read-only store paths and a scratch output dir;
  version publication (the transactional part) never leaves the engine.

Scale note: on a cluster this subprocess becomes a spark-submit / Spark
Connect client per run (runner.py's SessionProvider seam); the
request/response contract in _bundle_main.py is transport-agnostic.

Publishers and subscribers keep running in-process: their sources and
destinations are live engine-side objects (SourcePlugin instances, JDBC
handles) that have no bundle representation — a documented divergence
scoped to where user *compute* isn't the risk.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import venv

from ..errors import TabsdataSparkError


class IsolatedWorker:
    """Runs bundled transformer functions in a venv subprocess.

    >>> worker = IsolatedWorker(workdir)        # venv created lazily, reused
    >>> paths = worker.run(bundle_py, "my_fn", input_paths, master="local[2]")
    """

    def __init__(self, root: str, timeout_s: float = 600.0):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.timeout_s = timeout_s
        self._python: str | None = None

    # -- venv ----------------------------------------------------------
    def python(self) -> str:
        """Create (once) and return the venv's python executable.
        `--system-site-packages` keeps pyspark importable with no network;
        the venv still isolates anything the bundle itself installs or
        shadows (reference invoker: one env per function bundle)."""
        if self._python is None:
            env_dir = os.path.join(self.root, "venv")
            bin_dir = "Scripts" if os.name == "nt" else "bin"
            exe = os.path.join(env_dir, bin_dir, "python")
            if not os.path.exists(exe):
                venv.EnvBuilder(system_site_packages=True,
                                with_pip=False).create(env_dir)
            self._python = exe
        return self._python

    # -- run -----------------------------------------------------------
    def run(self, bundle_path: str, fn_name: str,
            inputs: list[list[str] | None], master: str = "local[4]",
            shuffle_partitions: int = 8) -> list[str | None]:
        """Execute the bundled function; returns per-output parquet paths
        (None for skipped outputs).  Raises TabsdataSparkError with the
        worker's traceback on failure."""
        run_dir = tempfile.mkdtemp(prefix="run-", dir=self.root)
        out_dir = os.path.join(run_dir, "out")
        os.makedirs(out_dir)
        req = {
            "bundle": bundle_path,
            "fn": fn_name,
            "inputs": [None if p is None else {"paths": p} for p in inputs],
            "output_dir": out_dir,
            "master": master,
            "shuffle_partitions": shuffle_partitions,
        }
        req_path = os.path.join(run_dir, "request.json")
        with open(req_path, "w") as f:
            json.dump(req, f)
        # the repo is not pip-installed; the worker finds tabsdata_spark
        # through PYTHONPATH exactly as a spark-submit --py-files would
        pkg_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [self.python(), "-m", "tabsdata_spark.pubsub._bundle_main",
             req_path],
            capture_output=True, text=True, timeout=self.timeout_s, env=env,
        )
        resp_path = os.path.join(out_dir, "response.json")
        if not os.path.exists(resp_path):
            raise TabsdataSparkError(
                f"isolated worker for {fn_name!r} died without a response "
                f"(exit {proc.returncode}): {proc.stderr[-2000:]}")
        with open(resp_path) as f:
            resp = json.load(f)
        if resp["error"]:
            raise TabsdataSparkError(
                f"isolated worker for {fn_name!r} failed: {resp['error']}")
        return resp["outputs"]

    @staticmethod
    def check_python_isolated(python: str) -> bool:
        """True when `python` resolves to a venv interpreter distinct from
        the engine's (sys.prefix differs) — the property the isolation
        tests assert."""
        out = subprocess.run(
            [python, "-c", "import sys; print(sys.prefix)"],
            capture_output=True, text=True)
        return out.stdout.strip() not in ("", sys.prefix)


__all__ = ["IsolatedWorker"]
