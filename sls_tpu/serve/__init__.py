"""Online serving: dynamic batching engine + HTTP front-end.

Beyond-reference capability: the reference only scores static eval
lists offline (reference: main.py:158-199); production deployment
needs an online path.  See engine.py for the design.
"""

from sls_tpu.serve.engine import BatchingEngine, EngineStats  # noqa: F401
from sls_tpu.serve.export import (  # noqa: F401
    build_scorer_from_export, export_serving, load_exported,
)
