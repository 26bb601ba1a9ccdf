"""One home for the executor-shipping convention.

Workers do not share the driver's ``sys.path``: a ``mapInPandas`` /
``pandas_udf`` closure that references a module's globals fails to
unpickle on an executor that cannot import the package.  Registering the
module for BY-VALUE cloudpickle serialization ships the code inside the
closure instead — the pattern every Python-boundary module here uses
(embedders, multimodal, jpeg/avi, bpe, warc, html_extract).

Best-effort by design: exotic Spark builds without the vendored
cloudpickle API degrade to by-reference, which still works wherever the
package IS importable (pytest, same-venv local mode).
"""

from __future__ import annotations

from types import ModuleType

__all__ = ["ship_by_value"]


def ship_by_value(*modules: ModuleType) -> None:
    """Register each module for by-value pickling (idempotent)."""
    try:
        from pyspark import cloudpickle

        for m in modules:
            cloudpickle.register_pickle_by_value(m)
    except Exception:  # pragma: no cover - exotic Spark builds
        pass
