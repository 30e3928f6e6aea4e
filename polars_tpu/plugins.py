"""Expression-plugin SDK shim (reference: pyo3-polars register_plugin_function).

The reference's plugin ABI is a Rust cdylib FFI; this engine's extension
point is the Python namespace-registration SDK (`pl.api.register_*`) plus
`Expr.map_batches` for custom columnar functions, both of which run inside
the engine. register_plugin_function exists for API compatibility and says
so rather than silently failing.
"""

from __future__ import annotations

from typing import Any


def register_plugin_function(
    *,
    plugin_path: Any = None,
    function_name: str = "",
    args: Any = None,
    kwargs: Any = None,
    is_elementwise: bool = False,
    **_: Any,
) -> Any:
    raise NotImplementedError(
        "Rust-ABI expression plugins are a CPU-cdylib mechanism; on this "
        "TPU engine use pl.api.register_expr_namespace (runs in-engine) or "
        "Expr.map_batches with a jax-traceable function instead"
    )
