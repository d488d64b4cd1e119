"""Namespace registry — the extension surface (SURVEY §2 disposition of
rex/utils/registry.py:36-53 + the --include-package plugin loading of
rex/utils/registry.py:107-141).

Re-expression, not a port: REx registers torch model/transform CLASSES
so YAML configs can name them; here the extension points are STAGE
FUNCTIONS — above all, extraction mechanisms for ``run_pipeline``'s M1
slot.  A user plugs in their own extractor:

    from rex_spark.registry import register

    @register("extractor")
    def my_extractor(sentences):       # DataFrame -> TRIPLES_SCHEMA rows
        ...

    run_pipeline(spark, pages, extractor="my_extractor")

Distributed caveat (the part REx doesn't have to think about):
registration must happen ON THE DRIVER before the plan is built.  The
registry itself never ships to executors — the resolved function is
captured in the UDF closure and pickled with it, so late registration
on an executor can't work and isn't needed.  Like the reference,
re-registering a name overwrites (REx's duplicate guard is
commented out at registry.py:21-22,37-40); last registration wins.
"""

from __future__ import annotations

import importlib
import pkgutil
from collections import defaultdict
from typing import Callable, Dict, List

NAMESPACE_REGISTRY: Dict[str, Dict[str, Callable]] = defaultdict(dict)


def register(namespace: str, name: str | None = None) -> Callable:
    """Decorator: register a callable under ``namespace`` (by its
    __name__ unless ``name`` overrides)."""

    def _register(call: Callable) -> Callable:
        NAMESPACE_REGISTRY[namespace][name or call.__name__] = call
        return call

    return _register


def get_registered(namespace: str, call_name: str) -> Callable:
    try:
        return NAMESPACE_REGISTRY[namespace][call_name]
    except KeyError:
        raise KeyError(
            f"{call_name!r} not registered in namespace {namespace!r}; "
            f"known: {sorted(NAMESPACE_REGISTRY[namespace])}"
        ) from None


def registered_names(namespace: str) -> List[str]:
    return sorted(NAMESPACE_REGISTRY[namespace])


def import_submodules(package_name: str) -> None:
    """Import every submodule of ``package_name`` so its module-level
    ``@register`` decorators run (the --include-package plugin hook,
    ref rex/utils/registry.py:144-160).  Call on the driver before
    building plans.

    Uses iter_modules + explicit recursion, NOT pkgutil.walk_packages:
    walk_packages resolves child names as top-level imports, so a
    plugin subpackage shadowing an importable name (``pkg/json/``)
    would walk the stdlib module and crash on phantom names like
    ``pkg.json.decoder``."""
    importlib.invalidate_caches()
    module = importlib.import_module(package_name)
    for _, name, _ in pkgutil.iter_modules(getattr(module, "__path__", [])):
        if name.startswith("_") or name.startswith("test"):
            continue
        sub = f"{package_name}.{name}"
        importlib.import_module(sub)
        import_submodules(sub)


def _register_builtin_extractors() -> None:
    """The built-in M-slot mechanisms, registered lazily (import-light:
    resolving a name imports only that mechanism's module)."""

    @register("extractor", name="casrel")
    def casrel(sentences):
        from .operators.pointer_extraction import casrel_extract

        return casrel_extract(sentences)

    @register("extractor", name="usm")
    def usm(sentences):
        from .operators.usm import usm_extract_scored

        return usm_extract_scored(sentences)


_register_builtin_extractors()
