"""Optional-dependency guards and env-flag parsing.

Counterpart of the reference's `_internal/module_utils.py`
(/root/reference/src/torchaudio/_internal/module_utils.py:6-76): `eval_env`
boolean env parsing, `is_module_available` / `requires_module` guards for
optional imports, a `deprecated` decorator, and `fail_with_message` / `no_op`
decorator factories used to gate features on availability.
"""

from __future__ import annotations

import importlib.util
import os
import warnings
from functools import wraps
from typing import Any

_TRUES = {"1", "true", "TRUE", "on", "ON", "yes", "YES"}
_FALSES = {"0", "false", "FALSE", "off", "OFF", "no", "NO"}


def eval_env(var: str, default: bool) -> bool:
    """Check if an environment variable is set to a truthy/falsy string."""
    if var not in os.environ:
        return default
    val = os.environ[var]
    if val in _TRUES:
        return True
    if val in _FALSES:
        return False
    raise RuntimeError(
        f"Unexpected environment variable value `{var}={val}`. "
        f"Expected one of {sorted(_TRUES | _FALSES)}"
    )


def is_module_available(*modules: str) -> bool:
    """True if every named module can be imported (without importing it)."""
    return all(importlib.util.find_spec(m) is not None for m in modules)


def requires_module(*modules: str):
    """Decorate a function to raise if any required optional module is absent."""
    missing = [m for m in modules if not is_module_available(m)]
    if not missing:

        def decorator(func):
            return func

    else:
        req = f"module: {missing[0]}" if len(missing) == 1 else f"modules: {missing}"

        def decorator(func):
            @wraps(func)
            def wrapped(*args, **kwargs):
                raise RuntimeError(f"{func.__module__}.{func.__name__} requires {req}")

            return wrapped

    return decorator


def deprecated(direction: str, version: Any = None, remove: bool = False):
    """Decorate a function to emit a deprecation warning with guidance."""

    def decorator(func):
        @wraps(func)
        def wrapped(*args, **kwargs):
            message = f"{func.__module__}.{func.__name__} has been deprecated. {direction}"
            if remove:
                message += f' It will be removed from {"future" if version is None else version} release.'
            warnings.warn(message, stacklevel=2)
            return func(*args, **kwargs)

        return wrapped

    return decorator


def fail_with_message(message: str):
    """Decorator factory: the wrapped function raises RuntimeError with its
    name and ``message`` (used to gate unavailable features)."""

    def decorator(func):
        @wraps(func)
        def wrapped(*args, **kwargs):
            raise RuntimeError(f"{func.__name__} {message}")

        return wrapped

    return decorator


def no_op(func):
    """Pass-through decorator (the available-path twin of fail_with_message)."""
    return func
