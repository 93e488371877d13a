"""Reference-style compute-function shapes (dependency injection).

Re-expresses ``src/MEDS_transforms/compute_modes/compute_fn.py:25-317``
so a stage authored against the reference's conventions runs unmodified
on this engine:

- **DIRECT**: ``fn(df) -> DF`` (or ``fn(*dfs) -> DF``) — no binding.
- **UNBOUND**: ``fn(df, cfg/stage_cfg/code_modifiers/code_metadata)``
  — the non-df parameters are injected by name, then the bound function
  maps df → df.
- **FUNCTOR**: ``fn(cfg/stage_cfg/...) -> Callable`` — called once with
  the injected parameters to *produce* the df → df function (the return
  annotation must be a ``Callable`` to disambiguate, :49-125).

Injected parameters:

- ``cfg`` / ``stage_cfg``: plain dicts wrapped in :class:`DotDict` so
  reference code using attribute access (``cfg.val``) works.
- ``code_modifiers``: taken from ``cfg["code_modifiers"]``.
- ``code_metadata``: the codes table as a Spark DataFrame — passed
  through when the caller already holds it, else auto-loaded from
  ``stage_cfg.metadata_input_dir``/codes.parquet (:301-305; the load is
  a Spark parquet scan, not a driver materialization).

``dfs`` note: the reference's reducer shape receives one frame per
shard and concatenates. Spark's DataFrame already IS the all-shard
union, so ``*dfs`` functions are called with exactly one frame — the
semantics (operate on the full concatenation) are identical.
"""

from __future__ import annotations

import inspect
from enum import Enum, auto
from functools import partial
from typing import Any, Callable

ALLOWED_PARAMS = {"df", "dfs", "cfg", "stage_cfg", "code_modifiers", "code_metadata"}


class DotDict(dict):
    """dict with attribute access (recursive), standing in for the
    reference's OmegaConf DictConfig in injected configs."""

    def __getattr__(self, name: str) -> Any:
        try:
            val = self[name]
        except KeyError:
            raise AttributeError(name) from None
        return DotDict(val) if isinstance(val, dict) else val


class ComputeFnType(Enum):
    DIRECT = auto()
    UNBOUND = auto()
    FUNCTOR = auto()

    @classmethod
    def from_fn(cls, compute_fn: Callable) -> "ComputeFnType | None":
        """Classify by signature + return annotation
        (compute_fn.py:48-160): None means not a reference-style shape
        (e.g. this package's own ``fn(df, **params)`` stages)."""
        sig = inspect.signature(compute_fn)
        if not all(p in ALLOWED_PARAMS for p in sig.parameters):
            return None

        has_df = "df" in sig.parameters or "dfs" in sig.parameters
        only_df = has_df and len(sig.parameters) == 1

        ann = sig.return_annotation
        if ann is inspect.Signature.empty:
            callable_return = None  # unannotated: infer from params alone
        elif isinstance(ann, str):
            # Under `from __future__ import annotations` every
            # annotation is a string — 'typing.Callable[...]' and
            # 'collections.abc.Callable[...]' must classify like their
            # evaluated forms, not just the bare 'Callable[...]'
            # spelling.
            callable_return = (
                ann.startswith("Callable")
                or ann.startswith("typing.Callable")
                or ann.startswith("collections.abc.Callable")
                or ann.startswith("abc.Callable")
            )
        else:
            callable_return = getattr(ann, "__name__", str(ann)).startswith(
                "Callable"
            ) or str(ann).startswith("collections.abc.Callable")

        if only_df:
            return None if callable_return else cls.DIRECT
        if has_df:
            return None if callable_return else cls.UNBOUND
        return None if callable_return is False else cls.FUNCTOR


def identity_fn(df: Any) -> Any:
    return df


def bind_compute_fn(
    cfg: dict | None,
    stage_cfg: dict | None,
    compute_fn: Callable | None,
    code_metadata=None,
    spark=None,
) -> Callable:
    """Bind a reference-style compute function to a df → df closure
    (compute_fn.py:183-317).

    ``code_metadata`` short-circuits the auto-load; otherwise a
    ``code_metadata`` parameter is satisfied from
    ``stage_cfg["metadata_input_dir"]/codes.parquet`` via ``spark``.
    """
    if compute_fn is None:
        return identity_fn

    cfg = DotDict(cfg or {})
    stage_cfg = DotDict(stage_cfg or {})

    def injected_params() -> dict:
        params = inspect.signature(compute_fn).parameters
        kwargs: dict = {}
        if "cfg" in params:
            kwargs["cfg"] = cfg
        if "stage_cfg" in params:
            kwargs["stage_cfg"] = stage_cfg
        if "code_modifiers" in params:
            kwargs["code_modifiers"] = cfg.get("code_modifiers")
        if "code_metadata" in params:
            if code_metadata is not None:
                kwargs["code_metadata"] = code_metadata
            else:
                meta_dir = stage_cfg.get("metadata_input_dir")
                if meta_dir is None or spark is None:
                    raise ValueError(
                        f"{compute_fn.__name__} wants code_metadata but no frame "
                        "was provided and stage_cfg.metadata_input_dir is unset"
                    )
                import os

                kwargs["code_metadata"] = spark.read.parquet(
                    os.path.join(str(meta_dir), "codes.parquet")
                )
        return kwargs

    match ComputeFnType.from_fn(compute_fn):
        case ComputeFnType.DIRECT:
            return compute_fn
        case ComputeFnType.UNBOUND:
            return partial(compute_fn, **injected_params())
        case ComputeFnType.FUNCTOR:
            return compute_fn(**injected_params())
        case _:
            raise ValueError(
                f"Invalid compute function {compute_fn!r}: parameters must be "
                f"drawn from {sorted(ALLOWED_PARAMS)} and only functors may "
                "annotate a Callable return"
            )
