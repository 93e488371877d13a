"""Stage registry — the extensibility surface.

Re-expresses the reference's ``Stage.register`` plugin system
(src/MEDS_transforms/stages/base.py:966-1623) without its Hydra/process
machinery: a stage is a named transform over Spark DataFrames. Three
shapes, mirroring compute_modes/compute_fn.py:34-160:

- MAP:        ``fn(df, **cfg) -> DataFrame``            (data → data)
- MAPREDUCE:  ``fn(df, **cfg) -> DataFrame``            (data → metadata);
              Spark's partial+final hash aggregation subsumes the
              reference's per-shard map / cross-shard reduce split, so a
              mapreduce stage is just an aggregating transform here.
- MAIN:       ``fn(spark, cfg) -> None``                (free-form)

Stages registered here are discoverable by name for YAML pipelines
(plans/pipeline.py), the analog of the reference's entry-point discovery
(stages/discovery.py:14-72).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable

_REGISTRY: dict[str, "Stage"] = {}


@dataclass
class Stage:
    name: str
    fn: Callable
    kind: str = "map"  # map | mapreduce | main
    is_metadata: bool = False
    default_config: dict = field(default_factory=dict)
    output_schema_updates: dict = field(default_factory=dict)

    def __call__(self, df, **cfg) -> Any:
        merged = {**self.default_config, **cfg}
        return self.fn(df, **merged)


def register_stage(
    name: str | None = None,
    *,
    kind: str = "map",
    is_metadata: bool = False,
    default_config: dict | None = None,
    output_schema_updates: dict | None = None,
) -> Callable:
    """Decorator (or direct call) registering a stage transform."""

    def deco(fn: Callable) -> Callable:
        stage_name = name or fn.__name__
        if stage_name in _REGISTRY:
            raise ValueError(f"Duplicate stage registration: {stage_name!r}")
        _REGISTRY[stage_name] = Stage(
            name=stage_name,
            fn=fn,
            kind=kind,
            is_metadata=is_metadata,
            default_config=dict(default_config or {}),
            output_schema_updates=dict(output_schema_updates or {}),
        )
        fn.stage_name = stage_name
        return fn

    return deco


_ENTRY_POINTS_LOADED = False


def _load_entry_point_stages() -> None:
    """Third-party stage discovery via package entry points — the analog
    of the reference's ``MEDS_transforms.stages`` group
    (stages/discovery.py:14-72, pyproject.toml:53-64). External packages
    expose stages with::

        [project.entry-points."meds_transforms_spark.stages"]
        my_stage = "my_pkg.module:my_stage_fn"

    Duplicate names raise at registration (register_stage)."""
    global _ENTRY_POINTS_LOADED
    if _ENTRY_POINTS_LOADED:
        return
    _ENTRY_POINTS_LOADED = True
    from importlib.metadata import entry_points

    for ep in entry_points(group="meds_transforms_spark.stages"):
        fn = ep.load()
        if getattr(fn, "stage_name", None) not in _REGISTRY:
            register_stage(ep.name)(fn)


def get_stage(name: str) -> Stage:
    # Import the built-in operator modules lazily so registration happens
    # on first lookup even if the caller imported only `base`.
    if name not in _REGISTRY:
        import meds_transforms_spark.operators  # noqa: F401

        _load_entry_point_stages()
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"Unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_stages() -> dict[str, Stage]:
    import meds_transforms_spark.operators  # noqa: F401

    _load_entry_point_stages()
    return dict(_REGISTRY)


def bind_stage(name: str, **cfg) -> Callable:
    """Partial-apply config → a ``DataFrame -> DataFrame`` closure, the
    analog of compute-fn binding (compute_modes/compute_fn.py:183-317).
    Usable with ``df.transform(...)``."""
    stage = get_stage(name)
    return functools.partial(stage, **cfg)
