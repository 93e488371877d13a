"""Generate Markdown documentation pages for registered stages.

Spark counterpart of ``src/MEDS_transforms/stages/docgen.py`` (StageDoc
:29-44, description extraction :77-95, example rendering :187-236,
page assembly :238-307): one page per registered stage — description
pulled from the operator docstring, registry facts (kind, metadata
plane, compute mode, default config, declared schema deltas), and any
auto-discovered golden example scenarios rendered as config + expected
output previews. Exposed on the CLI as
``python -m meds_transforms_spark gen-docs OUT_DIR``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

_SECTION_RE = re.compile(
    r"^(Args|Returns|Raises|Yields|Examples|Attributes|Notes?|References|"
    r"See Also|Warnings?)\s*:",
    re.MULTILINE,
)


@dataclass
class StageDoc:
    stage_name: str
    path: str  # relative markdown path
    content: str


def _extract_description(docstring: str | None) -> str:
    """Docstring up to the first Google-style section header."""
    if not docstring:
        return "*(no description)*"
    import textwrap

    first, _, rest = docstring.partition("\n")
    body = textwrap.dedent(rest)
    text = f"{first.strip()}\n{body}".strip()
    m = _SECTION_RE.search(text)
    return (text[: m.start()] if m else text).strip() or "*(no description)*"


def _yaml_block(obj) -> str:
    import yaml

    return "```yaml\n" + yaml.safe_dump(obj, sort_keys=False).strip() + "\n```"


def _example_section(scenario) -> list[str]:
    lines = [f"### Example: `{scenario.scenario_name or 'base'}`", ""]
    if scenario.cfg:
        lines += ["Configuration:", "", _yaml_block(scenario.cfg), ""]
    out_yaml = scenario.out_data_yaml or scenario.out_metadata_yaml
    # goldens may be a bare CSV string or an empty mapping (both valid
    # StageExample formats) — skip the preview rather than crash the
    # whole doc build
    if out_yaml and isinstance(out_yaml, dict) and len(out_yaml):
        key, val = next(iter(out_yaml.items()))
        preview = val if isinstance(val, str) else str(val)
        preview_lines = preview.strip().splitlines()[:8]
        lines += [
            f"Expected output (`{key}`, first {len(preview_lines)} lines):",
            "",
            "```",
            *preview_lines,
            "```",
            "",
        ]
    return lines


def build_stage_doc(name: str, stage, scenarios=()) -> StageDoc:
    import sys

    lines = [f"# `{name}`", ""]
    plane = "metadata" if stage.is_metadata else "data"
    # Many operators document at module level (the richer docstring);
    # prefer the function's own, fall back to its module's.
    doc = stage.fn.__doc__ or getattr(
        sys.modules.get(stage.fn.__module__), "__doc__", None
    )
    lines += [
        f"- **Kind**: {stage.kind} ({plane} plane)",
        f"- **Compute mode**: {stage.compute_mode}",
        f"- **Module**: `{stage.fn.__module__}`",
        "",
        _extract_description(doc),
        "",
    ]
    if stage.default_config:
        lines += ["## Default configuration", "", _yaml_block(stage.default_config), ""]
    if stage.output_schema_updates:
        lines += [
            "## Output schema deltas",
            "",
            _yaml_block({k: str(v) for k, v in stage.output_schema_updates.items()}),
            "",
        ]
    for sc in scenarios:
        lines += _example_section(sc)
    return StageDoc(stage_name=name, path=f"{name}.md", content="\n".join(lines))


def generate_stage_docs(examples_root: str | None = None) -> list[StageDoc]:
    """One StageDoc per registered stage (docgen.py:310-358), with
    golden scenarios attached when ``examples_root`` is given."""
    from meds_transforms_spark.operators.base import registered_stages
    from meds_transforms_spark.testing.examples import discover_stage_examples

    scenarios = discover_stage_examples(examples_root) if examples_root else []
    by_stage: dict[str, list] = {}
    for sc in scenarios:
        by_stage.setdefault(sc.stage_name, []).append(sc)

    return [
        build_stage_doc(name, stage, by_stage.get(name, ()))
        for name, stage in sorted(registered_stages().items())
    ]


def write_stage_docs(out_dir: str, examples_root: str | None = None) -> list[str]:
    """Write per-stage pages + an index.md; returns written paths."""
    docs = generate_stage_docs(examples_root)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    index = ["# Stage reference", ""]
    for doc in docs:
        p = os.path.join(out_dir, doc.path)
        with open(p, "w") as f:
            f.write(doc.content + "\n")
        written.append(p)
        index.append(f"- [`{doc.stage_name}`]({doc.path})")
    idx = os.path.join(out_dir, "index.md")
    with open(idx, "w") as f:
        f.write("\n".join(index) + "\n")
    written.append(idx)
    return written
