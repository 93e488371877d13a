"""Stage doc generation (reference stages/docgen.py parity)."""

from __future__ import annotations

import os

from meds_transforms_spark.docgen import generate_stage_docs, write_stage_docs


def test_generate_stage_docs_covers_registry():
    from meds_transforms_spark.operators.base import registered_stages

    docs = {d.stage_name: d for d in generate_stage_docs()}
    stages = registered_stages()
    assert set(docs) >= set(stages)
    norm = docs["normalization"].content
    assert norm.startswith("# `normalization`")
    assert "- **Kind**: map" in norm
    # Description comes from the operator docstring, not a stub.
    assert "*(no description)*" not in norm
    occ = docs["occlude_outliers"].content
    assert "Output schema deltas" in occ and "numeric_value/is_inlier" in occ


def test_write_stage_docs_with_examples(tmp_path):
    ref = "/root/reference/src/MEDS_transforms/stages"
    examples_root = ref if os.path.isdir(ref) else None
    out = tmp_path / "docs"
    written = write_stage_docs(str(out), examples_root=examples_root)
    assert (out / "index.md").exists()
    assert (out / "normalization.md").exists()
    assert len(written) > 10
    if examples_root:
        content = (out / "filter_measurements.md").read_text()
        assert "### Example:" in content and "Expected output" in content
