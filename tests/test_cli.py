"""End-to-end CLI test: `python -m meds_transforms_spark run` over a
real MEDS dataset directory — the surface a user migrating from the
reference's `MEDS_transform-pipeline` actually invokes.

One subprocess (fresh JVM, ~20 s) exercising: dataset dir read →
YAML pipeline parse → 4-stage run (map + mapreduce + metadata
consumers) → partitioned parquet write + metadata plane roundtrip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# fit_normalization_stats is an ALIASED stage (_base_stage) whose
# aggregations list is deliberately incomplete — the CLI -o override
# must replace it for normalization to find values/sum & values/sum_sqd.
PIPELINE_YAML = """
stages:
  - filter_subjects: {min_events_per_subject: 3}
  - fit_normalization_stats:
      _base_stage: aggregate_code_metadata
      aggregations: ["code/n_subjects"]
  - fit_vocabulary_indices: {}
  - normalization: {}
"""

FULL_AGGS = (
    '["code/n_subjects", "code/n_occurrences", '
    '"values/n_occurrences", "values/sum", "values/sum_sqd"]'
)


def test_cli_run_pipeline(spark, tmp_path):
    from meds_transforms_spark.sources.meds_dataset import MEDSDataset
    from meds_transforms_spark.sources.testdata import events_as_meds
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "meds_in")
    out_dir = str(tmp_path / "meds_out")
    ds = MEDSDataset(spark, src_dir)
    meds = events_as_meds(spark, "/root/testdata/sf0.001").withColumn(
        "split", F.when(F.col("subject_id") % 4 == 0, "tuning").otherwise("train")
    )
    ds.write_data(meds)
    ds.write_subject_splits(
        meds.select("subject_id", "split").dropDuplicates(["subject_id"])
    )
    ds.write_dataset_metadata({"dataset_name": "cli_test", "dataset_version": "0"})

    yaml_fp = tmp_path / "pipeline.yaml"
    yaml_fp.write_text(PIPELINE_YAML)

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "meds_transforms_spark",
            "run",
            str(yaml_fp),
            "--input",
            src_dir,
            "--output",
            out_dir,
            "-o",
            f"fit_normalization_stats.aggregations={FULL_AGGS}",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    out = MEDSDataset(spark, out_dir)
    data = out.data()
    assert data.count() > 0
    # normalization dictionary-encodes code to the vocab index (long)
    assert dict(data.dtypes)["code"] == "bigint"
    meta = out.code_metadata()
    assert meta is not None and "code/vocab_index" in meta.columns
    with open(os.path.join(out_dir, "metadata", "dataset.json")) as f:
        assert json.load(f)["dataset_name"] == "cli_test"
    # Reference-tooling interop artifacts travel with the output dataset.
    shards = out.shards_json()
    assert shards and all("/" in k for k in shards)
    assert out.subject_splits() is not None
