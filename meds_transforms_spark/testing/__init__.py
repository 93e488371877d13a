from meds_transforms_spark.testing.fixtures import (
    StageExample,
    assert_frames_match,
    load_fixture_frame,
)

__all__ = ["StageExample", "assert_frames_match", "load_fixture_frame"]
