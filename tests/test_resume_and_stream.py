"""Resume + streaming tests (SURVEY.md §5 new-engine strategy (d)):
kill-after-N-buckets -> re-run -> identical output, no duplicate lineage."""

import pandas as pd
import pytest

from ocr_lib_spark.pipeline import extract_turns, ordered
from ocr_lib_spark.sources.lineage import (
    read_lineage,
    read_output,
    run_with_resume,
)
from ocr_lib_spark.sources.synth import generated_transcripts_df


@pytest.fixture(scope="module")
def transcripts(spark):
    return generated_transcripts_df(spark, n_convs=40, seed=11).cache()


def _sorted_pdf(df):
    return (
        df.select("conv_id", "turn_idx", "extracted_text", "n_blocks")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_resume_after_injected_failure(spark, transcripts, tmp_path):
    out = str(tmp_path / "run1")
    n_buckets = 8

    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_resume(transcripts, out, n_buckets=n_buckets, fail_after=3)

    lin = read_lineage(spark, out).toPandas()
    assert len(lin) == 3
    assert set(lin.status) == {"committed"}

    # resume: completes only the remaining buckets
    n2 = run_with_resume(transcripts, out, n_buckets=n_buckets)
    assert n2 == n_buckets - 3

    lin2 = read_lineage(spark, out).toPandas()
    assert len(lin2) == n_buckets
    assert lin2.bucket.is_unique  # no duplicate lineage rows
    assert int(lin2.turn_count.sum()) == transcripts.count()

    # output identical to a straight-through run
    got = _sorted_pdf(read_output(spark, out))
    exp = _sorted_pdf(extract_turns(transcripts))
    pd.testing.assert_frame_equal(got, exp)

    # idempotent: a third run does nothing
    assert run_with_resume(transcripts, out, n_buckets=n_buckets) == 0


def test_streaming_matches_batch(spark, transcripts, tmp_path):
    src = str(tmp_path / "stream_src")
    transcripts.repartition(6).write.mode("overwrite").parquet(src)

    from ocr_lib_spark.streaming.extract_stream import run_stream_to_memory

    run_stream_to_memory(spark, src, name="t_stream_out")
    got = (
        spark.sql("SELECT conv_id, turn_idx, extracted_text, n_blocks FROM t_stream_out")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = _sorted_pdf(extract_turns(spark.read.parquet(src)))
    pd.testing.assert_frame_equal(got, exp)


def test_windowed_metrics_batch_twin(spark, transcripts):
    """The streaming metrics aggregation also runs as a batch plan —
    verify counts against a direct groupBy."""
    from pyspark.sql import functions as F

    from ocr_lib_spark.streaming.extract_stream import windowed_extraction_metrics

    ex = extract_turns(transcripts)
    joined = ex.join(transcripts.select("conv_id", "turn_idx", "ts"), ["conv_id", "turn_idx"])
    m = windowed_extraction_metrics(joined).agg(F.sum("n_turns")).collect()[0][0]
    assert m == transcripts.count()
