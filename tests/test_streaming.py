import time

from pyspark.sql import functions as F

from rust_timeseries_spark import datagen
from rust_timeseries_spark.operators import rollup
from rust_timeseries_spark.streaming import rollup_stream


def test_stream_rollup_matches_batch(spark, tmp_path):
    # stage raw token rows as two parquet "arrivals"
    raw = datagen.with_event_time(datagen.token_table(spark, 2000)).select(
        "doc_id", "source", "ts", "n_tok"
    )
    in_dir = str(tmp_path / "in")
    raw.where(F.xxhash64("doc_id") % 2 == 0).write.mode("append").parquet(in_dir)
    raw.where(F.xxhash64("doc_id") % 2 != 0).write.mode("append").parquet(in_dir)

    agg = rollup_stream.stream_rollup(
        spark, in_dir, raw.schema, tier="1h", watermark="30 minutes"
    )

    merged = {}

    def merge_fn(batch_df, batch_id):
        for r in batch_df.collect():
            merged[(r["source"], r["bucket_ts"])] = (
                r["tok_sum"], r["tok_count"], r["tok_min"], r["tok_max"]
            )

    q = rollup_stream.run_incremental(agg, str(tmp_path / "ckpt"), merge_fn)
    q.awaitTermination(120)
    time.sleep(0.5)

    batch = rollup.rollup_raw(spark.read.parquet(in_dir), "1h")
    expected = {
        (r["source"], r["bucket_ts"]): (r["tok_sum"], r["tok_count"], r["tok_min"], r["tok_max"])
        for r in batch.collect()
    }
    assert merged == expected
