"""Experiment: streaming drain cost vs state/shuffle partition count.

Times representative streaming drains at several shuffle-partition
settings (state stores instantiate one per shuffle partition per
micro-batch — guide §2: partition count is a scale-dependent knob).
Run on a quiet box AFTER the baseline bench. Usage:

    python tools/exp_stream_parts.py [parts ...]   (default: 16 8 4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from time_sift_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    parts = [int(p) for p in sys.argv[1:]] or [16, 8, 4]
    spark = get_spark(
        "exp_stream_parts", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    import time_sift_spark.streaming.lag_stream as ls
    from time_sift_spark.queries import REGISTRY

    names = [
        "streaming_windowed_counts",
        "streaming_lag_events",
        "streaming_session_windows",
        "stream_stream_join",
        "streaming_dedup_watermarked",
        "streaming_lag_late_events",
    ]
    orig = ls.run_stream_to_df

    for n_parts in parts:
        def patched(stream_out, query_name, *, output_mode="append",
                    shuffle_partitions=16, state_store=None, _np=n_parts):
            return orig(stream_out, query_name, output_mode=output_mode,
                        shuffle_partitions=_np, state_store=state_store)

        ls.run_stream_to_df = patched
        # queries import run_stream_to_df inside their function bodies via
        # `from .streaming.lag_stream import run_stream_to_df`, so patch at
        # the module attr they resolve at call time.
        for name in names:
            qd = REGISTRY[name]
            # warm-up + best of 2 (the bench methodology)
            def force(df):
                df.write.format("noop").mode("overwrite").save()
            try:
                force(qd.spark_fn(spark, SF_DIR))
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    force(qd.spark_fn(spark, SF_DIR))
                    runs.append(time.perf_counter() - t0)
                print(f"parts={n_parts} {name}: {min(runs):.2f}s  (runs {[round(r,2) for r in runs]})",
                      flush=True)
            except Exception as exc:
                print(f"parts={n_parts} {name}: FAILED {exc}", flush=True)
        ls.run_stream_to_df = orig


if __name__ == "__main__":
    main()
