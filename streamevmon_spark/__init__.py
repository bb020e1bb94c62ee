"""streamevmon_spark — a PySpark-native time-series rollup + downsample +
retention engine over conversation/agent transcript tables.

Re-imagines the measurement-pipeline semantics of wandnz/streamevmon
(reference at /root/reference, Scala/Flink) as an idiomatic Spark engine:
declarative DataFrame plans for everything Catalyst can optimize, and
vectorized pandas/Arrow UDFs for the genuinely sequential per-series
kernels (gap-fill, Gorilla/delta-of-delta codecs, changepoint, z-score).

Design target: 10^12-turn tables on 1000-executor clusters; tested at
small deterministic scale on local[N].
"""

__version__ = "0.1.0"
