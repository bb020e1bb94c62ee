from streamevmon_spark.operators.rollup import (  # noqa: F401
    TIERS,
    add_inter_turn_latency,
    cascade_rollup,
    rollup_tier,
    rollup_tier_salted,
)
