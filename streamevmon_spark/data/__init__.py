from streamevmon_spark.data.transcripts import (  # noqa: F401
    TRANSCRIPTS_SQL,
    generate_transcripts,
    load_transcripts,
    transcripts_cte,
)
