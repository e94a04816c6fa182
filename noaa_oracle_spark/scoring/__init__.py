from noaa_oracle_spark.scoring.kernel import (
    DEFAULT_SCORING_FIELDS,
    score_entries,
    uuidv7_millis,
)
from noaa_oracle_spark.scoring.outcomes import (
    generate_outcome_messages,
    generate_ranking_permutations,
    get_winning_bytes,
    select_winners,
)

__all__ = [
    "DEFAULT_SCORING_FIELDS",
    "score_entries",
    "uuidv7_millis",
    "generate_outcome_messages",
    "generate_ranking_permutations",
    "get_winning_bytes",
    "select_winners",
]
