from noaa_oracle_spark.operators.dedup import distinct_on
from noaa_oracle_spark.operators.windows import carry_forward, with_lead

__all__ = ["distinct_on", "carry_forward", "with_lead"]
