from kglids_spark.plans.buckets import BUCKET_COL, with_bucket  # noqa: F401
from kglids_spark.plans.skew import salted_repartition  # noqa: F401
