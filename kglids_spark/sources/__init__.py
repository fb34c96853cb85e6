from kglids_spark.sources.tokens import (  # noqa: F401
    SOURCES,
    SOURCE_VOCAB,
    TOKENS_SCHEMA,
    generate_tokens,
    valid_sources,
)
from kglids_spark.sources.tables import load_testdata, TableStore  # noqa: F401
