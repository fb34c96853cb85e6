import pytest

from kglids_spark.session import get_spark
from kglids_spark.sources.tokens import generate_tokens

N_FIXTURE_ROWS = 30000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kglids_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tokens_df(spark):
    df = generate_tokens(spark, N_FIXTURE_ROWS, partitions=8).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tokens_path(tokens_df, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("data") / "tokens_parquet")
    tokens_df.write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="session")
def duck(tokens_path):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW tokens AS SELECT * FROM read_parquet('{tokens_path}/*.parquet')"
    )
    return con
