import duckdb
import pytest
import ray

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import nexus_forge_ray
    nexus_forge_ray.configure(quiet=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF
