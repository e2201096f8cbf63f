import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchainspider_spark.fixtures.generators import make_edges, make_images, node_address  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from blockchainspider_spark.session import get_spark

    spark = get_spark("bss-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "4g",
    })
    yield spark


@pytest.fixture(scope="session")
def edges_pdf():
    return make_edges(n_nodes=60, n_edges=400, seed=42)


@pytest.fixture(scope="session")
def images_pdf():
    return make_images(image_ids=[node_address(i) for i in range(60)], seed=42)


@pytest.fixture(scope="session")
def source():
    return node_address(0)


@pytest.fixture(scope="session")
def edges_df(spark, edges_pdf):
    df = spark.createDataFrame(edges_pdf)
    df.persist().count()
    return df


@pytest.fixture(scope="session")
def images_df(spark, images_pdf):
    df = spark.createDataFrame(images_pdf)
    df.persist().count()
    return df
